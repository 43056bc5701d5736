from x2vlm_tpu.tasks.retrieval import evaluate_retrieval, itm_eval, encode_corpus, retrieval_scores
from x2vlm_tpu.tasks.pretrain import PretrainStreams, pretrain_loop
from x2vlm_tpu.tasks.vqa import evaluate_vqa
from x2vlm_tpu.tasks.classification import evaluate_classification
from x2vlm_tpu.tasks.grounding import predict_grounding
from x2vlm_tpu.tasks.captioning import generate_captions
from x2vlm_tpu.tasks.collect import collect_results, collect_results_fs
