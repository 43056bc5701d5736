from x2vlm_tpu.data.masking import TextMaskingGenerator, pad_masks, IGNORE_INDEX
from x2vlm_tpu.data.tokenization import build_tokenizer, TextPreprocessor, pre_caption
from x2vlm_tpu.data.transforms import (
    pretrain_transform, train_transform, test_transform, box_transform,
    RandomAugment, normalize, random_resized_crop, hflip,
)
from x2vlm_tpu.data.streaming import DistLineReader, list_data_files, split_shard
from x2vlm_tpu.data.retrieval import RetrievalTrainDataset, RetrievalEvalDataset
from x2vlm_tpu.data.loader import (
    collate, batch_indices, MapLoader, iter_batches, Prefetcher,
)
from x2vlm_tpu.data.finetune import (
    VQATrainDataset, VQAEvalDataset, vqa_collate, tokenize_answers,
    NLVRDataset, GroundingTrainDataset, GroundingEvalDataset,
    CaptioningTrainDataset, CaptioningEvalDataset,
)
from x2vlm_tpu.data.pretrain import (
    ImageTextStream, TextStream, RegionTextStream, VideoTextStream,
    region_collate, sample_frame_ids,
)
from x2vlm_tpu.data.factory import create_dataset
