from x2vlm_tpu.evalkit.vqa import normalize_answer, vqa_accuracy, vqa_eval, exact_match_accuracy
from x2vlm_tpu.evalkit.grounding import (
    cxcywh_norm_to_xyxy_pixels, grounding_eval_bbox, grounding_eval_bbox_vlue,
    grounding_eval_vlue, iou_xyxy,
)
from x2vlm_tpu.evalkit.caption import (
    bleu, caption_eval, cider_d, meteor, porter_stem, rouge_l,
)
from x2vlm_tpu.evalkit.refer import rle_decode, mask_iou, grounding_eval_mask
