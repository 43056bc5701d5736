"""RefCOCO mask-scoring evaluation (reference dataset/utils.py:270-315
grounding_eval + refTools REFER API, which lean on pycocotools' C extension).

Self-contained COCO RLE handling: compressed-string and uncompressed-counts
decoding (column-major runs, per the pycocotools format), mask IoU, and the
mask-based grounding score where the predicted box is scored by how much
referred-object mask it captures."""

from __future__ import annotations

from typing import Dict, Iterable, List, Union

import numpy as np

__all__ = ["rle_decode", "mask_iou", "grounding_eval_mask"]


def _decode_rle_string(s: Union[str, bytes]) -> List[int]:
    """pycocotools compressed RLE: 6-bit chunks at chr(48+x), bit 0x20 =
    continuation, counts[i>=2] delta-coded against counts[i-2]."""
    if isinstance(s, str):
        s = s.encode()
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_decode(rle: Dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|list} → (h, w) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decode_rle_string(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos: pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # column-major storage


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0


def grounding_eval_mask(results: Iterable[Dict], refs: Dict[int, Dict],
                        iou_thresh: float = 0.5) -> Dict[str, float]:
    """results: [{ref_id, pred: cxcywh normalized}]; refs: ref_id →
    {split, rle: COCO RLE dict, width, height}. A prediction scores when the
    box-as-mask IoU with the referred mask clears `iou_thresh` (the mask-based
    protocol of reference dataset/utils.py:270-315)."""
    from x2vlm_tpu.evalkit.grounding import cxcywh_norm_to_xyxy_pixels

    correct: Dict[str, int] = {}
    total: Dict[str, int] = {}
    for r in results:
        ref = refs.get(int(r["ref_id"]))
        if ref is None:
            continue
        split = ref["split"]
        gt = rle_decode(ref["rle"])
        h, w = gt.shape
        x0, y0, x1, y1 = cxcywh_norm_to_xyxy_pixels(
            r["pred"], ref.get("width", w), ref.get("height", h))
        box_mask = np.zeros_like(gt)
        x0, y0 = max(int(round(x0)), 0), max(int(round(y0)), 0)
        x1, y1 = min(int(round(x1)), w), min(int(round(y1)), h)
        if x1 > x0 and y1 > y0:
            box_mask[y0:y1, x0:x1] = 1
        total[split] = total.get(split, 0) + 1
        if mask_iou(box_mask, gt) >= iou_thresh:
            correct[split] = correct.get(split, 0) + 1
    return {f"{s}_acc": 100.0 * correct.get(s, 0) / max(total.get(s, 0), 1)
            for s in total}
