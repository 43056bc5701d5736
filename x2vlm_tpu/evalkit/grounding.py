"""Grounding evaluation: IoU>=0.5 accuracy per split (reference
dataset/utils.py:363-400 grounding_eval_bbox).

Predictions are normalized cxcywh in the *model's* square input frame; ground
truth boxes are pixel xywh in the original image. The converter mirrors the
reference: scale normalized coords by the original (W, H).
"""

from __future__ import annotations

from typing import Dict, Iterable, List

import numpy as np

__all__ = ["iou_xyxy", "grounding_eval_bbox", "cxcywh_norm_to_xyxy_pixels"]


def iou_xyxy(a, b) -> float:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ix0, iy0 = max(ax0, bx0), max(ay0, by0)
    ix1, iy1 = min(ax1, bx1), min(ay1, by1)
    iw, ih = max(ix1 - ix0, 0.0), max(iy1 - iy0, 0.0)
    inter = iw * ih
    union = ((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter)
    return inter / union if union > 0 else 0.0


def cxcywh_norm_to_xyxy_pixels(coord, width: int, height: int):
    cx, cy, w, h = coord
    cx, w = cx * width, w * width
    cy, h = cy * height, h * height
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def grounding_eval_bbox(results: Iterable[Dict], refs: Dict[int, Dict]
                        ) -> Dict[str, float]:
    """results: [{ref_id, pred: cxcywh normalized}]. refs: ref_id →
    {split: 'testA'|'testB'|'val', bbox: [x, y, w, h] pixels, width, height}."""
    correct = {"testA": 0, "testB": 0, "val": 0}
    total = {"testA": 0, "testB": 0, "val": 0}
    for r in results:
        ref = refs.get(int(r["ref_id"]))
        if ref is None:
            continue
        split = ref["split"]
        x, y, w, h = ref["bbox"]
        gt = [x, y, x + w, y + h]
        pred = cxcywh_norm_to_xyxy_pixels(r["pred"], ref["width"], ref["height"])
        total[split] = total.get(split, 0) + 1
        if iou_xyxy(pred, gt) >= 0.5:
            correct[split] = correct.get(split, 0) + 1
    return {f"{s}_acc": 100.0 * correct.get(s, 0) / max(total.get(s, 0), 1)
            for s in total}
