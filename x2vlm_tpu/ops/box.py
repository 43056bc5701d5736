"""Box operations in pure JAX (reference: models/box_ops.py, which leans on
torchvision's C++ box_area). All functions are jit/vmap-friendly.

Boxes are (..., 4); cxcywh = (center_x, center_y, w, h), xyxy = (x0, y0, x1, y1),
normalized to [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_area",
    "box_iou",
    "generalized_box_iou",
    "elementwise_box_iou",
    "elementwise_generalized_box_iou",
]


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (...,)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes → ((N, M) iou, (N, M) union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/), (N, M). Boxes must be valid
    xyxy (x1>=x0, y1>=y0); callers guard degenerate boxes (reference
    models/xvlm.py:941-946 zeroes the loss instead)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Row-wise IoU between equal-shaped (..., 4) xyxy boxes — the diagonal of
    box_iou without materializing the (N, N) matrix (the reference computes the
    full pairwise matrix then takes torch.diag; O(N) here)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / union


def elementwise_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Row-wise GIoU for equal-shaped (..., 4) xyxy boxes (diag of
    generalized_box_iou, O(N))."""
    iou = elementwise_box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt_i = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb_i = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh_i = jnp.clip(rb_i - lt_i, min=0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = area1 + area2 - inter
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull
