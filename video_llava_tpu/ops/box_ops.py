"""Box math + NMS in pure jnp (jit/vmap-safe, static shapes).

Parity: reference grounding_evaluation/util/box_ops.py:12-141 (IoU,
GIoU, cxcywh<->xyxy, masks_to_boxes) and the torchvision NMS used by
the tracker (grounding_new_api.py:399). NMS here is the classic
sorted-suppression algorithm expressed as a fixed-trip-count
`fori_loop` over a (n, n) IoU matrix — O(n^2) on the VPU, no dynamic
shapes, no host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jax.Array) -> jax.Array:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


@jax.jit
def box_iou(a: jax.Array, b: jax.Array):
    """a: (n, 4), b: (m, 4) xyxy -> (iou (n, m), union (n, m)).

    Module-level jit: these run between the grounded pipeline's device
    programs, where the eager composition costs one host round trip per
    op on a tunneled TPU."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """GIoU (reference box_ops.py giou): iou - (hull - union) / hull."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


@jax.jit
def masks_to_boxes(masks: jax.Array) -> jax.Array:
    """(n, h, w) bool/float masks -> (n, 4) xyxy; empty mask -> zeros.

    Matches torchvision.ops.masks_to_boxes semantics (used by
    eval_grounding.py:123-190 for mask->box IoU scoring).
    """
    n, h, w = masks.shape
    m = masks > 0
    ys = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    big = jnp.int32(10**9)
    x0 = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y0 = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    x1 = jnp.max(jnp.where(m, xs, -1), axis=(1, 2))
    y1 = jnp.max(jnp.where(m, ys, -1), axis=(1, 2))
    empty = ~jnp.any(m, axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, boxes)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int | None = None,
) -> jax.Array:
    """Greedy NMS. boxes: (n, 4) xyxy, scores: (n,).

    Returns keep mask (n,) bool — callers select/pad as needed (static
    shape discipline; torchvision returns indices, equivalent info).
    Padding convention: give padded boxes score -inf. Jitted whole
    (argsort + pairwise IoU + suppression loop is ONE program; the
    eager composition costs ~10 host round trips on a tunneled TPU).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b_sorted = boxes[order]
    iou, _ = box_iou(b_sorted, b_sorted)
    valid = scores[order] > -jnp.inf

    def body(i, keep):
        # Suppress j > i when iou(i, j) > thr and i is kept.
        suppress = (iou[i] > iou_threshold) & keep[i] & (
            jnp.arange(n) > i
        )
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, valid)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    if max_outputs is not None and max_outputs < n:
        # Keep only the top-scoring max_outputs among kept.
        rank = jnp.argsort(jnp.argsort(-jnp.where(keep, scores, -jnp.inf)))
        keep = keep & (rank < max_outputs)
    return keep


def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    class_ids: jax.Array,
    iou_threshold: float = 0.5,
) -> jax.Array:
    """Class-aware NMS (torchvision.ops.batched_nms trick: offset boxes
    per class so different classes never overlap)."""
    offset = class_ids.astype(jnp.float32)[:, None] * (
        jnp.max(boxes) + 1.0
    )
    return nms(boxes + offset, scores, iou_threshold)
