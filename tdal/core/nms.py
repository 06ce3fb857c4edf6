"""Greedy NMS variants in pure JAX (static shapes, lax control flow).

TPU-native replacements for the reference's CUDA ``nms_gpu`` (iou3d_nms_kernel.cu:267-414,
wrapped by box_torch_ops.rotate_nms_pcdet:248-276) and the numba ``circle_nms``
(circle_nms_jit.py:5-28). Greedy suppression is inherently sequential, so both variants
run a tiled early-exit while_loop: each iteration resolves the top-T alive candidates
in-tile via a statically unrolled recurrence, then suppresses the whole array with one
vectorized (T, m) overlap block — sequential depth <= ceil(post_max/T) instead of one
step per candidate. Score-sort + pre/post truncation semantics match the reference.

NOTE: call these per sample (python loop over a small batch). vmap/lax.map of the
early-exit while_loop forces masked all-lane execution and degrades ~1000x (measured).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdal.core.geometry import center_to_corner_box2d
from tdal.core.iou import quad_intersection_area

def rotated_nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    pre_max_size: int,
    post_max_size: int,
):
    """Rotated BEV NMS on [x, y, z, l, w, h, heading] boxes.

    Scores may contain -inf / masked entries; they sort last and never suppress.
    Returns (indices (post_max_size,) into the ORIGINAL array, valid (post_max_size,)).

    Parity: box_torch_ops.rotate_nms_pcdet (box_torch_ops.py:248-276) + CUDA nms_gpu —
    greedy by descending score, suppress when BEV IoU > threshold. (The reference's
    pcdet-convention flip before NMS is a consistent relabeling of both operands, so
    IoU and therefore the kept set are identical without it.)"""
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    order = jnp.argsort(-scores)
    order = order[:pre_max_size]
    b = boxes[order]
    s = scores[order]
    valid_in = jnp.isfinite(s)

    corners = center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])  # (m, 4, 2)
    areas = b[:, 3] * b[:, 4]
    alive_scores = jnp.where(valid_in, s, -jnp.inf)

    # Tiled greedy loop with early exit: each iteration takes the top-T alive
    # candidates (global score order => greedy order), resolves greedy suppression
    # WITHIN the tile via a statically-unrolled mask recurrence, then applies the
    # tile's kept boxes to the whole array in one vectorized (T, m) IoU block.
    # Sequential depth <= ceil(post_max/T) TPU dispatch rounds instead of one round
    # per candidate (the reference CUDA kernel's 64-wide bitmask blocks,
    # iou3d_nms_kernel.cu:267-376, solve the same serialization on GPU).
    T = min(32, post_max_size, int(b.shape[0]))
    pair_area = jax.vmap(
        lambda ci, cj: quad_intersection_area(ci, cj), in_axes=(None, 0)
    )

    def cond(state):
        k, alive_scores, out_idx, out_valid = state
        return (k < post_max_size) & jnp.any(alive_scores > -jnp.inf)

    def body(state):
        k, alive_scores, out_idx, out_valid = state
        tile_scores, tile_idx = jax.lax.top_k(alive_scores, T)
        tile_valid = tile_scores > -jnp.inf
        tc = corners[tile_idx]  # (T, 4, 2)
        ta = areas[tile_idx]

        # (T, m) IoU of tile boxes vs everything (includes the (T, T) tile block).
        inter = jax.vmap(lambda ci: pair_area(ci, corners))(tc)
        iou_all = inter / jnp.clip(ta[:, None] + areas[None, :] - inter, 1e-8, None)
        iou_tile = iou_all[:, tile_idx]  # (T, T)
        over = iou_tile > iou_threshold

        keep_t = tile_valid
        later = jnp.arange(T)[None, :] > jnp.arange(T)[:, None]
        for i in range(T):  # static unroll: trivial vector ops per step
            keep_t = keep_t & ~(over[i] & later[i] & keep_t[i])

        # kept tile boxes suppress the whole array; the tile itself is consumed.
        suppress_all = jnp.any(
            (iou_all > iou_threshold) & keep_t[:, None], axis=0
        )
        alive_scores = jnp.where(suppress_all, -jnp.inf, alive_scores)
        alive_scores = alive_scores.at[tile_idx].set(-jnp.inf)

        ranks = k + jnp.cumsum(keep_t) - 1
        write = keep_t & (ranks < post_max_size)
        slot = jnp.where(write, ranks, post_max_size)
        out_idx = out_idx.at[slot].set(order[tile_idx], mode="drop")
        out_valid = out_valid.at[slot].set(True, mode="drop")
        return k + keep_t.sum(), alive_scores, out_idx, out_valid

    out_idx = jnp.zeros((post_max_size,), order.dtype)
    out_valid = jnp.zeros((post_max_size,), bool)
    _, _, out_idx, out_valid = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), alive_scores, out_idx, out_valid)
    )
    return out_idx, out_valid


def circle_nms(
    centers: jax.Array,
    scores: jax.Array,
    dist_threshold: float,
    post_max_size: int,
):
    """Center-distance greedy NMS. centers (N, 2); suppress when squared distance
    <= dist_threshold. Parity: circle_nms_jit.py:5-28 (used by CenterHead when
    test_cfg.circular_nms is on, center_head.py).

    Returns (indices (post_max_size,), valid (post_max_size,))."""
    centers = jnp.asarray(centers)
    scores = jnp.asarray(scores)
    order = jnp.argsort(-scores)
    c = centers[order]
    s = scores[order]
    alive_scores = jnp.where(jnp.isfinite(s), s, -jnp.inf)
    m = c.shape[0]

    # Same tiled early-exit greedy loop as rotated_nms (distance rows are cheap).
    T = min(32, post_max_size, m)

    def cond(state):
        k, alive_scores, out_idx, out_valid = state
        return (k < post_max_size) & jnp.any(alive_scores > -jnp.inf)

    def body(state):
        k, alive_scores, out_idx, out_valid = state
        tile_scores, tile_idx = jax.lax.top_k(alive_scores, T)
        tile_valid = tile_scores > -jnp.inf
        tc = c[tile_idx]  # (T, 2)
        d2_all = jnp.sum((tc[:, None, :] - c[None, :, :]) ** 2, axis=-1)  # (T, m)
        over = d2_all[:, tile_idx] <= dist_threshold
        keep_t = tile_valid
        later = jnp.arange(T)[None, :] > jnp.arange(T)[:, None]
        for i in range(T):
            keep_t = keep_t & ~(over[i] & later[i] & keep_t[i])
        suppress_all = jnp.any(
            (d2_all <= dist_threshold) & keep_t[:, None], axis=0
        )
        alive_scores = jnp.where(suppress_all, -jnp.inf, alive_scores)
        alive_scores = alive_scores.at[tile_idx].set(-jnp.inf)
        ranks = k + jnp.cumsum(keep_t) - 1
        write = keep_t & (ranks < post_max_size)
        slot = jnp.where(write, ranks, post_max_size)
        out_idx = out_idx.at[slot].set(order[tile_idx], mode="drop")
        out_valid = out_valid.at[slot].set(True, mode="drop")
        return k + keep_t.sum(), alive_scores, out_idx, out_valid

    out_idx = jnp.zeros((post_max_size,), order.dtype)
    out_valid = jnp.zeros((post_max_size,), bool)
    _, _, out_idx, out_valid = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), alive_scores, out_idx, out_valid)
    )
    return out_idx, out_valid
