"""Offset-based (packed / ragged-batch) point ops.

Equivalent of the reference's ``pointops`` CUDA extension
(``openpoints/cpp/pointops/functions/pointops.py:10-299``) used by the
Point-Transformer family: instead of fixed ``[B, N, 3]`` batches, points
are packed into one ``[total, 3]`` array with an ``offsets`` vector
(``offsets[i]`` = end index of cloud i, matching the reference's
``offset`` convention).

TPU design: ragged data still needs static shapes under jit, so the
packed layout is kept but per-cloud membership becomes a segment-id
vector; cross-cloud interactions are masked out with +inf distances.
Complexity matches the batched path — the mask fuses into the distance
epilogue — and the shapes are static as long as ``total`` is.

All functions are jit-able with ``offsets`` as a traced argument: the
number of clouds B is static (``offsets.shape[0]``), the per-cloud
sizes are dynamic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def segment_ids_from_offsets(offsets: jax.Array, total: int) -> jax.Array:
    """offsets [B] (end indices, cumulative) -> segment id per point."""
    idx = lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0]
    # id = number of offsets <= idx
    return jnp.sum(idx[:, None] >= offsets[None, :], axis=1).astype(jnp.int32)


def _masked_sqdist(
    queries: jax.Array,
    points: jax.Array,
    q_seg: jax.Array,
    p_seg: jax.Array,
) -> jax.Array:
    """[Q, P] squared distances, +inf across cloud boundaries."""
    cross = queries @ points.T
    d = (
        jnp.sum(queries**2, -1)[:, None]
        + jnp.sum(points**2, -1)[None, :]
        - 2.0 * cross
    )
    same = q_seg[:, None] == p_seg[None, :]
    return jnp.where(same, d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("nsample",))
def knn_query_packed(
    nsample: int,
    points: jax.Array,  # [total, 3]
    offsets: jax.Array,  # [B] cumulative end indices
    queries: jax.Array,  # [Q, 3]
    query_offsets: jax.Array,  # [B]
) -> Tuple[jax.Array, jax.Array]:
    """kNN within each cloud of a packed batch (``pointops.knnquery``).

    Returns (idx [Q, nsample] int32 into the packed array, sqdists).
    """
    total = points.shape[0]
    Q = queries.shape[0]
    p_seg = segment_ids_from_offsets(offsets, total)
    q_seg = segment_ids_from_offsets(query_offsets, Q)
    d = _masked_sqdist(
        queries.astype(jnp.float32), points.astype(jnp.float32), q_seg, p_seg
    )
    neg, idx = lax.top_k(-d, nsample)
    return idx.astype(jnp.int32), jnp.maximum(-neg, 0.0)


@functools.partial(jax.jit, static_argnames=("npoint_per_cloud",))
def farthest_point_sample_packed(
    points: jax.Array,  # [total, 3]
    offsets: jax.Array,  # [B]
    npoint_per_cloud: int,
) -> jax.Array:
    """FPS per cloud over a packed batch (``pointops.furthestsampling``).

    Returns [B, npoint_per_cloud] int32 indices into the packed array.
    Each cloud's iteration starts at its first point.
    """
    total = points.shape[0]
    B = offsets.shape[0]
    seg = segment_ids_from_offsets(offsets, total)
    starts = jnp.concatenate([jnp.zeros((1,), offsets.dtype), offsets[:-1]])
    pts = points.astype(jnp.float32)

    # per-cloud running distance, masked to own segment
    def body(i, state):
        distance, farthest, out = state
        out = lax.dynamic_update_index_in_dim(out, farthest, i, axis=1)
        centroid = pts[farthest]  # [B, 3]
        d = jnp.sum(
            (pts[None, :, :] - centroid[:, None, :]) ** 2, axis=-1
        )  # [B, total]
        own = seg[None, :] == jnp.arange(B)[:, None]
        d = jnp.where(own, d, -jnp.inf)
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=1).astype(jnp.int32)
        return distance, farthest, out

    init = (
        jnp.where(
            seg[None, :] == jnp.arange(B)[:, None], 1e10, -jnp.inf
        ),
        starts.astype(jnp.int32),
        jnp.zeros((B, npoint_per_cloud), jnp.int32),
    )
    _, _, out = lax.fori_loop(0, npoint_per_cloud, body, init)
    return out


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query_packed(
    radius: float,
    nsample: int,
    points: jax.Array,  # [total, 3]
    offsets: jax.Array,  # [B]
    queries: jax.Array,  # [Q, 3]
    query_offsets: jax.Array,  # [B]
) -> jax.Array:
    """Radius query over packed clouds: first ``nsample`` in-radius
    indices in increasing index order, padded with the first hit — the
    framework's ball-query contract (``ops.query_ball_point``), applied
    per segment. Equivalent of PyG's ``radius``/the reference grouper in
    ``pointnextPyG.py:20-40``.
    """
    total = points.shape[0]
    Q = queries.shape[0]
    p_seg = segment_ids_from_offsets(offsets, total)
    q_seg = segment_ids_from_offsets(query_offsets, Q)
    d = _masked_sqdist(
        queries.astype(jnp.float32), points.astype(jnp.float32), q_seg, p_seg
    )
    in_ball = d <= radius**2
    arange = lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    masked = jnp.where(in_ball, arange, total)
    neg_topk, _ = lax.top_k(-masked, nsample)
    idx = -neg_topk  # ascending index order
    first = idx[:, :1]
    idx = jnp.where(idx == total, first, idx)
    # zero-hit queries: clamp the sentinel to the query's OWN cloud's
    # last index (batched query_ball_point clamps to N-1 per cloud)
    seg_last = offsets[q_seg] - 1
    return jnp.minimum(idx, seg_last[:, None]).astype(jnp.int32)


def grouping_packed(
    features: jax.Array,  # [total, C]
    idx: jax.Array,  # [Q, nsample]
) -> jax.Array:
    """Gather packed features by neighbor index (``pointops.grouping``).
    Gradient (scatter-add) comes from the gather transpose."""
    return features[idx]


@functools.partial(jax.jit, static_argnames=())
def interpolation_packed(
    src_xyz: jax.Array,  # [S, 3]
    src_offsets: jax.Array,
    dst_xyz: jax.Array,  # [D, 3]
    dst_offsets: jax.Array,
    src_feats: jax.Array,  # [S, C]
) -> jax.Array:
    """3-NN inverse-distance interpolation over packed clouds
    (``pointops.interpolation``).

    Weights follow the reference contract exactly: ``knnquery`` returns
    EUCLIDEAN distances (``pointops.py:47`` takes sqrt of dist2) and the
    interpolation reciprocal is over those (``pointops.py:252``) — unlike
    the pointnet2-utils three_interpolate, which weights by 1/dist^2.
    """
    idx, d = knn_query_packed(3, src_xyz, src_offsets, dst_xyz, dst_offsets)
    recip = 1.0 / (jnp.sqrt(d) + 1e-8)
    w = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return jnp.sum(src_feats[idx] * w[..., None], axis=1).astype(src_feats.dtype)


def subtraction_packed(
    feats_q: jax.Array, feats_k: jax.Array, idx: jax.Array
) -> jax.Array:
    """Per-neighbor feature subtraction (``pointops.subtraction``):
    out[q, j] = feats_q[q] - feats_k[idx[q, j]]."""
    return feats_q[:, None, :] - feats_k[idx]


def aggregation_packed(
    values: jax.Array,  # [Q, nsample, C] (grouped values)
    weights: jax.Array,  # [Q, nsample, C] or [Q, nsample, 1]
) -> jax.Array:
    """Weighted neighbor aggregation (``pointops.aggregation``)."""
    return jnp.sum(values * weights, axis=1)
