"""Point-cloud geometry ops: pure-JAX, jit-able, static-shape.

These are the semantic ground truth for the framework's geometry layer and
the reference implementations that the Pallas kernels in
``ppt_tpu.kernels`` are golden-tested against. Semantics follow the
upstream PPT spec (reference: ``models/pointbert/pointnet2_utils.py:20-190``
and ``models/pointbert/dvae.py:116-181``), re-expressed as functional JAX:

- everything is batched ``[B, N, C]``, channels-last (the TPU-friendly
  layout: the point axis lands on lanes after the transpose XLA inserts for
  matmuls, and per-point MLPs become plain matmuls on the MXU);
- no data-dependent shapes: FPS/kNN/ball-query all return fixed-size index
  tensors, padding per the reference's rules;
- all loops are ``lax.fori_loop`` / ``lax.scan`` so a single trace serves
  any step count.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance.

    Args:
      src: ``[B, N, C]`` query points.
      dst: ``[B, M, C]`` target points.
    Returns:
      ``[B, N, M]`` squared distances (may be slightly negative from
      cancellation; callers that need exact non-negativity should clamp).

    Spec: reference ``models/pointbert/pointnet2_utils.py:51-72``.
    The inner product rides the MXU; the norms fuse into the epilogue.
    """
    # Full-f32 MXU passes: at default precision the TPU computes f32
    # matmuls through bf16 decomposition, whose ~1e-2 absolute error is
    # enough to flip kNN orderings and radius threshold decisions.
    cross = lax.dot_general(
        src,
        dst,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[:, :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return s2 + d2 - 2.0 * cross


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: ``out[b, ..., :] = points[b, idx[b, ...], :]``.

    Args:
      points: ``[B, N, C]``.
      idx: integer ``[B, S]`` or ``[B, S, K]`` (any number of trailing
        index dims).
    Returns:
      ``[B, *idx.shape[1:], C]``.

    Spec: reference ``models/pointbert/pointnet2_utils.py:75-92``. The
    torch fancy-index becomes a single ``take_along_axis`` per batch, which
    XLA lowers to one gather.
    """
    B = points.shape[0]
    C = points.shape[-1]
    flat_idx = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat_idx[:, :, None], axis=1)
    return out.reshape(*idx.shape, C)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Alias of :func:`index_points` for ``[B, S, K]`` neighborhoods.

    Mirrors the reference CUDA ``group_points`` op
    (``openpoints/cpp/pointnet2_batch/src/group_points_gpu.cu``) which is a
    gather; the gradient (scatter-add) falls out of JAX's gather transpose,
    so no custom backward kernel is needed.
    """
    return index_points(points, idx)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # no backend yet
        return False


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    start_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: ``[B, N, 3]`` point coordinates.
      npoint: number of samples (static).
      start_idx: optional ``[B]`` int32 seed indices (the reference draws
        them uniformly at random, ``pointnet2_utils.py:107``); defaults to
        index 0, which is the convention of the CUDA kernel
        (``sampling_gpu.cu``) and makes eval deterministic.

    Returns:
      ``[B, npoint]`` int32 indices of the sampled points.

    The algorithm is inherently sequential over ``npoint``; each step is a
    ``[B, N]`` fused distance-update + argmax which XLA keeps on-chip. A
    Pallas kernel with the distance vector pinned in VMEM lives at
    ``ppt_tpu.kernels.fps`` and is golden-tested against this function.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if start_idx is None and _on_tpu():
        # sublane-batched Pallas kernel: exact same indices, ~free on v5e
        # (vs ~4.5 ms for this XLA loop at B32/N1024/npoint512)
        from ppt_tpu.kernels.group import fps_batched

        return fps_batched(xyz, npoint)
    if start_idx is None:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)
    else:
        farthest0 = start_idx.astype(jnp.int32)

    def body(i, state):
        distance, farthest, centroids = state
        centroids = lax.dynamic_update_index_in_dim(
            centroids, farthest, i, axis=1
        )
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, centroids

    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        farthest0,
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, centroids = lax.fori_loop(0, npoint, body, init)
    return centroids


def fps_gather(
    xyz: jax.Array, npoint: int, start_idx: Optional[jax.Array] = None
) -> jax.Array:
    """FPS followed by a gather of the sampled coordinates.

    Equivalent of reference ``models/pointbert/misc.py:12-24`` (``fps``).
    Returns ``[B, npoint, 3]``.
    """
    idx = farthest_point_sample(xyz, npoint, start_idx=start_idx)
    return index_points(xyz, idx)


@functools.partial(jax.jit, static_argnames=("nsample",))
def knn_point(nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """k nearest neighbors of each query in ``new_xyz`` among ``xyz``.

    Args:
      nsample: k (static).
      xyz: ``[B, N, C]`` reference set.
      new_xyz: ``[B, S, C]`` queries.
    Returns:
      ``[B, S, nsample]`` int32 indices, nearest-first.

    Spec: reference ``models/pointbert/pointnet2_utils.py:20-34`` (topk of
    negated squared distances). The reference uses ``sorted=False``; we
    return sorted-by-distance order, a superset of that contract (no PPT
    consumer depends on intra-k order — neighborhoods feed order-invariant
    max-pools).
    """
    sqrdists = square_distance(new_xyz, xyz)
    _, idx = lax.top_k(-sqrdists, nsample)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nsample",))
def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array
) -> jax.Array:
    """Fixed-size radius neighborhood query.

    Returns the first ``nsample`` point indices (in increasing index
    order) within ``radius`` of each query; queries with fewer than
    ``nsample`` hits are padded with the first hit. A query with zero hits
    pads with index ``N-1`` — matching the reference exactly, whose sort
    leaves sentinel ``N`` everywhere and then clamps nothing (torch indexes
    with N would crash; in practice FPS centers always have >=1 hit:
    themselves).

    Spec: reference ``models/pointbert/pointnet2_utils.py:119-139``.

    Implementation note: instead of materializing and fully sorting the
    ``[B, S, N]`` index tensor like the reference, we take the ``nsample``
    smallest masked indices with ``top_k`` (O(N log k) per query, no big
    sort buffer).
    """
    B, N, _ = xyz.shape
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    in_ball = sqrdists <= radius**2
    arange = lax.broadcasted_iota(jnp.int32, sqrdists.shape, dimension=2)
    masked = jnp.where(in_ball, arange, N)
    # smallest nsample values of `masked` == top_k of the negation
    neg_topk, _ = lax.top_k(-masked, nsample)
    group_idx = -neg_topk  # [B, S, nsample], ascending index order
    first = group_idx[:, :, :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # all-empty neighborhoods: clamp the sentinel into range
    return jnp.minimum(group_idx, N - 1).astype(jnp.int32)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: Optional[jax.Array],
    *,
    start_idx: Optional[jax.Array] = None,
    return_fps: bool = False,
):
    """FPS + ball query + gather + center-normalize.

    Args:
      xyz: ``[B, N, 3]`` positions.
      points: optional ``[B, N, D]`` features.
    Returns:
      ``new_xyz [B, npoint, 3]``, ``new_points [B, npoint, nsample, 3+D]``
      (or ``[..., 3]`` if ``points`` is None); with ``return_fps`` also the
      un-normalized grouped xyz and the fps indices.

    Spec: reference ``models/pointbert/pointnet2_utils.py:142-170``.
    """
    fps_idx = farthest_point_sample(xyz, npoint, start_idx=start_idx)
    new_xyz = index_points(xyz, fps_idx)
    if _on_tpu() and npoint % 8 == 0 and not return_fps:
        # fused Pallas ball-query+gather: rel coords AND features come
        # out of the kernel's VMEM tiles — XLA's native row gather of
        # the features is the dominant cost at these shapes (~18 ms for
        # one [128,1024,32]x[128,512,32] gather on v5e)
        if points is not None and points.dtype == jnp.bfloat16:
            # (bf16-only: the in-kernel gather matmul reproduces bf16
            # features exactly; f32 features keep the XLA gather)
            from ppt_tpu.kernels.group import ball_query_gather_feats

            idx, grouped_xyz_norm, grouped_points = ball_query_gather_feats(
                float(radius), nsample, xyz, new_xyz, points, relative=True
            )
            new_points = jnp.concatenate(
                [grouped_xyz_norm.astype(xyz.dtype), grouped_points], axis=-1
            )
            return new_xyz, new_points
        from ppt_tpu.kernels.group import ball_query_gather

        idx, grouped_xyz_norm = ball_query_gather(
            float(radius), nsample, xyz, new_xyz, relative=True
        )
        grouped_xyz_norm = grouped_xyz_norm.astype(xyz.dtype)
    else:
        idx = query_ball_point(radius, nsample, xyz, new_xyz)
        grouped_xyz = index_points(xyz, idx)  # [B, npoint, nsample, 3]
        grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_xyz_norm
    if return_fps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_all(
    xyz: jax.Array, points: Optional[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Single global group covering the whole cloud.

    Spec: reference ``models/pointbert/pointnet2_utils.py:173-190``.
    """
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points[:, None, :, :]], axis=-1
        )
    else:
        new_points = grouped_xyz
    return new_xyz, new_points


def three_nn(
    unknown: jax.Array, known: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Three nearest neighbors of each ``unknown`` point among ``known``.

    Returns ``(dists [B, N, 3], idx [B, N, 3])`` — squared distances,
    nearest-first, clamped to be non-negative.

    Spec: reference ``models/pointbert/pointnet2_utils.py:330-339`` (sort +
    take-3) and the CUDA ``three_nn`` op.
    """
    sqrdists = square_distance(unknown, known)
    neg, idx = lax.top_k(-sqrdists, 3)
    return jnp.maximum(-neg, 0.0), idx.astype(jnp.int32)


def three_interpolate(
    unknown_xyz: jax.Array,
    known_xyz: jax.Array,
    known_feats: jax.Array,
) -> jax.Array:
    """Inverse-distance-weighted 3-NN feature interpolation.

    Args:
      unknown_xyz: ``[B, N, 3]`` target positions.
      known_xyz: ``[B, S, 3]`` source positions.
      known_feats: ``[B, S, D]`` source features.
    Returns:
      ``[B, N, D]`` interpolated features.

    Spec: reference ``models/pointbert/pointnet2_utils.py:329-351``. When
    ``S == 1`` the reference broadcasts the single source feature; here the
    3-NN weights degenerate to that same broadcast so no special case is
    needed at trace time (S is static: callers with S==1 should broadcast
    directly).
    """
    dists, idx = three_nn(unknown_xyz, known_xyz)
    recip = 1.0 / (dists + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)  # [B, N, 3]
    gathered = index_points(known_feats, idx)  # [B, N, 3, D]
    return jnp.sum(gathered * weight[..., None], axis=2).astype(
        known_feats.dtype
    )
