"""Pallas TPU kernel for k-nearest-neighbor queries.

Replaces the reference's "materialize the full [B, S, N] distance matrix in
HBM, then torch.topk" pattern (``models/pointbert/dvae.py:116-127``) with a
blocked kernel that keeps each distance tile in VMEM and extracts the k
minima in place — the distance matrix never touches HBM.

Per (batch, query-block) grid step:
  1. build the [S_blk, N] squared-distance tile on the VPU from
     coordinate broadcasts (K=3 is too thin to feed the MXU usefully);
  2. k times: argmin over the point axis, record it, mask it to +inf.
     k is static and small (<= 64 in every PPT config) so the loop is
     unrolled straight-line VPU code.

Matches ``ppt_tpu.ops.knn_point`` (nearest-first order, first-index
tiebreak).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _knn_kernel(k: int, n_valid: int, q_ref, xyz_ref, out_ref, dist_ref):
    """q_ref: [1, S_blk, 3] VMEM; xyz_ref: [1, 3, Npad] VMEM;
    out_ref: [1, S_blk, k] i32 VMEM; dist_ref: [S_blk, Npad] f32 scratch."""
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]

    lane = lax.broadcasted_iota(jnp.int32, (s_blk, n_pad), dimension=1)
    valid = lane < n_valid

    xs = xyz_ref[0, 0:1, :]  # [1, Npad]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]  # [S_blk, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d = (qx - xs) ** 2 + (qy - ys) ** 2 + (qz - zs) ** 2
    dist_ref[:, :] = jnp.where(valid, d, jnp.inf)

    for j in range(k):
        running = dist_ref[:, :]
        m = jnp.min(running, axis=1, keepdims=True)  # [S_blk, 1]
        is_min = running == m
        # first-index tiebreak
        idx = jnp.min(jnp.where(is_min, lane, n_pad), axis=1, keepdims=True)
        out_ref[0, :, j : j + 1] = idx.astype(jnp.int32)
        dist_ref[:, :] = jnp.where(lane == idx, jnp.inf, running)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(
    k: int, xyz: jax.Array, new_xyz: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """k nearest neighbors of ``new_xyz`` queries among ``xyz`` points.

    Args:
      k: neighbors per query (static).
      xyz: ``[B, N, 3]`` reference points.
      new_xyz: ``[B, S, 3]`` queries; S must be a multiple of 8 (all PPT
        configs use powers of two >= 128).
    Returns:
      ``[B, S, k]`` int32 indices, nearest-first.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_blk = min(128, S)
    assert S % s_blk == 0, f"S={S} must tile by {s_blk}"
    n_pad = _round_up(N, 128)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # [B, 3, N]
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    q = new_xyz.astype(jnp.float32)

    return pl.pallas_call(
        functools.partial(_knn_kernel, k, N),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s_blk, k), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(q, xyz_t)
