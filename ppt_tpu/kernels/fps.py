"""Pallas TPU kernel for farthest point sampling.

FPS is the one genuinely sequential hot op in the point-cloud tokenization
path (reference CUDA kernel: ``openpoints/cpp/pointnet2_batch/src/
sampling_gpu.cu:93-260`` — a masked distance-argmax loop). The TPU-native
design keeps the running ``[N]`` distance vector and the whole cloud
resident in VMEM for all ``npoint`` iterations, so each step is pure VPU
work with zero HBM traffic:

    per step:  dist_i = |xyz - xyz[farthest]|^2        (VPU, [N])
               running = min(running, dist_i)          (VPU, [N])
               farthest = argmax(running)              (VPU reduce)

Layout: coordinates are pre-split into a ``[B, 3, N]`` array so the point
axis lands on lanes (128-wide); N is padded to a lane multiple by the
wrapper. The grid iterates over the batch; one kernel instance owns one
cloud. Padding points get -inf running distance so they are never
selected. Selected indices are written to an SMEM-resident output (scalar
stores), avoiding dynamic single-lane VMEM writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, n_valid: int, xyz_ref, out_ref, dist_ref):
    """One batch element per grid step.

    xyz_ref:  [1, 3, Npad] f32 in VMEM  (x, y, z rows)
    out_ref:  [1, 1, npoint] i32 in SMEM
    dist_ref: [1, Npad] f32 VMEM scratch (running min distance)
    """
    n_pad = xyz_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (1, n_pad), dimension=1)
    valid = lane < n_valid
    # Padding lanes get -inf so argmax never picks them; real lanes start
    # at +big like the reference (pointnet2_utils.py:106).
    dist_ref[:, :] = jnp.where(valid, 1e10, -jnp.inf).astype(jnp.float32)

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]

    def body(i, farthest):
        out_ref[0, 0, i] = farthest
        sel = lane == farthest
        cx = jnp.sum(jnp.where(sel, xs, 0.0))
        cy = jnp.sum(jnp.where(sel, ys, 0.0))
        cz = jnp.sum(jnp.where(sel, zs, 0.0))
        d = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        running = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = running
        # first-max-wins argmax over lanes (matches jnp.argmax)
        m = jnp.max(running)
        hit = jnp.where(running == m, lane, n_pad)
        return jnp.min(hit).astype(jnp.int32)

    lax.fori_loop(0, npoint, body, jnp.int32(0))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jax.Array, npoint: int, *, interpret: bool = False) -> jax.Array:
    """Farthest point sampling via a Pallas kernel.

    Args:
      xyz: ``[B, N, 3]`` float coordinates.
      npoint: number of samples (static).
    Returns:
      ``[B, npoint]`` int32 indices; identical to
      ``ppt_tpu.ops.farthest_point_sample(xyz, npoint)`` (start index 0).
    """
    B, N, _ = xyz.shape
    n_pad = _round_up(N, 128)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # [B, 3, N]
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint, N),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(xyz_t)[:, 0, :]
