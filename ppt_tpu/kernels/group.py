"""Fused Pallas grouping kernels — the PointBERT tokenization hot path.

Honest v5e timings at B=32, N=1024, G=512, K=32 (value-fetch timing, see
CLAUDE.md) for the XLA pipeline: FPS 4.5 ms + kNN top_k 4.6 ms +
neighborhood gather 3.0 ms ≈ 12.7 ms — a third of the whole PPT-Base
train step. These kernels attack all three:

- :func:`fps_batched`: farthest point sampling with 8 clouds per kernel
  instance — batch rides the sublanes, so one 512-iteration loop serves
  8 clouds ([8, N] distance updates), instead of the serial per-cloud
  grid of ``fps.py`` / the per-iteration argmax fusions XLA emits.
- :func:`knn_gather`: kNN that *also emits the gathered, center-relative
  neighborhood coordinates* during the min-extraction loop — the
  ``[B, G, K, 3]`` HBM gather disappears; coordinates come out of the
  same VMEM-resident distance tiles via masked reductions.

``fused_group`` chains them into the Group-divider contract
(``models/pointbert/dvae.py:152-181``): (neighborhood - center, center).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Batched FPS: 8 clouds per instance, batch on sublanes
# ---------------------------------------------------------------------------


def _fps_batched_kernel(npoint: int, n_valid: int, xyz_ref, out_ref, dist_ref):
    """xyz_ref: [8, 3, Npad] VMEM; out_ref: [8, npoint] i32 VMEM;
    dist_ref: [8, Npad] f32 scratch."""
    n_pad = xyz_ref.shape[2]
    rows = xyz_ref.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (rows, n_pad), dimension=1)
    valid = lane < n_valid
    dist_ref[:, :] = jnp.where(valid, 1e10, -jnp.inf).astype(jnp.float32)

    xs = xyz_ref[:, 0, :]  # [8, Npad]
    ys = xyz_ref[:, 1, :]
    zs = xyz_ref[:, 2, :]

    def body(i, farthest):
        # farthest: [8, 1] i32. Indices stream out through scalar SMEM
        # stores (Mosaic can't store a vector at a dynamic lane offset).
        for r in range(rows):
            out_ref[r, i] = farthest[r, 0]
        sel = lane == farthest
        cx = jnp.sum(jnp.where(sel, xs, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, ys, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, zs, 0.0), axis=1, keepdims=True)
        d = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        running = jnp.minimum(dist_ref[:, :], d)
        dist_ref[:, :] = running
        m = jnp.max(running, axis=1, keepdims=True)
        hit = jnp.where(running == m, lane, n_pad)
        return jnp.min(hit, axis=1, keepdims=True).astype(jnp.int32)

    lax.fori_loop(0, npoint, body, jnp.zeros((rows, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "rows", "interpret"))
def fps_batched(
    xyz: jax.Array, npoint: int, *, rows: int = 32, interpret: bool = False
) -> jax.Array:
    """FPS indices [B, npoint] (start index 0 per cloud), ``rows`` clouds
    per kernel instance (batch on sublanes — 32 rows makes the whole
    B=32 FPS effectively free: ~0.1 ms vs ~4.5 ms for the XLA loop).
    Matches ``ops.farthest_point_sample``."""
    B, N, _ = xyz.shape
    rows = min(rows, _round_up(B, 8))
    b_pad = _round_up(B, rows)
    n_pad = _round_up(N, 128)
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # [B, 3, N]
    xyz_t = jnp.pad(xyz_t, ((0, b_pad - B), (0, 0), (0, n_pad - N)))

    out = pl.pallas_call(
        functools.partial(_fps_batched_kernel, npoint, N),
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows, npoint), lambda b: (b, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, n_pad), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    return out[:B]


# ---------------------------------------------------------------------------
# Fused kNN + neighborhood gather
# ---------------------------------------------------------------------------


def _knn_gather_kernel(
    k: int, n_valid: int, relative: bool,
    q_ref, xyz_ref, idx_ref, nx_ref, ny_ref, nz_ref, dist_ref,
):
    """q_ref: [1, S_blk, 3]; xyz_ref: [1, 3, Npad];
    idx/nx/ny/nz_ref: [1, S_blk, k]; dist_ref: [S_blk, Npad] scratch."""
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (s_blk, n_pad), dimension=1)
    valid = lane < n_valid

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d = (qx - xs) ** 2 + (qy - ys) ** 2 + (qz - zs) ** 2
    dist_ref[:, :] = jnp.where(valid, d, jnp.inf)

    for j in range(k):
        running = dist_ref[:, :]
        m = jnp.min(running, axis=1, keepdims=True)
        is_min = running == m
        idx = jnp.min(jnp.where(is_min, lane, n_pad), axis=1, keepdims=True)
        sel = lane == idx
        gx = jnp.sum(jnp.where(sel, jnp.broadcast_to(xs, sel.shape), 0.0), axis=1, keepdims=True)
        gy = jnp.sum(jnp.where(sel, jnp.broadcast_to(ys, sel.shape), 0.0), axis=1, keepdims=True)
        gz = jnp.sum(jnp.where(sel, jnp.broadcast_to(zs, sel.shape), 0.0), axis=1, keepdims=True)
        idx_ref[0, :, j : j + 1] = idx.astype(jnp.int32)
        if relative:
            nx_ref[0, :, j : j + 1] = gx - qx
            ny_ref[0, :, j : j + 1] = gy - qy
            nz_ref[0, :, j : j + 1] = gz - qz
        else:
            nx_ref[0, :, j : j + 1] = gx
            ny_ref[0, :, j : j + 1] = gy
            nz_ref[0, :, j : j + 1] = gz
        dist_ref[:, :] = jnp.where(sel, jnp.inf, running)


@functools.partial(jax.jit, static_argnames=("k", "relative", "interpret"))
def knn_gather(
    k: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    relative: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """kNN + coordinate gather in one kernel.

    Returns (idx [B, S, k] int32, neighborhood [B, S, k, 3] float32 —
    center-relative when ``relative``). Equivalent to
    ``knn_point`` + ``index_points`` + subtraction.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # 256-wide query tiles measured fastest on v5e (4.2 vs 4.8 ms at the
    # PPT-Base shapes); fall back to 128/8 for smaller S
    s_blk = 256 if S % 256 == 0 else (128 if S % 128 == 0 else 8)
    assert S % s_blk == 0, f"S={S} must be a multiple of 8"
    n_pad = _round_up(N, 128)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    out_spec = pl.BlockSpec((1, s_blk, k), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, S, k), jnp.float32)
    idx, nx, ny, nz = pl.pallas_call(
        functools.partial(_knn_gather_kernel, k, N, relative),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            out_shape, out_shape, out_shape,
        ),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)
    neighborhood = jnp.stack([nx, ny, nz], axis=-1)  # [B, S, k, 3]
    return idx, neighborhood


def _ball_query_kernel_v2(
    nsample: int, radius: float, n_valid: int, relative: bool,
    q_ref, xyz_ref, xyz_nl_ref, idx_ref, nx_ref, ny_ref, nz_ref, dist_ref,
):
    """Ball query + gather via rank matmuls — no per-slot extraction.

    MEASURED AND NOT SHIPPED: exact on-chip (kernel_check: 0 index
    mismatches) but SLOWER than the v1 extraction loop at PointNeXt
    shapes (27.1 vs 17.2 ms for one stage at B=128, S=512, N=1024) —
    the [S_blk*nsample, chunk] @ [chunk, 4] selection GEMMs emit only 4
    output lanes, so the MXU runs at ~1/32 utilization and the rank
    bookkeeping costs more than the 32 extraction passes it replaces.
    Kept as the documented alternative; ``ball_query_gather`` dispatches
    to v1.

    The v1 kernel ran ``nsample`` sequential min-extraction passes over
    the [S_blk, N] mask (32 passes dominated PointNeXt-S inference:
    15.3 ms for one stage at B=128). This formulation needs ONE pass
    over N in 128-lane chunks:

      rank  = running_count + (mask @ U)        (U = upper-triangular
              ones: inclusive cumsum as an MXU matmul)
      P[q, s, j] = mask & (rank == s+1)          (one-hot selection)
      out  += reshape(P) @ [lane, x, y, z]       (selection matmul —
              indices AND gathered coordinates in the same GEMM; index
              arithmetic is exact in f32 below 2^24)

    Same contract as before: first ``nsample`` in-radius indices in
    ascending order, short rows padded with the first hit, zero-hit
    rows clamp to index n_valid-1 (gathering that point's coordinates).

    q_ref: [1, S_blk, 3]; xyz_ref: [1, 3, Npad]; xyz_nl_ref:
    [1, Npad, 3] (same coordinates n-on-sublanes, so the [chunk, 4]
    selection-matmul RHS slices out without an in-kernel transpose);
    idx/nx/ny/nz_ref: [1, S_blk, nsample]; dist_ref: unused scratch
    (kept for wrapper signature compatibility with v1).
    """
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]
    chunk = 128
    r2 = radius * radius

    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    # inclusive-cumsum operator over a 128 chunk
    tri = (
        lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        <= lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    ).astype(jnp.float32)
    # int iota then cast: Mosaic's tpu.iota only produces integer vectors
    slot = lax.broadcasted_iota(
        jnp.int32, (s_blk, nsample, chunk), dimension=1
    ).astype(jnp.float32)
    lane_chunk = lax.broadcasted_iota(jnp.int32, (s_blk, chunk), dimension=1)

    def body(c, carry):
        count, acc = carry  # [S_blk, 1], [S_blk*nsample, 4]
        sl = pl.ds(c * chunk, chunk)
        # distances computed per chunk — the full [S_blk, Npad] tile and
        # its broadcast temporaries would push scoped VMEM past 16 MB at
        # PointNeXt shapes (S_blk=128, N=1024)
        xs_c = xyz_ref[0, 0:1, sl]
        ys_c = xyz_ref[0, 1:2, sl]
        zs_c = xyz_ref[0, 2:3, sl]
        d = (qx - xs_c) ** 2 + (qy - ys_c) ** 2 + (qz - zs_c) ** 2
        m = (
            (d <= r2) & (lane_chunk + c * chunk < n_valid)
        ).astype(jnp.float32)  # [S_blk, chunk] 0/1
        csum = jax.lax.dot(
            m, tri, precision=lax.Precision.HIGHEST
        )  # inclusive ranks within the chunk
        rank = count + csum
        sel = (
            (rank[:, None, :] == slot + 1.0) & (m[:, None, :] > 0.5)
        ).astype(jnp.float32)  # [S_blk, nsample, chunk]
        lane_c = (
            lax.broadcasted_iota(jnp.int32, (chunk, 1), 0).astype(jnp.float32)
            + c * chunk
        )
        vals = jnp.concatenate(
            [lane_c, xyz_nl_ref[0, sl, :]], axis=1
        )  # [chunk, 4] = (lane, x, y, z)
        contrib = jax.lax.dot(
            sel.reshape(s_blk * nsample, chunk), vals,
            precision=lax.Precision.HIGHEST,
        )
        return count + csum[:, chunk - 1 : chunk], acc + contrib

    count0 = jnp.zeros((s_blk, 1), jnp.float32)
    acc0 = jnp.zeros((s_blk * nsample, 4), jnp.float32)
    count, acc = lax.fori_loop(0, n_pad // chunk, body, (count0, acc0))

    acc = acc.reshape(s_blk, nsample, 4)
    idx = acc[:, :, 0]
    gx = acc[:, :, 1]
    gy = acc[:, :, 2]
    gz = acc[:, :, 3]

    # pad short rows with the first hit; zero-hit rows clamp to the last
    # valid support point (reference contract, pointnet2_utils.py:119-139)
    has = slot[:, :, 0] < count  # [S_blk, nsample]
    any_hit = count > 0.5  # [S_blk, 1]
    last_x = xyz_ref[0, 0, n_valid - 1]
    last_y = xyz_ref[0, 1, n_valid - 1]
    last_z = xyz_ref[0, 2, n_valid - 1]
    first_idx = jnp.where(any_hit, idx[:, 0:1], float(n_valid - 1))
    first_x = jnp.where(any_hit, gx[:, 0:1], last_x)
    first_y = jnp.where(any_hit, gy[:, 0:1], last_y)
    first_z = jnp.where(any_hit, gz[:, 0:1], last_z)
    idx = jnp.where(has, idx, first_idx)
    gx = jnp.where(has, gx, first_x)
    gy = jnp.where(has, gy, first_y)
    gz = jnp.where(has, gz, first_z)

    idx_ref[0, :, :] = idx.astype(jnp.int32)
    if relative:
        nx_ref[0, :, :] = gx - qx
        ny_ref[0, :, :] = gy - qy
        nz_ref[0, :, :] = gz - qz
    else:
        nx_ref[0, :, :] = gx
        ny_ref[0, :, :] = gy
        nz_ref[0, :, :] = gz


def _ball_query_kernel(
    nsample: int, radius: float, n_valid: int, relative: bool,
    q_ref, xyz_ref, xyz_nl_ref, idx_ref, nx_ref, ny_ref, nz_ref, dist_ref,
):
    """v1 extraction-pass ball query — the SHIPPED kernel (the
    rank-matmul v2 above measured slower; ``xyz_nl_ref`` is v2's extra
    input layout, unused here).

    q_ref: [1, S_blk, 3]; xyz_ref: [1, 3, Npad];
    idx/nx/ny/nz_ref: [1, S_blk, nsample]; dist_ref: [S_blk, Npad]
    scratch holds the in-ball mask as 0/1 floats.
    """
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (s_blk, n_pad), dimension=1)
    valid = lane < n_valid

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d = (qx - xs) ** 2 + (qy - ys) ** 2 + (qz - zs) ** 2
    in_ball = (d <= radius * radius) & valid
    dist_ref[:, :] = in_ball.astype(jnp.float32)

    first = None
    fx = fy = fz = None
    for j in range(nsample):
        mask = dist_ref[:, :] > 0.5
        cand = jnp.min(
            jnp.where(mask, lane, n_pad), axis=1, keepdims=True
        )  # [S_blk, 1], n_pad if exhausted
        found = cand < n_pad
        if j == 0:
            # reference pads with the first hit; all-empty queries clamp
            first = jnp.where(found, cand, n_valid - 1)
            idx = first
        else:
            idx = jnp.where(found, cand, first)
        sel = lane == idx
        gx = jnp.sum(jnp.where(sel, jnp.broadcast_to(xs, sel.shape), 0.0), axis=1, keepdims=True)
        gy = jnp.sum(jnp.where(sel, jnp.broadcast_to(ys, sel.shape), 0.0), axis=1, keepdims=True)
        gz = jnp.sum(jnp.where(sel, jnp.broadcast_to(zs, sel.shape), 0.0), axis=1, keepdims=True)
        if j == 0:
            fx, fy, fz = gx, gy, gz
        else:
            gx = jnp.where(found, gx, fx)
            gy = jnp.where(found, gy, fy)
            gz = jnp.where(found, gz, fz)
        idx_ref[0, :, j : j + 1] = idx.astype(jnp.int32)
        if relative:
            nx_ref[0, :, j : j + 1] = gx - qx
            ny_ref[0, :, j : j + 1] = gy - qy
            nz_ref[0, :, j : j + 1] = gz - qz
        else:
            nx_ref[0, :, j : j + 1] = gx
            ny_ref[0, :, j : j + 1] = gy
            nz_ref[0, :, j : j + 1] = gz
        dist_ref[:, :] = jnp.where(lane == cand, 0.0, dist_ref[:, :])


@functools.partial(
    jax.jit, static_argnames=("nsample", "radius", "relative", "interpret")
)
def ball_query_gather(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    relative: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Ball query + coordinate gather in one kernel.

    Returns (idx [B, S, nsample] int32, grouped_xyz [B, S, nsample, 3]
    float32 — center-relative when ``relative``). Matches
    ``ops.query_ball_point`` + ``index_points`` + subtraction.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    s_blk = 128 if S % 128 == 0 else 8
    assert S % s_blk == 0, f"S={S} must be a multiple of 8"
    n_pad = _round_up(N, 128)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    out_spec = pl.BlockSpec((1, s_blk, nsample), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((B, S, nsample), jnp.float32)
    idx, nx, ny, nz = pl.pallas_call(
        functools.partial(_ball_query_kernel, nsample, float(radius), N, relative),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 3), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            fshape, fshape, fshape,
        ),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, jnp.swapaxes(xyz_t, 1, 2))
    grouped = jnp.stack([nx, ny, nz], axis=-1)
    return idx, grouped


def fused_group(
    xyz: jax.Array, num_group: int, group_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Pallas Group divider: FPS centers + kNN neighborhoods, normalized.
    Drop-in for ``ppt_tpu.nn.pointbert.group_points`` on TPU.

    Wrapped in stop_gradient: coordinates are network *inputs* (no
    parameters upstream), so no PPT training mode ever backpropagates
    through the grouping — making that explicit keeps autodiff from
    needing a VJP for the kernels.
    """
    xyz = lax.stop_gradient(xyz)
    idx = fps_batched(xyz, num_group)
    center = jnp.take_along_axis(xyz, idx[..., None], axis=1)  # [B, G, 3]
    _, neighborhood = knn_gather(group_size, xyz, center, relative=True)
    return neighborhood.astype(xyz.dtype), center
