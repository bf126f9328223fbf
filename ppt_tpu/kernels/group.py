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


def _choose_s_blk(S: int, n_pad: int) -> int:
    """Widest query-tile width that divides S and fits the VMEM cap.

    The dist scratch plus its compute intermediates cost ~4 f32 buffers
    of [s_blk, n_pad] per instance, so the cap bounds s_blk * n_pad
    (measured 29.75 MB at s_blk=256, N=8192 — over the ~17 MB scoped
    limit; 12 MiB leaves headroom for the gather outputs)."""
    s_blk = next(
        (c for c in (256, 128, 64, 32, 16, 8)
         if S % c == 0 and c * n_pad * 16 <= 12 * 1024 * 1024),
        None,
    )
    if s_blk is None:
        if S % 8:
            raise ValueError(f"S={S} must be a multiple of 8")
        raise ValueError(
            f"N~{n_pad} too large for the VMEM-capped query tiles: even "
            f"s_blk=8 needs {8 * n_pad * 16 / 2**20:.1f} MiB (> 12 MiB "
            "cap) — use the XLA fallback path for this shape"
        )
    return s_blk


def _bf16x3_parts(x: jax.Array) -> jax.Array:
    """Exact 3-way bf16 decomposition along the last axis.

    ``[..., C] f32 -> [..., 3C] bf16`` with columns ``[hi | mid | lo]``
    such that ``hi + mid + lo == x`` EXACTLY (f32 has a 24-bit mantissa;
    each rounding residual fits the next 8-bit bf16 mantissa, and the
    final residual is exactly representable). Lets the in-kernel one-hot
    gather run as a SINGLE bf16 MXU pass with f32 accumulation —
    products ``1.0 * part`` are exact — instead of a 6-pass HIGHEST f32
    matmul (measured ~2 us vs ~0.3 us per [256,1024]x[1024,128] pass).

    NOTE: the split is computed with mantissa bit-masks, not
    ``astype(bf16)`` round-trips — the fleet runs XLA with
    ``--xla_allow_excess_precision=true``, which elides f32->bf16->f32
    cast chains and silently turns the residuals into zeros (caught
    on-chip by kernel_check; interpret mode honored the casts).
    """

    def trunc16(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )

    hi = trunc16(x)          # top 16 bits: exactly a bf16 value
    r1 = x - hi              # exact: <= 16 significant bits remain
    mid = trunc16(r1)
    lo = r1 - mid            # exact: <= 8 significant bits remain
    return jnp.concatenate(
        [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
         lo.astype(jnp.bfloat16)], axis=-1
    )


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
    k: int, n_valid: int, relative: bool, g_per_write: int, gather: str,
    q_ref, xyz_ref, parts_ref, idx_ref, nx_ref, ny_ref, nz_ref, dist_ref,
):
    """q_ref: [1, S_blk, 3]; xyz_ref: [1, 3, Npad]; parts_ref:
    [1, Npad, 9] bf16 (``_bf16x3_parts`` of the n-on-sublanes
    coordinates — the gather-matmul RHS);
    idx/nx/ny/nz_ref: [1, S_blk, k]; dist_ref: [S_blk, Npad] scratch.

    Each extraction pass gathers the winner's coordinates with ONE
    single-pass bf16 one-hot matmul ``sel @ [Npad, 9]`` (f32
    accumulation) on the otherwise-idle MXU instead of three masked
    broadcast+reduce VPU passes. Exact: ``sel`` rows are one-hot, the
    products ``1.0 * part`` are exact bf16 values accumulated in f32,
    and ``hi + mid + lo`` reconstructs every f32 coordinate bit
    (verified on-chip by ``tools/kernel_check``).
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
    dist_ref[:, :] = jnp.where(valid, d, jnp.inf)
    support = parts_ref[0]  # [Npad, 9] bf16

    # fori_loop (not a Python unroll): the selection matmul materializes
    # a [S_blk, Npad] `sel` per pass, and an unrolled loop keeps all
    # k of them live on the Mosaic stack (28 MB > the 16 MB scoped-VMEM
    # limit at k=32). Outputs accumulate into the carry via one-hot
    # column masks (exact: index/coord values times 0/1), written once
    # at the end — also sidesteps dynamic-lane-offset stores.
    #
    # ``g_per_write`` winners per pass: each subsequent extraction reuses
    # the previous one's eviction materialization before the single
    # combined write-back, so a pair costs ~8 full-width VPU tile-ops +
    # 1 write vs ~6 + 1 per single-winner pass — ~25% fewer ops/winner
    # and half the loop passes (g=2 is the shipped default; g=4 is the
    # A/B probe variant — write-back savings shrink geometrically).
    # (A read-only lexicographic-threshold form — no eviction writes at
    # all — measured SLOWER: 20.2 vs 16.1 ms at N=8192; the loop is
    # op-count-bound, and the threshold mask costs more ops than the
    # write it saves.)
    lane_k = lax.broadcasted_iota(jnp.int32, (s_blk, k), dimension=1)

    def extract(running, j):
        """One exact min-extraction: (evicted running', idx, coords)."""
        m = jnp.min(running, axis=1, keepdims=True)
        # tie-break to the lowest index (reference knn_point contract)
        idx = jnp.min(
            jnp.where(running == m, lane, n_pad), axis=1, keepdims=True
        )
        sel = lane == idx
        if gather == "fused":
            g9 = lax.dot_general(
                sel.astype(jnp.bfloat16), support,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S_blk, 9] — one bf16 MXU pass
            g = g9[:, 0:3] + g9[:, 3:6] + g9[:, 6:9]  # exact f32 coords
        else:  # 'stacked' gathers after the loop; 'none' is a probe
            g = jnp.zeros((s_blk, 3), jnp.float32)
        oh = (lane_k == j).astype(jnp.float32)  # [S_blk, k]
        return jnp.where(sel, jnp.inf, running), idx, g, oh

    zero = jnp.zeros((s_blk, k), jnp.float32)
    g_pw = max(1, min(g_per_write, k))

    def take(carry, running, j):
        """Extract winner j from ``running``, accumulate into carry."""
        acc_i, acc_x, acc_y, acc_z = carry
        r, idx1, g1, oh1 = extract(running, j)
        return (
            acc_i + idx1.astype(jnp.float32) * oh1,
            acc_x + g1[:, 0:1] * oh1,
            acc_y + g1[:, 1:2] * oh1,
            acc_z + g1[:, 2:3] * oh1,
        ), r

    def body(p, carry):
        r = dist_ref[:, :]
        for t in range(g_pw):  # in-register chain, one write-back
            carry, r = take(carry, r, g_pw * p + t)
        dist_ref[:, :] = r
        return carry

    carry = lax.fori_loop(0, k // g_pw, body, (zero, zero, zero, zero))
    r = dist_ref[:, :]
    for j in range(k - k % g_pw, k):  # remainder: no final write needed
        carry, r = take(carry, r, j)
    acc_i, acc_x, acc_y, acc_z = carry

    if gather == "stacked":
        # Post-loop grouped gather: the per-winner in-loop one-hot
        # matmul is latency-bound at small N (k serialized 9-lane MXU
        # calls: ~1.0 of the 2.06 ms kernel at N=1024) and output-lane
        # bound at large N. Re-deriving the one-hots from the
        # accumulated winner lanes and issuing ONE [Gw*S_blk, Npad] @
        # [Npad, 9] matmul per group of Gw winners batches the MXU work
        # the extraction loop cannot overlap. Exact: lane ids < 2^24
        # compare exactly in f32, and the bf16 3-part support
        # reconstruction is unchanged.
        # one-hot block gw*s_blk*n_pad bf16 capped at 4.2 MB. gw is
        # keyed on the PRODUCT s_blk*n_pad (n_pad alone let
        # s_blk=256 x n_pad=2048 build an 8.4 MB block that blew the
        # 16 MB scoped-VMEM stack on-chip); the wrapper clamps stacked
        # s_blk so the product never exceeds 512 Ki — the footprint of
        # the two on-chip-verified configs (256 Ki/gw=8 at N=1024,
        # 512 Ki/gw=4 at N=8192).
        gw = 8 if s_blk * n_pad <= 256 * 1024 else 4
        lane_f = lane.astype(jnp.float32)
        for g0 in range(0, k, gw):
            gn = min(gw, k - g0)
            # per-winner one-hot rows stacked on sublanes (a
            # transpose-free construction: Mosaic cannot relayout
            # [S_blk, gn] -> [gn*S_blk, 1], but broadcast-compare +
            # sublane concat lowers fine)
            oh = jnp.concatenate(
                [
                    (lane_f == acc_i[:, g0 + w : g0 + w + 1]).astype(
                        jnp.bfloat16
                    )
                    for w in range(gn)
                ],
                axis=0,
            )  # [gn*S_blk, Npad]
            g9 = lax.dot_general(
                oh, support, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [gn*S_blk, 9]
            g3 = g9[:, 0:3] + g9[:, 3:6] + g9[:, 6:9]
            for w in range(gn):
                gw3 = g3[w * s_blk : (w + 1) * s_blk, :]
                ohk = (lane_k == (g0 + w)).astype(jnp.float32)
                acc_x = acc_x + gw3[:, 0:1] * ohk
                acc_y = acc_y + gw3[:, 1:2] * ohk
                acc_z = acc_z + gw3[:, 2:3] * ohk

    idx_ref[0, :, :] = acc_i.astype(jnp.int32)
    if relative:
        nx_ref[0, :, :] = acc_x - qx
        ny_ref[0, :, :] = acc_y - qy
        nz_ref[0, :, :] = acc_z - qz
    else:
        nx_ref[0, :, :] = acc_x
        ny_ref[0, :, :] = acc_y
        nz_ref[0, :, :] = acc_z


def _stacked_s_blk(s_blk: int, n_pad: int) -> int:
    """Query-tile clamp for ``gather='stacked'``: the post-loop gather
    keeps k/gw unrolled groups' intermediates on the Mosaic stack on
    TOP of the extraction loop's — at s_blk=256 x n_pad=2048 that
    measured 16.2–16.4 MB against the 16 MB scoped-VMEM cap (at any
    gw). Halving the tile returns every [s_blk, n_pad] buffer to the
    footprint of the on-chip-verified configs (s_blk*n_pad of 256 Ki
    with gw=8, 512 Ki with gw=4)."""
    return 128 if (s_blk > 128 and s_blk * n_pad > 256 * 1024) else s_blk


@functools.partial(
    jax.jit,
    static_argnames=("k", "relative", "pair", "gather", "interpret"),
)
def knn_gather(
    k: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    relative: bool = True,
    pair="auto",
    gather="fused",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """kNN + coordinate gather in one kernel.

    Returns (idx [B, S, k] int32, neighborhood [B, S, k, 3] float32 —
    center-relative when ``relative``). Equivalent to
    ``knn_point`` + ``index_points`` + subtraction.

    ``pair`` sets the winners-per-write-back group: 'auto' (default)
    picks 4 at N>=4096 else 2 — same-session v5e A/B at N=8192: quad
    12.42 vs paired 13.86 ms (the write-back saving matters more the
    wider the tile), while at N=1024 quad LOST (2.44 vs 2.06, register
    pressure) — True=2, False=1, or an explicit int. ``gather``:
    'fused'/True (default) gathers per winner inside the loop;
    'stacked' collects winner coordinates after the loop in batched
    one-hot matmuls — measured SLOWER both at N=1024 (2.27/2.04 vs
    2.07) and N=8192 (15.0/14.8 vs 13.95): rebuilding one-hots from the
    winner lanes duplicates the compare work the loop's eviction
    already does, costing more than the batched MXU issue saves; kept
    as the documented negative (docs/PROFILE_r05.md §3). 'none'/False
    is a probe-only ablation that skips the gather (neighborhood output
    meaningless; idx exact).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # 256-wide query tiles measured fastest on v5e (4.2 vs 4.8 ms at the
    # PPT-Base shapes); fall back to 128/8 for smaller S, and to narrower
    # tiles at large N so the dist scratch fits VMEM instead of OOMing
    # (reference-native npoints is 8192) — see _choose_s_blk.
    n_pad = _round_up(N, 128)
    s_blk = _choose_s_blk(S, n_pad)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    # bool legacy spelling: True=paired, False=single; ints pass through
    # (isinstance check first — `1 == True` would alias in a dict lookup)
    if pair == "auto":
        # keyed on the caller's N (as documented), not the padded width:
        # N in [3969, 4095] pads to 4096 but stays on the paired cadence
        g_pw = 4 if N >= 4096 else 2
    else:
        g_pw = pair if not isinstance(pair, bool) else (2 if pair else 1)
    if isinstance(gather, bool):
        gather = "fused" if gather else "none"
    if gather not in ("stacked", "fused", "none"):
        raise ValueError(f"gather mode {gather!r}")
    if gather == "stacked":
        s_blk = _stacked_s_blk(s_blk, n_pad)
    out_spec = pl.BlockSpec((1, s_blk, k), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, S, k), jnp.float32)
    idx, nx, ny, nz = pl.pallas_call(
        functools.partial(
            _knn_gather_kernel, k, N, relative, int(g_pw), gather
        ),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 9), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            out_shape, out_shape, out_shape,
        ),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(
        new_xyz.astype(jnp.float32), xyz_t,
        _bf16x3_parts(jnp.swapaxes(xyz_t, 1, 2)),
    )
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
    [1, Npad, 9] (``_bf16x3_parts`` of the n-on-sublanes coordinates —
    reconstructed to f32 here so the [chunk, 4] selection-matmul RHS
    slices out without an in-kernel transpose);
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
        p9 = xyz_nl_ref[0, sl, :].astype(jnp.float32)  # [chunk, 9] parts
        vals = jnp.concatenate(
            [lane_c, p9[:, 0:3] + p9[:, 3:6] + p9[:, 6:9]], axis=1
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


def _ball_query_feats_kernel(
    nsample: int, radius: float, n_valid: int, relative: bool, mode: str,
    q_ref, xyz_ref, xyz_nl_ref, feats_ref,
    idx_ref, nx_ref, ny_ref, nz_ref, fj_ref, dist_ref,
):
    """Ball query + coordinate gather + FEATURE gather in one kernel.

    Same extraction loop as ``_ball_query_kernel``; afterwards the final
    index table drives a one-hot matmul gather of the support features
    (``feats_ref``: [1, Npad, F] — bf16 activations, so a single bf16
    MXU pass with f32 accumulation reproduces them exactly), emitted as
    ``fj_ref`` [1, S_blk, nsample, F]. This exists because XLA's native
    row gather is the dominant cost of PointNeXt inference on TPU
    (measured ~18 ms for ONE [128,1024,32]-by-[128,512,32] gather —
    more than the entire extraction loop); the one-hot build + matmul
    is ~10 us per instance. One-hot blocks are built 8 query-slots at a
    time to bound VMEM.
    """
    _ball_query_kernel(
        nsample, radius, n_valid, relative, mode,
        q_ref, xyz_ref, xyz_nl_ref, idx_ref, nx_ref, ny_ref, nz_ref,
        dist_ref,
    )
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]
    f_dim = feats_ref.shape[2]
    support_f = feats_ref[0]  # [Npad, F]
    idx_all = idx_ref[0, :, :]  # [S_blk, nsample] int32 (all slots valid)
    budget = max(1, 2048 // s_blk)
    chunk = 1
    for c in range(1, nsample + 1):  # largest divisor of nsample <= budget
        if nsample % c == 0 and c <= budget:
            chunk = c
    lane3 = lax.broadcasted_iota(jnp.int32, (s_blk, chunk, n_pad), 2)
    for js in range(0, nsample, chunk):
        # explicit slice+expand_dims: the jnp mixed basic/None indexing
        # form lowers through lax.gather, which Mosaic rejects
        sl = jnp.expand_dims(
            lax.slice_in_dim(idx_all, js, js + chunk, axis=1), -1
        )
        p = (sl == lane3).astype(jnp.bfloat16)
        fj = lax.dot_general(
            p.reshape(s_blk * chunk, n_pad), support_f,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_blk*chunk, F]
        fj_ref[0, :, js : js + chunk, :] = fj.reshape(
            s_blk, chunk, f_dim
        ).astype(fj_ref.dtype)


def _ball_query_kernel(
    nsample: int, radius: float, n_valid: int, relative: bool, mode: str,
    q_ref, xyz_ref, xyz_nl_ref, idx_ref, nx_ref, ny_ref, nz_ref, dist_ref,
):
    """v1 extraction-pass ball query — the SHIPPED kernel (the
    rank-matmul v2 above measured slower).

    Like ``_knn_gather_kernel``, each pass gathers the winner's
    coordinates with one one-hot selection matmul against
    ``xyz_nl_ref`` ([Npad, 3], n-on-sublanes) on the otherwise-idle MXU
    — and because ``idx`` is already first-hit-substituted before
    ``sel`` is built, the not-found fallback coordinates come out of the
    same matmul (the old per-coordinate ``where(found, ...)`` repairs
    were redundant). ~11 -> ~5 full-tile VPU ops per pass.

    q_ref: [1, S_blk, 3]; xyz_ref: [1, 3, Npad];
    idx/nx/ny/nz_ref: [1, S_blk, nsample]; dist_ref: [S_blk, Npad]
    scratch holds the "avail" table: each in-ball lane stores its own
    lane index as f32, others hold an +inf sentinel. Ascending-index
    winners then fall out as successive minima of the table; how each
    variant advances past extracted winners (eviction write-backs vs a
    read-only threshold) is per-``mode`` — see the three-variant
    comment block in the body. The shipped default is ``paired``
    (same-session v5e chain probe at the PointNeXt-S stage-1 anchor
    shape, B128 N1024 S512 r0.15 ns32 F32: paired 10.71 ms vs evict
    12.63 vs threshold 12.14 — docs/PROFILE_r05.md).
    """
    s_blk = q_ref.shape[1]
    n_pad = xyz_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (s_blk, n_pad), dimension=1)
    lane_f = lane.astype(jnp.float32)
    valid = lane < n_valid
    inf = jnp.float32(1e9)

    xs = xyz_ref[0, 0:1, :]
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d = (qx - xs) ** 2 + (qy - ys) ** 2 + (qz - zs) ** 2
    in_ball = (d <= radius * radius) & valid
    dist_ref[:, :] = jnp.where(in_ball, lane_f, inf)
    support = xyz_nl_ref[0]  # [Npad, 9] bf16 parts

    # fori_loop + one-hot output accumulation for the same scoped-VMEM
    # reason as _knn_gather_kernel. `first` (the pad-with-first-hit
    # index) rides the carry; j == 0 initializes it in-loop.
    #
    # Three extraction variants for on-chip A/B (winners stream out in
    # identical ascending-index order in all three):
    #   evict     — per-winner min + masked inf write-back (round-3 form)
    #   threshold — avail table read-only; min over entries > the
    #               carried last winner (no write-backs)
    #   paired    — two winners per pass; the second min reuses the
    #               first's eviction materialization before one combined
    #               write-back (the _knn_gather_kernel trick)
    lane_k = lax.broadcasted_iota(jnp.int32, (s_blk, nsample), dimension=1)

    def winner(cand, j, first):
        """Shared per-winner tail: first-hit padding, gather, one-hot."""
        found = cand < inf
        # reference pads with the first hit; all-empty queries clamp
        first = jnp.where(
            j == 0, jnp.where(found, cand, jnp.float32(n_valid - 1)), first
        )
        idx = jnp.where(found, cand, first)
        # exact f32 integer compare (lane < 2^24); when exhausted sel
        # re-gathers `first` (harmless — idx already falls back to it)
        sel = lane_f == idx
        g9 = lax.dot_general(
            sel.astype(jnp.bfloat16), support,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_blk, 9] — one bf16 MXU pass
        g = g9[:, 0:3] + g9[:, 3:6] + g9[:, 6:9]  # exact f32 coords
        oh = (lane_k == j).astype(jnp.float32)  # [S_blk, nsample]
        acc = (
            idx * oh, g[:, 0:1] * oh, g[:, 1:2] * oh, g[:, 2:3] * oh,
        )
        return first, cand, sel, acc

    def add(a, b):
        return tuple(x + y for x, y in zip(a, b))

    zero = jnp.zeros((s_blk, nsample), jnp.float32)
    acc0 = (zero, zero, zero, zero)
    first0 = jnp.zeros((s_blk, 1), jnp.float32)

    if mode == "threshold":
        def body(j, carry):
            first, last, acc = carry
            tbl = dist_ref[:, :]
            cand = jnp.min(
                jnp.where(tbl > last, tbl, inf), axis=1, keepdims=True
            )
            first, cand, _, a = winner(cand, j, first)
            return (
                first,
                jnp.where(cand < inf, cand, last),
                add(acc, a),
            )

        last0 = jnp.full((s_blk, 1), -1.0, jnp.float32)
        _, _, (acc_i, acc_x, acc_y, acc_z) = lax.fori_loop(
            0, nsample, body, (first0, last0, acc0)
        )
    elif mode == "paired":
        def pbody(p, carry):
            first, acc = carry
            running = dist_ref[:, :]
            c1 = jnp.min(running, axis=1, keepdims=True)
            first, _, sel1, a1 = winner(c1, 2 * p, first)
            r1 = jnp.where(sel1, inf, running)
            c2 = jnp.min(r1, axis=1, keepdims=True)
            first, _, sel2, a2 = winner(c2, 2 * p + 1, first)
            dist_ref[:, :] = jnp.where(sel2, inf, r1)
            return first, add(add(acc, a1), a2)

        first, (acc_i, acc_x, acc_y, acc_z) = lax.fori_loop(
            0, nsample // 2, pbody, (first0, acc0)
        )
        if nsample % 2:
            c1 = jnp.min(dist_ref[:, :], axis=1, keepdims=True)
            _, _, _, a1 = winner(c1, nsample - 1, first)
            acc_i, acc_x, acc_y, acc_z = add(
                (acc_i, acc_x, acc_y, acc_z), a1
            )
    else:  # evict — the round-3 reference form
        def ebody(j, carry):
            first, acc = carry
            running = dist_ref[:, :]
            cand = jnp.min(running, axis=1, keepdims=True)
            first, _, sel, a = winner(cand, j, first)
            dist_ref[:, :] = jnp.where(sel, inf, running)
            return first, add(acc, a)

        _, (acc_i, acc_x, acc_y, acc_z) = lax.fori_loop(
            0, nsample, ebody, (first0, acc0)
        )
    idx_ref[0, :, :] = acc_i.astype(jnp.int32)
    if relative:
        nx_ref[0, :, :] = acc_x - qx
        ny_ref[0, :, :] = acc_y - qy
        nz_ref[0, :, :] = acc_z - qz
    else:
        nx_ref[0, :, :] = acc_x
        ny_ref[0, :, :] = acc_y
        nz_ref[0, :, :] = acc_z


_BALL_MODES = ("paired", "evict", "threshold")


def _check_ball_mode(mode: str) -> None:
    # the kernel's else-branch is the evict variant; an unknown string
    # must not silently run it
    if mode not in _BALL_MODES:
        raise ValueError(
            f"ball query mode {mode!r} not in {_BALL_MODES}"
        )


@functools.partial(
    jax.jit,
    static_argnames=("nsample", "radius", "relative", "mode", "interpret"),
)
def ball_query_gather(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    relative: bool = True,
    mode: str = "paired",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Ball query + coordinate gather in one kernel.

    Returns (idx [B, S, nsample] int32, grouped_xyz [B, S, nsample, 3]
    float32 — center-relative when ``relative``). Matches
    ``ops.query_ball_point`` + ``index_points`` + subtraction.
    """
    _check_ball_mode(mode)
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # largest power-of-two tile dividing S: a small S must not fall to
    # 8-wide tiles (S=64 with s_blk=8 ran 8x more grid instances, each
    # paying the full nsample-pass serial loop — measured 14.7 ms for
    # the B=128 S=64 PointNeXt stage vs ~2 ms at s_blk=64). The VMEM cap
    # bounds s_blk*n_pad so large-N inputs narrow the tile instead of
    # OOMing the ~17 MB scoped limit (see knn_gather).
    n_pad = _round_up(N, 128)
    s_blk = _choose_s_blk(S, n_pad)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    out_spec = pl.BlockSpec((1, s_blk, nsample), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((B, S, nsample), jnp.float32)
    idx, nx, ny, nz = pl.pallas_call(
        functools.partial(
            _ball_query_kernel, nsample, float(radius), N, relative, mode
        ),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 9), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            fshape, fshape, fshape,
        ),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(
        new_xyz.astype(jnp.float32), xyz_t,
        _bf16x3_parts(jnp.swapaxes(xyz_t, 1, 2)),
    )
    grouped = jnp.stack([nx, ny, nz], axis=-1)
    return idx, grouped


@functools.partial(
    jax.jit,
    static_argnames=("nsample", "radius", "relative", "mode", "interpret"),
)
def ball_query_gather_feats(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    feats: jax.Array,
    *,
    relative: bool = True,
    mode: str = "paired",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Ball query + coordinate gather + feature gather in one kernel.

    Returns (idx [B, S, nsample] i32, grouped_xyz [B, S, nsample, 3] f32,
    fj [B, S, nsample, F] in feats.dtype). Replaces
    ``query_ball_point`` + two ``index_points`` calls — the XLA feature
    gather alone costs more than the whole kernel at PointNeXt shapes.
    """
    _check_ball_mode(mode)
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    F = feats.shape[2]
    # largest power-of-two tile dividing S: a small S must not fall to
    # 8-wide tiles (S=64 with s_blk=8 ran 8x more grid instances, each
    # paying the full nsample-pass serial loop — measured 14.7 ms for
    # the B=128 S=64 PointNeXt stage vs ~2 ms at s_blk=64). The VMEM cap
    # bounds s_blk*n_pad so large-N inputs narrow the tile instead of
    # OOMing the ~17 MB scoped limit (see knn_gather).
    n_pad = _round_up(N, 128)
    s_blk = _choose_s_blk(S, n_pad)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    feats_p = feats.astype(jnp.bfloat16)
    if n_pad != N:
        feats_p = jnp.pad(feats_p, ((0, 0), (0, n_pad - N), (0, 0)))

    out_spec = pl.BlockSpec((1, s_blk, nsample), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((B, S, nsample), jnp.float32)
    idx, nx, ny, nz, fj = pl.pallas_call(
        functools.partial(
            _ball_query_feats_kernel, nsample, float(radius), N, relative,
            mode,
        ),
        grid=(B, S // s_blk),
        in_specs=[
            pl.BlockSpec((1, s_blk, 3), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 9), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, F), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out_spec, out_spec, out_spec, out_spec,
            pl.BlockSpec((1, s_blk, nsample, F), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
            fshape, fshape, fshape,
            jax.ShapeDtypeStruct((B, S, nsample, F), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((s_blk, n_pad), jnp.float32)],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t,
      _bf16x3_parts(jnp.swapaxes(xyz_t, 1, 2)), feats_p)
    grouped = jnp.stack([nx, ny, nz], axis=-1)
    return idx, grouped, fj.astype(feats.dtype)


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
