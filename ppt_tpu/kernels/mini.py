"""Fused MiniPointNet (PointBERT group encoder) Pallas kernels.

The XLA path streams ~1 GB/step of [B, G, M, C] activations through two
Dense->BN->ReLU stages (docs/PROFILE_r02.md:90-92) and, in train mode,
re-reads them for the BatchNorm batch-stat reductions. These kernels
keep every intermediate in VMEM:

- BN1 feeds on an *affine* map of the [.., 3] input, so its batch stats
  come analytically from the tiny 3x3 input moment matrix (exact same
  mean/var up to f32 rounding) — no sweep needed before stage 2.
- ``mini_stats`` (train only): one sweep computing per-tile partial
  sums/sum-of-squares of the pre-BN2 activations ``h`` (BN1 already
  folded into the stage-1 weights).
- ``mini_forward``: the full chain with BOTH BatchNorms folded into the
  adjacent Dense weights — Dense(3->128) -> ReLU -> Dense(128->256) ->
  max_M and split-Dense(->512) -> ReLU -> Dense(512->256) -> max_M —
  per [g_blk] group tile, writing only the [B, G, 256] tokens.

Reference semantics: ``Encoder`` (models/pointbert/dvae.py:184-215);
the flax twin is ``ppt_tpu.nn.pointbert.MiniPointNet``. Both kernels
carry a custom VJP whose backward differentiates the plain-XLA twin
(dead code for the flagship's frozen point tower, exact for
partial-tuning head types).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA twins (semantic spec + VJP source)
# ---------------------------------------------------------------------------


def _stage1(groups2, fw1, fb1, w2, b2, dtype):
    """[N, 3] -> x2 [N, 256] (BN1 folded into fw1/fb1), compute dtype."""
    x = groups2.astype(dtype)
    x1 = jnp.maximum(x @ fw1.astype(dtype) + fb1.astype(dtype), 0)
    return x1 @ w2.astype(dtype) + b2.astype(dtype)


def _h_of(groups2, m_size, fw1, fb1, w2, b2, wg, wl, bsplit, dtype):
    """Pre-BN2 activations h [N, 512] (wg/wl/bsplit unfolded or folded)."""
    x2 = _stage1(groups2, fw1, fb1, w2, b2, dtype)
    n = groups2.shape[0]
    g = jnp.max(x2.reshape(n // m_size, m_size, -1), axis=1)  # [G', 256]
    gh = g @ wg.astype(dtype)  # [G', 512]
    x2h = (x2 @ wl.astype(dtype)).reshape(n // m_size, m_size, -1)
    h = x2h + gh[:, None, :] + bsplit.astype(dtype)
    return h.reshape(n, -1)


def _stats_twin(groups2, m_size, fw1, fb1, w2, b2, wg, wl, bsplit, dtype):
    h = _h_of(groups2, m_size, fw1, fb1, w2, b2, wg, wl, bsplit, dtype)
    hf = h.astype(jnp.float32)
    return jnp.sum(hf, axis=0), jnp.sum(hf * hf, axis=0)


def _forward_twin(
    groups2, m_size, fw1, fb1, w2, b2, fwg, fwl, fbsplit, w3, b3, dtype
):
    h = jnp.maximum(
        _h_of(groups2, m_size, fw1, fb1, w2, b2, fwg, fwl, fbsplit, dtype), 0
    )
    y = h @ w3.astype(dtype) + b3.astype(dtype)  # [N, 256]
    n = groups2.shape[0]
    return jnp.max(y.reshape(n // m_size, m_size, -1), axis=1)  # [G', 256]


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _x2_of(x_ref, fw1_ref, fb1_ref, w2_ref, b2_ref, dtype):
    """Stage 1+2 from the TRANSPOSED input block ``x_ref [1, 3, gm]``.

    The transposed layout keeps the input's VMEM block at [3(pad 8), gm]
    instead of [gm, 3(pad 128)] — a ~16x smaller footprint whose saving
    (~3.7 MB double-buffered at gm=4096) is what lets the 128-group
    tiles fit the 16 MB scoped limit. The 3-deep contraction runs as
    ``dot_general`` over dim 0 of both operands, so no in-kernel
    transpose is needed."""
    x = x_ref[0].astype(dtype)  # [3, gm]
    x1 = jnp.maximum(
        lax.dot_general(
            x, fw1_ref[:, :].astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + fb1_ref[0].astype(dtype), 0,
    )  # [gm, 128]
    return lax.dot_general(
        x1, w2_ref[:, :].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + b2_ref[0].astype(dtype)  # [gm, 256]


def _stats_kernel(
    m_size, dtype,
    x_ref, fw1_ref, fb1_ref, w2_ref, b2_ref,
    m2_ref, sg_ref, gm_ref,
):
    """Moment-matrix stats sweep (round-4 rewrite): the BN2 batch
    sums over ``h = x2@wl + max_M(x2)@wg + bs`` decompose algebraically —
    ``Σ_p (x2@wl)_c² = (wlᵀ (Σ_p x2 x2ᵀ) wl)_cc``, cross/broadcast terms
    need only per-GROUP column sums and maxes of x2 — so this kernel
    never runs the dominant [N, 256]x[256, 512] ``wl`` matmul or touches
    per-point h at all. It emits the accumulated second moment
    ``m2_ref [Cs, Cs]`` (one block revisited by every grid instance),
    per-group column sums ``sg_ref`` and maxes ``gm_ref`` (f32); the tiny
    quadratic-form epilogue happens in XLA (``_stats_pallas``).

    x_ref: [1, 3, gm_blk] (transposed — see _x2_of); sg/gm_ref:
    [1, g_blk, Cs]."""
    gm = x_ref.shape[2]
    b = pl.program_id(0)
    t = pl.program_id(1)
    x2 = _x2_of(x_ref, fw1_ref, fb1_ref, w2_ref, b2_ref, dtype)

    m2_partial = lax.dot_general(
        x2, x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Cs, Cs]

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _init():
        m2_ref[...] = jnp.zeros_like(m2_ref)

    m2_ref[...] += m2_partial

    x2g = x2.reshape(gm // m_size, m_size, -1)
    sg_ref[0] = jnp.sum(x2g.astype(jnp.float32), axis=1)
    gm_ref[0] = jnp.max(x2g, axis=1).astype(jnp.float32)


def _forward_kernel(
    m_size, dtype,
    x_ref, fw1_ref, fb1_ref, w2_ref, b2_ref, fwg_ref, fwl_ref, fbs_ref,
    w3_ref, b3_ref, out_ref,
):
    """x_ref: [1, 3, gm_blk] (transposed — see _x2_of);
    out_ref: [1, gm_blk // m_size, 256]."""
    gm = x_ref.shape[2]
    x2 = _x2_of(x_ref, fw1_ref, fb1_ref, w2_ref, b2_ref, dtype)
    g = jnp.max(x2.reshape(gm // m_size, m_size, -1), axis=1)
    gh = lax.dot_general(
        g, fwg_ref[:, :].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    x2h = lax.dot_general(
        x2, fwl_ref[:, :].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(gm // m_size, m_size, -1)
    h = jnp.maximum(
        x2h + gh[:, None, :] + fbs_ref[0].astype(dtype), 0
    ).reshape(gm, -1)
    y = lax.dot_general(
        h, w3_ref[:, :].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + b3_ref[0].astype(dtype)
    out_ref[0, :, :] = jnp.max(
        y.reshape(gm // m_size, m_size, -1), axis=1
    ).astype(out_ref.dtype)


def _pick_gm_blk(n_groups: int, m_size: int) -> int:
    # PPT_MINI_GBLK overrides the tile width for on-chip A/B probes
    # (wider tiles amortize per-instance pipeline fill but grow the
    # VMEM-resident stage intermediates ~linearly).
    env = os.environ.get("PPT_MINI_GBLK")
    if env and n_groups % int(env) == 0:
        return int(env) * m_size
    # 128-group tiles measured fastest at the flagship shape (v5e chain
    # probes, same session: fwd 3.22 -> 1.88 ms, stats 1.17 -> 0.90 ms
    # together with the transposed input — docs/PROFILE_r04.md); the
    # 4096-row cap keeps the stage intermediates inside the 16 MB
    # scoped-VMEM limit for larger m_size.
    for g_blk in (128, 64, 32, 16, 8):
        if n_groups % g_blk == 0 and g_blk * m_size <= 4096:
            return g_blk * m_size
    return m_size


def _wspecs(shapes):
    """Full-array VMEM specs for the (2-D) weight operands."""
    return [
        pl.BlockSpec(s, lambda b, t: (0, 0), memory_space=pltpu.VMEM)
        for s in shapes
    ]


@functools.partial(
    jax.jit, static_argnames=("m_size", "dtype", "interpret")
)
def _stats_pallas(
    groups2, fw1, fb1, w2, b2, wg, wl, bsplit, *, m_size, dtype,
    interpret=False,
) -> Tuple[jax.Array, jax.Array]:
    """groups2: [B, G*M, 3] f32 -> (sum_h, sumsq_h) each [512] f32.

    Kernel sweep collects (Σ x2x2ᵀ, per-group Σx2, per-group max x2);
    the h-sums then come from closed forms — with a = x2@wl (per point)
    and b_g = max_g@wg + bs (per group, broadcast over M points):

      Σ h   = (Σ_g S_g)@wl + M·Σ_g b_g
      Σ h²  = diag(wlᵀ M2 wl) + 2·Σ_g (S_g@wl)⊙b_g + M·Σ_g b_g²

    which never materializes per-point h — the old sweep's dominant
    [N,256]x[256,512] matmul and h²-reduction drop out (measured: the
    stats pass was ~45% of train-mode MiniPointNet)."""
    B, GM, _ = groups2.shape
    G = GM // m_size
    gm_blk = _pick_gm_blk(G, m_size)
    g_blk = gm_blk // m_size
    tiles = GM // gm_blk
    cs = w2.shape[1]
    fb1, b2 = (t.reshape(1, -1) for t in (fb1, b2))
    wshapes = [fw1.shape, fb1.shape, w2.shape, b2.shape]
    xt = jnp.swapaxes(groups2, 1, 2)  # [B, 3, GM] — see _x2_of
    m2, sg, gmax = pl.pallas_call(
        functools.partial(_stats_kernel, m_size, dtype),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, 3, gm_blk), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            *_wspecs(wshapes),
        ],
        out_specs=[
            pl.BlockSpec((cs, cs), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_blk, cs), lambda b, t: (b * tiles + t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_blk, cs), lambda b, t: (b * tiles + t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cs, cs), jnp.float32),
            jax.ShapeDtypeStruct((B * tiles, g_blk, cs), jnp.float32),
            jax.ShapeDtypeStruct((B * tiles, g_blk, cs), jnp.float32),
        ],
        interpret=interpret,
    )(xt, fw1, fb1, w2, b2)

    n_groups = B * G
    sg = sg.reshape(n_groups, cs)
    gmax = gmax.reshape(n_groups, cs)
    wl32 = wl.astype(jnp.float32)
    wg32 = wg.astype(jnp.float32)
    m = jnp.float32(m_size)
    b_g = gmax @ wg32 + bsplit.astype(jnp.float32)  # [BG, hw]
    a_g = sg @ wl32  # [BG, hw] — Σ_{p∈g} a_p
    t1 = m2 @ wl32  # [Cs, hw]
    diag = jnp.sum(wl32 * t1, axis=0)  # Σ_p a_p² per channel
    sum_h = jnp.sum(a_g, axis=0) + m * jnp.sum(b_g, axis=0)
    sumsq_h = (
        diag
        + 2.0 * jnp.sum(a_g * b_g, axis=0)
        + m * jnp.sum(b_g * b_g, axis=0)
    )
    return sum_h, sumsq_h


@functools.partial(
    jax.jit, static_argnames=("m_size", "dtype", "interpret")
)
def _forward_pallas(
    groups2, fw1, fb1, w2, b2, fwg, fwl, fbsplit, w3, b3, *, m_size, dtype,
    interpret=False,
) -> jax.Array:
    """groups2: [B, G*M, 3] f32 -> tokens [B, G, 256] in ``dtype``."""
    B, GM, _ = groups2.shape
    G = GM // m_size
    gm_blk = _pick_gm_blk(G, m_size)
    g_blk = gm_blk // m_size
    tiles = GM // gm_blk
    co = w3.shape[1]
    fb1, b2, fbsplit, b3 = (t.reshape(1, -1) for t in (fb1, b2, fbsplit, b3))
    wshapes = [fw1.shape, fb1.shape, w2.shape, b2.shape, fwg.shape,
               fwl.shape, fbsplit.shape, w3.shape, b3.shape]
    xt = jnp.swapaxes(groups2, 1, 2)  # [B, 3, GM] — see _x2_of
    out = pl.pallas_call(
        functools.partial(_forward_kernel, m_size, dtype),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, 3, gm_blk), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            *_wspecs(wshapes),
        ],
        out_specs=pl.BlockSpec(
            (1, g_blk, co), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, co), dtype),
        interpret=interpret,
    )(xt, fw1, fb1, w2, b2, fwg, fwl, fbsplit, w3, b3)
    return out


# ---------------------------------------------------------------------------
# custom-VJP entry points (backward = XLA twin)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def mini_stats(m_size, dtype, interpret, groups2, fw1, fb1, w2, b2, wg, wl,
               bsplit):
    """(sum_h, sumsq_h) of the pre-BN2 activations over all B*G*M rows."""
    return _stats_pallas(
        groups2, fw1, fb1, w2, b2, wg, wl, bsplit,
        m_size=m_size, dtype=dtype, interpret=interpret,
    )


def _mini_stats_fwd(m_size, dtype, interpret, *args):
    return mini_stats(m_size, dtype, interpret, *args), args


def _mini_stats_bwd(m_size, dtype, interpret, res, g):
    def twin(groups2, fw1, fb1, w2, b2, wg, wl, bsplit):
        flat = groups2.reshape(-1, 3)
        s, ss = _stats_twin(flat, m_size, fw1, fb1, w2, b2, wg, wl, bsplit,
                            dtype)
        return s, ss

    _, vjp = jax.vjp(twin, *res)
    return vjp(g)


mini_stats.defvjp(_mini_stats_fwd, _mini_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def mini_forward(m_size, dtype, interpret, groups2, fw1, fb1, w2, b2, fwg,
                 fwl, fbsplit, w3, b3):
    """Fused MiniPointNet tokens [B, G, 256] (BatchNorms pre-folded)."""
    return _forward_pallas(
        groups2, fw1, fb1, w2, b2, fwg, fwl, fbsplit, w3, b3,
        m_size=m_size, dtype=dtype, interpret=interpret,
    )


def _mini_forward_fwd(m_size, dtype, interpret, *args):
    return mini_forward(m_size, dtype, interpret, *args), args


def _mini_forward_bwd(m_size, dtype, interpret, res, g):
    def twin(groups2, fw1, fb1, w2, b2, fwg, fwl, fbsplit, w3, b3):
        B, GM, _ = groups2.shape
        out = _forward_twin(
            groups2.reshape(-1, 3), m_size, fw1, fb1, w2, b2, fwg, fwl,
            fbsplit, w3, b3, dtype,
        )
        return out.reshape(B, GM // m_size, -1)

    _, vjp = jax.vjp(twin, *res)
    return vjp(g)


mini_forward.defvjp(_mini_forward_fwd, _mini_forward_bwd)
