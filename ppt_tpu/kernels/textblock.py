"""Fused CLIP text-tower residual block: one Pallas kernel per block.

**MEASURED NEGATIVE RESULT — default OFF, kept as evidence.** On-chip
(v5e, 2026-08-18) the fused path is exact (kernel_check
``text_block[40,77,512]`` max rel err 6.9e-03) but SLOWER: text-tower
forward 5.95 → 6.91 ms raw, full train step 24.2 → 35.9 ms raw with
``PPT_FUSED_TEXT=1``. The fusion premise was wrong for this tower: XLA
already flattens [40 classes, 77, 512] into [3080, 512]-tall matmuls
running at ~60% MFU (239.5 GFLOP in ~2.0 ms net), so there was no
latency-bound gap to close — while this kernel pays the 77 -> Lp=128
pad (+66% FLOPs), splits the work into 40 small-M grid instances, and
its recompute VJP re-runs the forward inside the backward. Same
lesson as the ball-query rank-matmul v2 (PROFILE_r02): fusion wins
where XLA round-trips HBM between small ops (the point-tower ViT at
[32, 513, 384], 190 MB/block), not where XLA already has one big
MXU-shaped matmul chain.

The kernel computes the WHOLE pre-norm residual block
(``ResidualAttentionBlock``, reference ``models/ULIP_models.py:35-56``)
per class in VMEM: LN1 (f32, eps 1e-5), fused-QKV projection (with
bias), causal multi-head attention (f32 softmax), output projection,
residual, LN2, QuickGELU MLP, residual — reading x once and writing x'
once.

Semantics match ``ppt_tpu.nn.text.TextBlock`` in the compute dtype:
LayerNorm statistics and affine in f32 cast back (``LayerNormF32``,
parity with the reference's fp16-safe LayerNorm,
``models/ULIP_models.py:21-27``), QuickGELU ``x * sigmoid(1.702 x)`` in
f32 (``:30-32``), the standard additive causal mask (``:224-230``) —
the mask is baked in, so the wrapper only engages for the causal path.

Like ``fused_vit_block``, the kernel block is Lp=round_up(L, 128) tall
over the L-tall arrays (Mosaic masks the edge block): key columns
``>= L`` are masked to -inf, V tail rows are zeroed, and every other
op is row-local, so undefined tail rows cannot contaminate valid rows
and their writes are dropped.

Backward: custom VJP recomputing through the XLA twin. The text tower
is a frozen partition in every PPT task (only the prompt tokens ahead
of it train), so the weight cotangents the twin produces are dead code
— XLA keeps only the input-gradient chain.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5  # LayerNormF32 / torch nn.LayerNorm default


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_f32(x32, scale, bias):
    """LayerNorm over the lane axis, f32 in/out (flax fast-variance)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    xn = (x32 - mu) * lax.rsqrt(var + LN_EPS)
    return xn * scale + bias


def _quick_gelu_f32(x32):
    """CLIP's sigmoid-approximated GELU (``ULIP_models.py:30-32``)."""
    return x32 * jax.nn.sigmoid(1.702 * x32)


def _text_kernel(
    l_valid: int, heads: int, d: int, dtype,
    x_ref,
    ln1s_ref, ln1b_ref,
    wqkv_ref, bqkv_ref,
    wout_ref, bout_ref,
    ln2s_ref, ln2b_ref,
    wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    o_ref,
):
    c = heads * d
    scale = 1.0 / math.sqrt(d)
    x0 = x_ref[0]  # [Lp, D]

    # --- attention sublayer -------------------------------------------
    xn = _ln_f32(
        x0.astype(jnp.float32), ln1s_ref[0], ln1b_ref[0]
    ).astype(dtype)
    qkv = (
        lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[0]
    ).astype(dtype)  # [Lp, 3C]
    outs = []
    for h in range(heads):
        q = qkv[:, h * d : (h + 1) * d]
        k = qkv[:, c + h * d : c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d : 2 * c + (h + 1) * d]
        row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < l_valid, v, 0)  # undefined tail rows -> 0
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Lp, Lp], VMEM-resident
        rowi = lax.broadcasted_iota(jnp.int32, s.shape, 0)
        lane = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # causal (lane <= row) AND key-valid (lane < L); valid rows only
        # ever attend to valid keys, so tail-row garbage stays row-local
        s = jnp.where((lane <= rowi) & (lane < l_valid), s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        acc = lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / denom).astype(dtype))  # [Lp, D_head]
    attn = jnp.concatenate(outs, axis=1)  # [Lp, C]
    y = (
        lax.dot_general(
            attn, wout_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[0]
    ).astype(dtype)
    x1 = x0 + y

    # --- QuickGELU MLP sublayer ---------------------------------------
    xn2 = _ln_f32(
        x1.astype(jnp.float32), ln2s_ref[0], ln2b_ref[0]
    ).astype(dtype)
    h1 = lax.dot_general(
        xn2, wfc_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[0]  # f32 [Lp, 4C]
    h1 = _quick_gelu_f32(h1).astype(dtype)
    y2 = (
        lax.dot_general(
            h1, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[0]
    ).astype(dtype)
    o_ref[0] = x1 + y2


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _text_pallas(
    x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
    wfc, bfc, wproj, bproj, *, heads: int, interpret: bool = False
):
    """x: [B, L, D]; weights pre-cast to the compute dtype by the
    caller; LN params and biases f32."""
    B, L, D = x.shape
    d = D // heads
    Lp = _round_up(L, 128)
    hid = wfc.shape[1]

    def rowspec(n_lanes):
        return pl.BlockSpec(
            (1, Lp, n_lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )

    def wspec(r, c_):
        return pl.BlockSpec((r, c_), lambda b: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_text_kernel, L, heads, d, x.dtype),
        grid=(B,),
        in_specs=[
            rowspec(D),                         # x
            wspec(1, D), wspec(1, D),           # ln1 scale/bias
            wspec(D, 3 * D), wspec(1, 3 * D),   # in_proj kernel/bias
            wspec(D, D), wspec(1, D),           # out_proj kernel/bias
            wspec(1, D), wspec(1, D),           # ln2 scale/bias
            wspec(D, hid), wspec(1, hid),       # c_fc
            wspec(hid, D), wspec(1, D),         # c_proj
        ],
        out_specs=rowspec(D),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(
        x,
        ln1s[None], ln1b[None], wqkv, bqkv[None], wout, bout[None],
        ln2s[None], ln2b[None], wfc, bfc[None], wproj, bproj[None],
    )


def _text_twin(
    x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
    wfc, bfc, wproj, bproj, *, heads: int
):
    """XLA twin of ``_text_kernel``'s math — golden for tests, VJP
    source. Shapes as in ``_text_pallas``."""
    B, L, D = x.shape
    d = D // heads
    dtype = x.dtype

    def mm(a, b):
        return lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xn = _ln_f32(x.astype(jnp.float32), ln1s, ln1b).astype(dtype)
    qkv = (mm(xn, wqkv) + bqkv).astype(dtype)  # [B, L, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def sh(t):
        return t.reshape(B, L, heads, d)

    s = jnp.einsum(
        "blhd,bmhd->bhlm", sh(q), sh(k),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(d))
    rowi = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lane = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    s = jnp.where((lane <= rowi)[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum(
        "bhlm,bmhd->blhd", p.astype(dtype), sh(v),
        preferred_element_type=jnp.float32,
    )
    attn = attn.astype(dtype).reshape(B, L, D)
    y = (mm(attn, wout) + bout).astype(dtype)
    x1 = x + y

    xn2 = _ln_f32(x1.astype(jnp.float32), ln2s, ln2b).astype(dtype)
    h1 = mm(xn2, wfc) + bfc  # f32 accum
    h1 = _quick_gelu_f32(h1.astype(jnp.float32)).astype(dtype)
    y2 = (mm(h1, wproj) + bproj).astype(dtype)
    return x1 + y2


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def fused_text_block(
    x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
    wfc, bfc, wproj, bproj, heads
):
    """Whole CLIP text block fused (Pallas forward, XLA recompute VJP).

    The text tower is a frozen partition in every PPT task — only the
    input gradient (toward the learnable prompt tokens) survives; the
    twin's weight cotangents are XLA dead code.
    """
    from ppt_tpu.kernels.attention import _is_tpu

    return _text_pallas(
        x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
        wfc, bfc, wproj, bproj, heads=heads, interpret=not _is_tpu(),
    )


def _ftb_fwd(x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
             wfc, bfc, wproj, bproj, heads):
    args = (x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
            wfc, bfc, wproj, bproj)
    return fused_text_block(*args, heads), args


def _ftb_bwd(heads, res, g):
    _, vjp = jax.vjp(lambda *a: _text_twin(*a, heads=heads), *res)
    return vjp(g)


fused_text_block.defvjp(_ftb_fwd, _ftb_bwd)
