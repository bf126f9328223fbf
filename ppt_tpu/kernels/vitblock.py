"""Fully-fused PointBERT ViT block: one Pallas kernel per transformer
block.

Round-3 profiling (docs/PROFILE_r03.md) left the 12 ViT blocks at
9.8 ms of the 25.3 ms step with only ~3.5 ms of that being MXU time —
the rest is HBM round-trips between the block's ops: the per-block
pos-add, two LayerNorm outputs, the qkv tensor, the attention output,
the proj output, the 4x-wide MLP hidden, and two residual writes
(~190 MB/block at [32, 513, 384] bf16). This kernel computes the WHOLE
block — x+pos, LN1, QKV projection, whole-row attention, output
projection, droppath-scaled residual, LN2, MLP (gelu), second residual
— per batch element in VMEM, reading x/pos once and writing x' once
(~25 MB/block).

Semantics match ``ppt_tpu.nn.pointbert.VitBlock`` (reference ``Block``,
``models/pointbert/point_encoder.py:61-79``) in bf16 compute:
LayerNorm statistics in f32 (flax promotes), matmuls with f32
accumulation cast back to bf16, softmax in f32 (the fused_mha
upgrade), tanh-approximated GELU (``nn.gelu`` default), DropPath as a
per-sample branch scale in {0, 1/keep} supplied by the wrapper.

Like ``fused_mha``'s pad-free mode, the kernel block is Lp-tall over
the L-tall arrays: Mosaic serves the out-of-bounds tail rows as
undefined values and drops out-of-bounds writes. KV tail columns are
masked to -inf; V tail rows are zeroed (0*NaN would poison the PV
matmul); everything else is row-local, so garbage tail rows cannot
contaminate valid rows.

Backward: custom VJP recomputing through the XLA twin — dead code for
the frozen flagship tower (prompt-only partition), exact for partial
tuning head types.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6  # nn.LayerNorm default in flax


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_f32(x32, scale, bias):
    """LayerNorm over the lane axis, f32 in/out (flax fast-variance)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    xn = (x32 - mu) * lax.rsqrt(var + LN_EPS)
    return xn * scale + bias


def _gelu_tanh(x32):
    """nn.gelu(approximate=True): 0.5x(1+tanh(sqrt(2/pi)(x+0.044715x^3)))."""
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 * x32 * x32)))


def _block_body(
    l_valid: int, heads: int, d: int, dtype,
    x0, dp1, dp2,
    ln1s, ln1b, wqkv, wproj, bproj,
    ln2s, ln2b, wfc1, bfc1, wfc2, bfc2,
):
    """The whole-block math on a VMEM-resident ``x0 = x + pos`` [Lp, C];
    weights/LN params are VALUES (already read from refs — single-block
    kernels read whole refs, the 12-block tower reads block-i slices of
    stacked refs); ``dp1``/``dp2`` droppath branch scales (scalars).
    Returns x2 (the block output) in the compute dtype."""
    c = heads * d
    scale = 1.0 / math.sqrt(d)

    # --- attention sublayer -------------------------------------------
    xn = _ln_f32(x0.astype(jnp.float32), ln1s, ln1b).astype(dtype)
    qkv = lax.dot_general(
        xn, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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
        lane = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(lane < l_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        acc = lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((acc / denom).astype(dtype))  # [Lp, D]
    attn = jnp.concatenate(outs, axis=1)  # [Lp, C]
    y = lax.dot_general(
        attn, wproj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + bproj.astype(dtype)
    x1 = x0 + y * dp1.astype(dtype)

    # --- MLP sublayer --------------------------------------------------
    xn2 = _ln_f32(x1.astype(jnp.float32), ln2s, ln2b).astype(dtype)
    h1 = lax.dot_general(
        xn2, wfc1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc1  # f32 [Lp, 4C]
    h1 = _gelu_tanh(h1).astype(dtype)
    y2 = lax.dot_general(
        h1, wfc2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + bfc2.astype(dtype)
    return x1 + y2 * dp2.astype(dtype)


def _block_kernel(
    l_valid: int, heads: int, d: int, dtype,
    x_ref, pos_ref, dp_ref,
    ln1s_ref, ln1b_ref, wqkv_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    o_ref,
):
    b = pl.program_id(0)  # dp lives whole in SMEM; index the batch row
    # x0 = x + pos in compute dtype (matches the XLA path's bf16 add)
    o_ref[0] = _block_body(
        l_valid, heads, d, dtype,
        x_ref[0] + pos_ref[0], dp_ref[b, 0], dp_ref[b, 1],
        ln1s_ref[0], ln1b_ref[0], wqkv_ref[...], wproj_ref[...],
        bproj_ref[0], ln2s_ref[0], ln2b_ref[0],
        wfc1_ref[...], bfc1_ref[0], wfc2_ref[...], bfc2_ref[0],
    )


def _readout_rows(l_valid, x2, lnfs, lnfb):
    """Final f32 LayerNorm + cls/max readout -> [8, C] f32 (row 0 =
    normalized cls token, row 1 = lanewise max over the normalized point
    tokens, rows 2..7 zero — 8 sublanes for Mosaic alignment)."""
    xn = _ln_f32(x2.astype(jnp.float32), lnfs, lnfb)
    row = lax.broadcasted_iota(jnp.int32, xn.shape, 0)
    tok = jnp.where((row >= 1) & (row < l_valid), xn, -jnp.inf)
    mx = jnp.max(tok, axis=0, keepdims=True)  # [1, C]
    pad = jnp.zeros((6, xn.shape[1]), jnp.float32)
    return jnp.concatenate([xn[0:1], mx, pad], axis=0)  # [8, C]


def _block_readout_kernel(
    l_valid: int, heads: int, d: int, dtype,
    x_ref, pos_ref, dp_ref,
    ln1s_ref, ln1b_ref, wqkv_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    lnfs_ref, lnfb_ref,
    o_ref,
):
    """The last block + the cls readout fused: the [B, L, C] token
    tensor and the separate f32 LN + max-pool pass never touch HBM
    (~38 MB/step saved at the flagship shape)."""
    b = pl.program_id(0)
    x2 = _block_body(
        l_valid, heads, d, dtype,
        x_ref[0] + pos_ref[0], dp_ref[b, 0], dp_ref[b, 1],
        ln1s_ref[0], ln1b_ref[0], wqkv_ref[...], wproj_ref[...],
        bproj_ref[0], ln2s_ref[0], ln2b_ref[0],
        wfc1_ref[...], bfc1_ref[0], wfc2_ref[...], bfc2_ref[0],
    )
    o_ref[0] = _readout_rows(l_valid, x2, lnfs_ref[0], lnfb_ref[0])


def _vit_tower_kernel(
    l_valid: int, heads: int, d: int, dtype, depth: int,
    x_ref, pos_ref, dp_ref,
    ln1s_ref, ln1b_ref, wqkv_ref,
    wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    lnfs_ref, lnfb_ref,
    o_ref,
):
    """ALL ``depth`` blocks + the cls readout per grid instance: x stays
    in VMEM across every block (the 11 inter-block HBM round trips of
    the per-block formulation — ~280 MB/step at the flagship shape —
    disappear) and the stacked weights (~43 MB bf16) are VMEM-resident
    across the whole batch. Per-block pos re-add preserved (the
    PointBERT quirk). dp_ref: [B, depth, 2] SMEM droppath scales."""
    b = pl.program_id(0)
    x = x_ref[0]
    pos = pos_ref[0]
    for i in range(depth):
        x = _block_body(
            l_valid, heads, d, dtype,
            x + pos, dp_ref[b, i, 0], dp_ref[b, i, 1],
            ln1s_ref[i], ln1b_ref[i], wqkv_ref[i], wproj_ref[i],
            bproj_ref[i], ln2s_ref[i], ln2b_ref[i],
            wfc1_ref[i], bfc1_ref[i], wfc2_ref[i], bfc2_ref[i],
        )
    o_ref[0] = _readout_rows(l_valid, x, lnfs_ref[0], lnfb_ref[0])


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _block_pallas(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, *, heads: int, interpret: bool = False
):
    """x/pos: [B, L, C]; dp: [B, 2] f32 branch scales; weights pre-cast
    to the compute dtype by the caller; LN params f32."""
    B, L, C = x.shape
    d = C // heads
    # The block's ROW (sublane) dim only needs 16-alignment (bf16; 8
    # for f32) — rounding to 128 was lane-dim thinking. At L=513 this
    # is Lp=528 instead of 640: ~17% fewer M-rows in every matmul of
    # the hot kernel (lane dims still tile to 128 internally either
    # way). Exactness is unchanged: the edge block is masked by Mosaic
    # and l_valid-masking handles the 15 tail rows like it did 127.
    Lp = _round_up(L, 16)
    hid = wfc1.shape[1]

    def rowspec(n_lanes):
        return pl.BlockSpec(
            (1, Lp, n_lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )

    def wspec(r, c_):
        return pl.BlockSpec((r, c_), lambda b: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_block_kernel, L, heads, d, x.dtype),
        grid=(B,),
        in_specs=[
            rowspec(C),  # x
            rowspec(C),  # pos
            # dp is [B, 2] scalars: whole-array in SMEM (a (1, 2) VMEM
            # block would violate Mosaic's 8-sublane divisibility rule —
            # caught by kernel_check on the real chip, not by interpret)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            wspec(1, C), wspec(1, C),          # ln1 scale/bias
            wspec(C, 3 * C),                   # wqkv
            wspec(C, C), wspec(1, C),          # wproj, bproj
            wspec(1, C), wspec(1, C),          # ln2 scale/bias
            wspec(C, hid), wspec(1, hid),      # fc1
            wspec(hid, C), wspec(1, C),        # fc2
        ],
        out_specs=rowspec(C),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        # The whole-block working set (~12 MB bf16, ~20 MB f32 at
        # [513, 384]x6h) exceeds the compiler's default 16 MB scoped-
        # vmem budget in f32; v5e has far more physical VMEM than the
        # default budget admits.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, pos, dp,
        ln1s[None], ln1b[None], wqkv, wproj, bproj[None],
        ln2s[None], ln2b[None], wfc1, bfc1[None], wfc2, bfc2[None],
    )
    return out


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _block_readout_pallas(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, *,
    heads: int, interpret: bool = False
):
    """Last block + fused cls readout. Returns [B, 8, C] f32: row 0 =
    final-LN'd cls token, row 1 = lanewise max over the LN'd point
    tokens (rows 2..7 zero). Caller concatenates rows 0 and 1."""
    B, L, C = x.shape
    d = C // heads
    Lp = _round_up(L, 16)
    hid = wfc1.shape[1]

    def rowspec(n_lanes):
        return pl.BlockSpec(
            (1, Lp, n_lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )

    def wspec(r, c_):
        return pl.BlockSpec((r, c_), lambda b: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_readout_kernel, L, heads, d, x.dtype),
        grid=(B,),
        in_specs=[
            rowspec(C), rowspec(C),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            wspec(1, C), wspec(1, C),
            wspec(C, 3 * C),
            wspec(C, C), wspec(1, C),
            wspec(1, C), wspec(1, C),
            wspec(C, hid), wspec(1, hid),
            wspec(hid, C), wspec(1, C),
            wspec(1, C), wspec(1, C),  # final LN scale/bias
        ],
        out_specs=pl.BlockSpec(
            (1, 8, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x, pos, dp,
        ln1s[None], ln1b[None], wqkv, wproj, bproj[None],
        ln2s[None], ln2b[None], wfc1, bfc1[None], wfc2, bfc2[None],
        lnfs[None], lnfb[None],
    )


def _block_twin(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, *, heads: int
):
    """XLA twin of ``_block_kernel``'s math — golden for tests, VJP
    source. Shapes as in ``_block_pallas``."""
    B, L, C = x.shape
    d = C // heads
    dtype = x.dtype
    x0 = x + pos

    def mm(a, b):  # f32-accumulated matmul over the last/first axes
        return lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xn = _ln_f32(x0.astype(jnp.float32), ln1s, ln1b).astype(dtype)
    qkv = mm(xn, wqkv).astype(dtype)  # [B, L, 3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def sh(t):
        return t.reshape(B, L, heads, d)

    s = jnp.einsum(
        "blhd,bmhd->bhlm", sh(q), sh(k),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(d))
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum(
        "bhlm,bmhd->blhd", p.astype(dtype), sh(v),
        preferred_element_type=jnp.float32,
    )
    attn = attn.astype(dtype).reshape(B, L, C)
    y = mm(attn, wproj).astype(dtype) + bproj.astype(dtype)
    x1 = x0 + y * dp[:, None, 0:1].astype(dtype)

    xn2 = _ln_f32(x1.astype(jnp.float32), ln2s, ln2b).astype(dtype)
    h1 = mm(xn2, wfc1) + bfc1  # f32 accum
    h1 = _gelu_tanh(h1.astype(jnp.float32)).astype(dtype)
    y2 = mm(h1, wfc2).astype(dtype) + bfc2.astype(dtype)
    return x1 + y2 * dp[:, None, 1:2].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14,))
def fused_vit_block(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, heads
):
    """Whole ViT block fused (Pallas forward, XLA recompute VJP).

    The flagship point tower is a frozen partition — no parameter
    gradient flows through it, so the backward is XLA dead code there;
    for partial-tuning head types the recompute VJP differentiates the
    twin (same math as the kernel).
    """
    from ppt_tpu.kernels.attention import _is_tpu

    return _block_pallas(
        x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
        wfc1, bfc1, wfc2, bfc2, heads=heads, interpret=not _is_tpu(),
    )


def _fvb_fwd(x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
             wfc1, bfc1, wfc2, bfc2, heads):
    args = (x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
            wfc1, bfc1, wfc2, bfc2)
    return fused_vit_block(*args, heads), args


def _fvb_bwd(heads, res, g):
    _, vjp = jax.vjp(lambda *a: _block_twin(*a, heads=heads), *res)
    return vjp(g)


fused_vit_block.defvjp(_fvb_fwd, _fvb_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _vit_tower_pallas(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, *,
    heads: int, interpret: bool = False
):
    """x/pos [B, L, C]; dp [B, depth, 2] f32; stacked weights lead with
    the depth axis. Returns the readout rows [B, 8, C] f32."""
    B, L, C = x.shape
    d = C // heads
    Lp = _round_up(L, 16)
    depth = wqkv.shape[0]
    hid = wfc1.shape[2]

    def rowspec(n_lanes):
        return pl.BlockSpec(
            (1, Lp, n_lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )

    def wstack(t):
        return pl.BlockSpec(
            t.shape, lambda b: (0,) * t.ndim, memory_space=pltpu.VMEM
        )

    args = (ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b, wfc1, bfc1,
            wfc2, bfc2)
    return pl.pallas_call(
        functools.partial(_vit_tower_kernel, L, heads, d, x.dtype, depth),
        grid=(B,),
        in_specs=[
            rowspec(C), rowspec(C),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *(wstack(t) for t in args),
            wspec_row(C), wspec_row(C),  # final LN scale/bias
        ],
        out_specs=pl.BlockSpec(
            (1, 8, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, pos, dp, *args, lnfs[None], lnfb[None])


def wspec_row(c_):
    return pl.BlockSpec((1, c_), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _vit_tower_twin(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, *, heads: int
):
    """XLA twin: depth x _block_twin + f32 LN readout, [B, 8, C] f32."""
    depth = wqkv.shape[0]
    for i in range(depth):
        x = _block_twin(
            x, pos, dp[:, i], ln1s[i], ln1b[i], wqkv[i], wproj[i],
            bproj[i], ln2s[i], ln2b[i], wfc1[i], bfc1[i], wfc2[i],
            bfc2[i], heads=heads,
        )
    xn = _ln_f32(x.astype(jnp.float32), lnfs, lnfb)
    B, _, C = xn.shape
    out = jnp.zeros((B, 8, C), jnp.float32)
    out = out.at[:, 0].set(xn[:, 0])
    return out.at[:, 1].set(jnp.max(xn[:, 1:], axis=1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(16,))
def fused_vit_tower(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, heads
):
    """Whole ViT trunk + cls readout in ONE Pallas call (Pallas forward,
    XLA recompute VJP — exact weight grads for partial-tuning head
    types; dead code for the frozen flagship tower)."""
    from ppt_tpu.kernels.attention import _is_tpu

    return _vit_tower_pallas(
        x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
        wfc1, bfc1, wfc2, bfc2, lnfs, lnfb,
        heads=heads, interpret=not _is_tpu(),
    )


def _fvt_fwd(x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
             wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, heads):
    args = (x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
            wfc1, bfc1, wfc2, bfc2, lnfs, lnfb)
    return fused_vit_tower(*args, heads), args


def _fvt_bwd(heads, res, g):
    _, vjp = jax.vjp(lambda *a: _vit_tower_twin(*a, heads=heads), *res)
    return vjp(g)


fused_vit_tower.defvjp(_fvt_fwd, _fvt_bwd)


def _readout_twin(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, *, heads: int
):
    """XLA twin of the fused block+readout — golden for tests, VJP
    source. Matches the unfused trunk tail exactly: f32 final LayerNorm,
    cls row + max over point tokens, packed as [B, 8, C] f32."""
    x2 = _block_twin(
        x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
        wfc1, bfc1, wfc2, bfc2, heads=heads,
    )
    xn = _ln_f32(x2.astype(jnp.float32), lnfs, lnfb)
    B, _, C = xn.shape
    out = jnp.zeros((B, 8, C), jnp.float32)
    out = out.at[:, 0].set(xn[:, 0])
    return out.at[:, 1].set(jnp.max(xn[:, 1:], axis=1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(16,))
def fused_vit_block_readout(
    x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
    wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, heads
):
    """Last ViT block + cls readout fused (Pallas forward, XLA recompute
    VJP): the [B, L, C] token tensor of the final block and the separate
    f32 LayerNorm + max-pool pass never touch HBM — the kernel emits the
    [B, 8, C] readout rows directly (row 0 = LN'd cls, row 1 = lanewise
    token max; reference readout ``point_encoder.py:251``)."""
    from ppt_tpu.kernels.attention import _is_tpu

    return _block_readout_pallas(
        x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
        wfc1, bfc1, wfc2, bfc2, lnfs, lnfb,
        heads=heads, interpret=not _is_tpu(),
    )


def _fvbr_fwd(x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
              wfc1, bfc1, wfc2, bfc2, lnfs, lnfb, heads):
    args = (x, pos, dp, ln1s, ln1b, wqkv, wproj, bproj, ln2s, ln2b,
            wfc1, bfc1, wfc2, bfc2, lnfs, lnfb)
    return fused_vit_block_readout(*args, heads), args


def _fvbr_bwd(heads, res, g):
    _, vjp = jax.vjp(lambda *a: _readout_twin(*a, heads=heads), *res)
    return vjp(g)


fused_vit_block_readout.defvjp(_fvbr_fwd, _fvbr_bwd)
