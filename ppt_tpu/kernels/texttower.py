"""Whole-tower fused CLIP text encoder: 12 blocks + EOT pooling + final
LayerNorm + projection in ONE Pallas kernel.

Round-4 profiling: the XLA text tower costs ~2.0 ms forward + ~4.2 ms
backward per train step against a ~1.6 ms combined MXU floor — it is
latency-bound (12 blocks x ~6 small sequential matmuls on [C*L, 512]
rows, each a few µs of MXU work plus launch/pipeline gaps, interleaved
with f32-LayerNorm VPU chains). The round-3 per-BLOCK fused kernel lost
(40 small-M grid instances + the 77->128 pad, ``kernels/textblock.py``);
this kernel instead grids over CHUNKS OF 8 CLASSES and runs the ENTIRE
tower per instance: the [8L, D] activations never leave VMEM between
blocks, all 12 blocks' weights are VMEM-resident (~75 MB bf16), and the
per-class causal attention of the whole chunk is computed as one
[8L, 8L] matmul under an additive block-diagonal+causal mask (8x FLOP
waste on a tiny term — worth it to stay on the MXU with zero serial
class loop).

Semantics match ``ppt_tpu.nn.text.TextTransformer.__call__`` exactly
(reference ``models/ULIP_models.py:154-230``): pre-norm blocks with
fp32 LayerNorm (eps 1e-5 — the fp16-era CLIP parity quirk), fused-QKV
attention with biases, causal mask, QuickGELU MLP, fp32 ln_final,
EOT-position pooling (as a one-hot f32 matmul), fp32 text_projection.
The [C, E] output is unnormalized — the caller normalizes.

Backward: custom VJP recomputing through the XLA twin (stage A; the
tower is frozen — only the input cotangent d_x0 is ever consumed, by
the prompt-splice upstream).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5  # LayerNormF32 default (CLIP); NOT the ViT trunk's 1e-6
CHUNK = 8  # classes per grid instance


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _ln_f32(x32, scale, bias, eps=LN_EPS):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    xn = (x32 - mu) * lax.rsqrt(var + eps)
    return xn * scale + bias


def _quick_gelu_f32(x32):
    return x32 * jax.nn.sigmoid(1.702 * x32)


def _tower_kernel(
    heads: int, depth: int, dtype,
    x_ref, mask_ref, eot_ref,
    ln1s_ref, ln1b_ref, win_ref, bin_ref, wout_ref, bout_ref,
    ln2s_ref, ln2b_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    lnfs_ref, lnfb_ref, tproj_ref,
    o_ref, xs_ref=None,
):
    """One chunk of 8 classes through the whole tower.

    x_ref [8, Lp, D]; mask_ref [8Lp, 8Lp] f32 additive; eot_ref
    [1, 8, 8Lp] f32 one-hot pooling rows; stacked per-block weights
    lead with the depth axis; o_ref [1, 8, E] f32.

    With the optional second output ref (the residual-capture variant
    behind ``_tower_pallas_res``) each block's OUTPUT activations are
    also written (``xs_ref [1, depth, Rc, D]``) so the hand-written
    backward kernel can recompute per-block internals without replaying
    the whole tower in XLA. ONE loop body serves both variants so their
    bf16 numerics cannot drift (softmax normalizes in f32 THEN casts,
    matching the XLA twin and the backward's recompute)."""
    _, lp, dch = x_ref.shape
    rc = CHUNK * lp
    d = dch // heads
    scale = 1.0 / math.sqrt(d)
    x = x_ref[...].reshape(rc, dch)

    for i in range(depth):
        ln1s = ln1s_ref[i : i + 1]
        ln1b = ln1b_ref[i : i + 1]
        y1 = _ln_f32(x.astype(jnp.float32), ln1s, ln1b).astype(dtype)
        qkv = lax.dot_general(
            y1, win_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bin_ref[i : i + 1].astype(dtype)  # [Rc, 3D]
        outs = []
        for h in range(heads):
            q = qkv[:, h * d : (h + 1) * d]
            k = qkv[:, dch + h * d : dch + (h + 1) * d]
            v = qkv[:, 2 * dch + h * d : 2 * dch + (h + 1) * d]
            s = lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]  # [Rc, Rc] f32
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            pn = p / jnp.sum(p, axis=1, keepdims=True)
            acc = lax.dot_general(
                pn.astype(dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(acc.astype(dtype))
        attn = jnp.concatenate(outs, axis=1)  # [Rc, D]
        a = lax.dot_general(
            attn, wout_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bout_ref[i : i + 1].astype(dtype)
        x = x + a

        y2 = _ln_f32(
            x.astype(jnp.float32), ln2s_ref[i : i + 1], ln2b_ref[i : i + 1]
        ).astype(dtype)
        h1 = lax.dot_general(
            y2, wfc_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[i : i + 1]  # f32 [Rc, 4D]
        h1 = _quick_gelu_f32(h1).astype(dtype)
        mo = lax.dot_general(
            h1, wproj_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bproj_ref[i : i + 1].astype(dtype)
        x = x + mo
        if xs_ref is not None:
            xs_ref[0, i] = x

    # epilogue: EOT pooling (one-hot matmul), fp32 ln_final, projection.
    # LayerNorm is row-local, so pool-then-LN == LN-then-pool (saves
    # normalizing Rc rows to use 8).
    pooled = lax.dot_general(
        eot_ref[0], x.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [8, D] f32
    xn = _ln_f32(pooled, lnfs_ref[...], lnfb_ref[...])
    o_ref[0] = lax.dot_general(
        xn, tproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_vjp(dy32, xhat, r, gamma):
    """LayerNorm input-cotangent (population-variance formulation):
    d_z = r * (t − mean(t) − x̂ · mean(t·x̂)),  t = dy·γ."""
    t = dy32 * gamma
    mt = jnp.mean(t, axis=-1, keepdims=True)
    mtx = jnp.mean(t * xhat, axis=-1, keepdims=True)
    return r * (t - mt - xhat * mtx)


def _tower_bwd_kernel(
    heads: int, depth: int, dtype,
    g_ref, x0_ref, xs_ref, mask_ref, eot_ref,
    ln1s_ref, ln1b_ref, win_ref, bin_ref, wout_ref, bout_ref,
    ln2s_ref, ln2b_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
    lnfs_ref, lnfb_ref, tproj_ref,
    dx_ref,
):
    """Hand-written INPUT-cotangent backward for the frozen tower.

    g_ref [1, CHUNK, E] f32 output cotangent; x0_ref [CHUNK, Lp, D] the
    tower input; xs_ref [1, depth, Rc, D] per-block outputs saved by the
    residual forward. Emits d_x0 [CHUNK, Lp, D] only — every weight is
    frozen (grads reach the learnable prompt ctx through the splice,
    upstream), so no weight cotangents exist anywhere.

    Per block: recompute LN stats / attention probs / gelu pre-acts from
    the saved block input, then the standard vjps — softmax
    ``d_s = P ⊙ (d_P − rowsum(d_P⊙P))``, QuickGELU'
    ``σ(az)(1 + az(1−σ(az)))``, LayerNorm ``_ln_vjp`` — with bf16 matmul
    cotangents (matching XLA autodiff of the bf16 forward) and f32
    elementwise chains."""
    _, lp, dch = x0_ref.shape
    rc = CHUNK * lp
    d = dch // heads
    scale = 1.0 / math.sqrt(d)

    # --- epilogue backward -------------------------------------------
    x_fin = xs_ref[0, depth - 1]  # [Rc, D] dtype
    d_xn = lax.dot_general(
        g_ref[0], tproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CHUNK, D] f32
    pooled = lax.dot_general(
        eot_ref[0], x_fin.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mu = jnp.mean(pooled, axis=-1, keepdims=True)
    var = jnp.mean(pooled * pooled, axis=-1, keepdims=True) - mu * mu
    r = lax.rsqrt(var + LN_EPS)
    d_pooled = _ln_vjp(d_xn, (pooled - mu) * r, r, lnfs_ref[...])
    d2 = lax.dot_general(
        eot_ref[0], d_pooled, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Rc, D] f32 — eotᵀ @ d_pooled

    # --- blocks, reverse ----------------------------------------------
    for i in range(depth - 1, -1, -1):
        x_in = (x0_ref[...].reshape(rc, dch) if i == 0
                else xs_ref[0, i - 1])

        # recompute forward internals from the saved block input
        x32 = x_in.astype(jnp.float32)
        mu1 = jnp.mean(x32, axis=-1, keepdims=True)
        var1 = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu1 * mu1
        r1 = lax.rsqrt(var1 + LN_EPS)
        xh1 = (x32 - mu1) * r1
        g1 = ln1s_ref[i : i + 1]
        y1 = (xh1 * g1 + ln1b_ref[i : i + 1]).astype(dtype)
        qkv = lax.dot_general(
            y1, win_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bin_ref[i : i + 1].astype(dtype)
        probs = []
        outs = []
        for h in range(heads):
            q = qkv[:, h * d : (h + 1) * d]
            k = qkv[:, dch + h * d : dch + (h + 1) * d]
            v = qkv[:, 2 * dch + h * d : 2 * dch + (h + 1) * d]
            s = lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask_ref[...]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            pn = p / jnp.sum(p, axis=1, keepdims=True)  # post-softmax P
            probs.append(pn)
            acc = lax.dot_general(
                pn.astype(dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(acc.astype(dtype))
        attn = jnp.concatenate(outs, axis=1)
        a = lax.dot_general(
            attn, wout_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype) + bout_ref[i : i + 1].astype(dtype)
        x1 = x_in + a
        x1_32 = x1.astype(jnp.float32)
        mu2 = jnp.mean(x1_32, axis=-1, keepdims=True)
        var2 = jnp.mean(x1_32 * x1_32, axis=-1, keepdims=True) - mu2 * mu2
        r2 = lax.rsqrt(var2 + LN_EPS)
        xh2 = (x1_32 - mu2) * r2
        g2w = ln2s_ref[i : i + 1]
        y2 = (xh2 * g2w + ln2b_ref[i : i + 1]).astype(dtype)
        h1f = lax.dot_general(
            y2, wfc_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[i : i + 1]  # f32 pre-activation
        sig = jax.nn.sigmoid(1.702 * h1f)

        # MLP backward
        d_h1 = lax.dot_general(
            d2.astype(dtype), wproj_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Rc, 4D] f32
        d_h1f = d_h1 * (sig + 1.702 * h1f * sig * (1.0 - sig))
        d_y2 = lax.dot_general(
            d_h1f.astype(dtype), wfc_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_x1 = d2 + _ln_vjp(d_y2, xh2, r2, g2w)

        # attention backward
        d_attn = lax.dot_general(
            d_x1.astype(dtype), wout_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Rc, D] f32
        d_parts_q = []
        d_parts_k = []
        d_parts_v = []
        for h in range(heads):
            q = qkv[:, h * d : (h + 1) * d]
            k = qkv[:, dch + h * d : dch + (h + 1) * d]
            v = qkv[:, 2 * dch + h * d : 2 * dch + (h + 1) * d]
            pn = probs[h]
            d_o = d_attn[:, h * d : (h + 1) * d].astype(dtype)
            d_p = lax.dot_general(
                d_o, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Rc, Rc] f32
            rowdot = jnp.sum(d_p * pn, axis=1, keepdims=True)
            d_s = (pn * (d_p - rowdot)).astype(dtype)
            d_parts_q.append(
                lax.dot_general(
                    d_s, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
            d_parts_k.append(
                lax.dot_general(
                    d_s, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
            d_parts_v.append(
                lax.dot_general(
                    pn.astype(dtype), d_o, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        d_qkv = jnp.concatenate(
            d_parts_q + d_parts_k + d_parts_v, axis=1
        )  # [Rc, 3D] f32
        d_y1 = lax.dot_general(
            d_qkv.astype(dtype), win_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = d_x1 + _ln_vjp(d_y1, xh1, r1, g1)

    dx_ref[...] = d2.astype(dtype).reshape(CHUNK, lp, dch)


@functools.partial(
    jax.jit, static_argnames=("heads", "interpret")
)
def _tower_pallas(
    x0, mask8, eot_chunks,
    ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc, wproj, bproj,
    lnfs, lnfb, tproj,
    *, heads: int, interpret: bool = False,
):
    """x0 [Cp, Lp, D] (pos already added, classes padded to CHUNK, L
    padded to lane alignment); mask8 [CHUNK*Lp]² f32; eot_chunks
    [Cp/CHUNK, CHUNK, CHUNK*Lp] f32. Stacked weights lead with depth.
    Returns [Cp, E] f32 unnormalized embeddings."""
    cp, lp, dch = x0.shape
    depth = win.shape[0]
    rc = CHUNK * lp
    e = tproj.shape[1]

    def wstack(t):  # [depth, r, c] resident whole
        return pl.BlockSpec(t.shape, lambda c: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_tower_kernel, heads, depth, x0.dtype),
        grid=(cp // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, lp, dch), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, rc), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, rc), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            wstack(ln1s), wstack(ln1b), wstack(win), wstack(bin_),
            wstack(wout), wstack(bout), wstack(ln2s), wstack(ln2b),
            wstack(wfc), wstack(bfc), wstack(wproj), wstack(bproj),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dch, e), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, e), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp // CHUNK, CHUNK, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x0, mask8, eot_chunks,
        ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc,
        wproj, bproj,
        lnfs[None], lnfb[None], tproj,
    )
    return out.reshape(cp, e)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _tower_pallas_res(
    x0, mask8, eot_chunks,
    ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc, wproj, bproj,
    lnfs, lnfb, tproj,
    *, heads: int, interpret: bool = False,
):
    """Residual-saving forward: (out [Cp, E] f32, xs [n_chunks, depth,
    Rc, D] block outputs)."""
    cp, lp, dch = x0.shape
    depth = win.shape[0]
    rc = CHUNK * lp
    e = tproj.shape[1]

    def wstack(t):
        return pl.BlockSpec(t.shape, lambda c: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    out, xs = pl.pallas_call(
        functools.partial(_tower_kernel, heads, depth, x0.dtype),
        grid=(cp // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, lp, dch), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, rc), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, rc), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            wstack(ln1s), wstack(ln1b), wstack(win), wstack(bin_),
            wstack(wout), wstack(bout), wstack(ln2s), wstack(ln2b),
            wstack(wfc), wstack(bfc), wstack(wproj), wstack(bproj),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dch, e), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, e), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth, rc, dch), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp // CHUNK, CHUNK, e), jnp.float32),
            jax.ShapeDtypeStruct((cp // CHUNK, depth, rc, dch), x0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x0, mask8, eot_chunks,
        ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc,
        wproj, bproj,
        lnfs[None], lnfb[None], tproj,
    )
    return out.reshape(cp, e), xs


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _tower_bwd_pallas(
    g, x0, xs, mask8, eot_chunks,
    ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc, wproj, bproj,
    lnfs, lnfb, tproj,
    *, heads: int, interpret: bool = False,
):
    """g [Cp, E] f32 output cotangent -> d_x0 [Cp, Lp, D] (x0 dtype)."""
    cp, lp, dch = x0.shape
    depth = win.shape[0]
    rc = CHUNK * lp
    e = tproj.shape[1]

    def wstack(t):
        return pl.BlockSpec(t.shape, lambda c: (0,) * t.ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_tower_bwd_kernel, heads, depth, x0.dtype),
        grid=(cp // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK, e), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, lp, dch), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth, rc, dch), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rc, rc), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, rc), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            wstack(ln1s), wstack(ln1b), wstack(win), wstack(bin_),
            wstack(wout), wstack(bout), wstack(ln2s), wstack(ln2b),
            wstack(wfc), wstack(bfc), wstack(wproj), wstack(bproj),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dch), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dch, e), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, lp, dch), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, lp, dch), x0.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        g.reshape(cp // CHUNK, CHUNK, e), x0, xs, mask8, eot_chunks,
        ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc,
        wproj, bproj,
        lnfs[None], lnfb[None], tproj,
    )


def _tower_twin(
    x0, mask_cl, eot_onehot,
    ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc, wproj, bproj,
    lnfs, lnfb, tproj, *, heads: int,
):
    """XLA twin over the UNPADDED [C, L, D] input — golden for tests and
    the recompute-VJP source. ``mask_cl`` [L, L] causal additive;
    ``eot_onehot`` [C, L] f32."""
    C, L, D = x0.shape
    depth = win.shape[0]
    d = D // heads
    dtype = x0.dtype
    x = x0

    def mm(a, b):
        return lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for i in range(depth):
        y1 = _ln_f32(x.astype(jnp.float32), ln1s[i], ln1b[i]).astype(dtype)
        qkv = mm(y1, win[i]).astype(dtype) + bin_[i].astype(dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def sh(t):
            return t.reshape(C, L, heads, d)

        s = jnp.einsum(
            "blhd,bmhd->bhlm", sh(q), sh(k),
            preferred_element_type=jnp.float32,
        ) * (1.0 / math.sqrt(d)) + mask_cl[None, None]
        p = jax.nn.softmax(s, axis=-1)
        acc = jnp.einsum(
            "bhlm,bmhd->blhd", p.astype(dtype), sh(v),
            preferred_element_type=jnp.float32,
        ).astype(dtype).reshape(C, L, D)
        x = x + (mm(acc, wout[i]).astype(dtype) + bout[i].astype(dtype))

        y2 = _ln_f32(x.astype(jnp.float32), ln2s[i], ln2b[i]).astype(dtype)
        h1 = _quick_gelu_f32(mm(y2, wfc[i]) + bfc[i]).astype(dtype)
        x = x + (mm(h1, wproj[i]).astype(dtype) + bproj[i].astype(dtype))

    pooled = jnp.einsum(
        "cl,cld->cd", eot_onehot, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    xn = _ln_f32(pooled, lnfs, lnfb)
    return mm(xn, tproj)


def _build_mask8(lp: int) -> np.ndarray:
    """Additive block-diagonal causal mask for one 8-class chunk."""
    neg = np.float32(-np.inf)
    m = np.full((CHUNK * lp, CHUNK * lp), neg, np.float32)
    causal = np.zeros((lp, lp), np.float32)
    causal[np.triu_indices(lp, k=1)] = neg
    for j in range(CHUNK):
        m[j * lp : (j + 1) * lp, j * lp : (j + 1) * lp] = causal
    return m


@functools.partial(jax.custom_vjp, nondiff_argnums=(17,))
def fused_text_tower(
    x0, eot_onehot,
    ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc, wproj, bproj,
    lnfs, lnfb, tproj, heads,
):
    """Whole text tower in one Pallas call (see module docstring).

    x0: [C, L, D] prompt embeddings with the positional embedding ALREADY
    added; eot_onehot: [C, L] f32 one-hot pooling rows. Returns [C, E]
    f32 unnormalized embeddings."""
    C = x0.shape[0]
    x, mask8, eot_chunks, _, _ = _pad_and_chunk(x0, eot_onehot)

    out = _tower_pallas(
        x, mask8, eot_chunks,
        ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc,
        wproj, bproj, lnfs, lnfb, tproj,
        heads=heads, interpret=not _is_tpu(),
    )
    return out[:C]


def _pad_and_chunk(x0, eot_onehot):
    """Shared padding/layout prep for the fwd/bwd kernels. Returns
    (x padded [Cp, Lp, D], mask8, eot_chunks, C, L)."""
    C, L, _ = x0.shape
    # lane alignment: CHUNK*lp % 128 == 0 <=> lp % 16 == 0 (CHUNK=8)
    lp = _round_up(L, 16)
    cp = _round_up(C, CHUNK)
    x = x0
    eot = eot_onehot
    if (cp, lp) != (C, L):
        x = jnp.pad(x, ((0, cp - C), (0, lp - L), (0, 0)))
        eot = jnp.pad(eot, ((0, cp - C), (0, lp - L)))
    eye = jnp.eye(CHUNK, dtype=jnp.float32)
    eot_chunks = (
        eye[None, :, :, None] * eot.reshape(cp // CHUNK, CHUNK, 1, lp)
    ).reshape(cp // CHUNK, CHUNK, CHUNK * lp)
    return x, jnp.asarray(_build_mask8(lp)), eot_chunks, C, L


def _ftt_fwd(x0, eot_onehot, ln1s, ln1b, win, bin_, wout, bout, ln2s,
             ln2b, wfc, bfc, wproj, bproj, lnfs, lnfb, tproj, heads):
    import os

    weights = (ln1s, ln1b, win, bin_, wout, bout, ln2s, ln2b, wfc, bfc,
               wproj, bproj, lnfs, lnfb, tproj)
    if os.environ.get("PPT_TEXT_TOWER_BWD", "fused") == "xla":
        # A/B hatch: plain forward + twin-recompute VJP for EVERY
        # cotangent (the fused branch below hand-writes d_x0 and takes
        # only the weight cotangents from the twin)
        return (
            fused_text_tower(x0, eot_onehot, *weights, heads),
            (None, x0, eot_onehot, weights),
        )
    xp, mask8, eot_chunks, C, _ = _pad_and_chunk(x0, eot_onehot)
    out, xs = _tower_pallas_res(
        xp, mask8, eot_chunks, *weights,
        heads=heads, interpret=not _is_tpu(),
    )
    return out[:C], (xs, x0, eot_onehot, weights)


def _ftt_bwd(heads, res, g):
    xs, x0, eot_onehot, weights = res

    L = x0.shape[1]
    neg = np.float32(-np.inf)
    causal = np.zeros((L, L), np.float32)
    causal[np.triu_indices(L, k=1)] = neg

    if xs is None:  # PPT_TEXT_TOWER_BWD=xla

        def f(x0_, eot_, *ws):
            return _tower_twin(
                x0_, jnp.asarray(causal), eot_, *ws, heads=heads
            )

        _, vjp = jax.vjp(f, x0, eot_onehot, *weights)
        return vjp(g)

    xp, mask8, eot_chunks, C, _ = _pad_and_chunk(x0, eot_onehot)
    gp = g.astype(jnp.float32)
    if xp.shape[0] != C:
        gp = jnp.pad(gp, ((0, xp.shape[0] - C), (0, 0)))
    dx = _tower_bwd_pallas(
        gp, xp, xs, mask8, eot_chunks, *weights,
        heads=heads, interpret=not _is_tpu(),
    )[:C, :L]
    # The hand-written kernel emits only d_x0 (the prompt-splice
    # cotangent). WEIGHT cotangents come from the XLA twin's vjp: every
    # product task freezes the tower (models/ulip.trainable_mask), so
    # these outputs are unused and XLA dead-code-eliminates the whole
    # twin — zero steady-state cost — while a hypothetical
    # unfrozen-tower config gets TRUE weight grads instead of silent
    # zeros (the two A/B paths must agree in gradient semantics). The
    # eot one-hot is argmax-derived (non-differentiable, like the XLA
    # path's take_along_axis index).
    def fw(*ws):
        return _tower_twin(
            x0, jnp.asarray(causal), eot_onehot, *ws, heads=heads
        )

    _, wvjp = jax.vjp(fw, *weights)
    d_ws = wvjp(g.astype(jnp.float32))
    return (dx, jnp.zeros_like(eot_onehot)) + tuple(d_ws)


fused_text_tower.defvjp(_ftt_fwd, _ftt_bwd)
