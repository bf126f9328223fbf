"""Flash attention wrapper for the point/text transformers.

The stock XLA attention materializes the ``[B, H, L, L]`` score tensor in
HBM (for PointBERT: 32x6x513x513 f32 ≈ 200 MB, several passes per layer)
— measured at ~0.93 ms of a 1.12 ms ViT block on v5e. This wrapper routes
to the Pallas TPU flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``), which keeps score
tiles in VMEM with online softmax.

Handles PPT's awkward shapes: sequence lengths that aren't multiples of
the kernel's block size (513 = 512 groups + cls token) are padded and the
padding masked out via segment ids. Falls back to
``jax.nn.dot_product_attention`` off-TPU (and under interpret-mode
tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Below this sequence length the XLA attention wins on v5e: with head
# dim 64 (half a lane register) and the pad-to-block waste, the flash
# kernel measured 1.15-6.2 ms vs XLA's 0.47 ms at L=513. The crossover
# is where the [B, H, L, L] scores stop fitting comfortably in HBM
# bandwidth budget.
FLASH_MIN_SEQ = 1024


# ---------------------------------------------------------------------------
# Bespoke whole-row fused attention for PPT's ViT shape
# ---------------------------------------------------------------------------
#
# The stock Pallas flash kernel loses to plain einsum at [32, 513, 6, 64]
# (docs/KERNELS.md: pad-to-512 waste at L=513, hd=64 half-register
# penalty, online-softmax correction traffic). But the einsum path still
# pays ~0.5 ms/block of HBM traffic for the [B, H, L, L] scores. At
# L<=1024 the ENTIRE per-(batch, head) score matrix fits in VMEM
# (576x576 f32 = 1.3 MB), so no online softmax is needed at all: one
# kernel instance computes QK^T, a full-row softmax, and PV with the
# scores never leaving VMEM. Softmax runs in f32 (an accuracy upgrade
# over the shipped bf16-scores einsum path), the probability matrix is
# cast to bf16 for the PV matmul, and the denominator division is
# deferred to the [L, D] output (L*D ops instead of L*L).


def _mha_kernel(
    l_valid: int, heads: int, d: int, scale: float, q_ref, k_ref, v_ref, o_ref
):
    """q/k/v/o_ref: [1, Lp, H*D] VMEM blocks for one batch element —
    heads ride the lane dim (a [1, Lp, 1, D] per-head block would have
    trailing block dims (1, D), which Mosaic's (8, 128) tiling rejects)
    and are processed by a static in-kernel loop with static column
    slices.

    The wrapper passes the UNPADDED [B, L, H*D] arrays with an
    Lp-tall block (Lp = L rounded up to 128): Mosaic serves the
    out-of-bounds rows as undefined garbage and drops out-of-bounds
    writes, so no HBM pad/slice round-trip exists at all. In-kernel:
    KV columns >= l_valid are masked to -inf before the softmax (a
    garbage K row only ever lands in those masked columns); V's
    garbage rows are zeroed because their probability weights are
    exactly 0 and IEEE 0*NaN would otherwise poison the PV matmul;
    garbage Q rows compute garbage output rows whose writes Mosaic
    drops (they cannot contaminate valid rows: attention mixes over
    the masked column axis only).
    """
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        row = lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < l_valid, v, 0)  # undefined tail rows -> 0
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Lp, Lp] — never leaves VMEM
        s = s * scale
        lane = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(lane < l_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        acc = lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Lp, D]
        o_ref[0, :, sl] = (acc / denom).astype(o_ref.dtype)


def _pad_free() -> bool:
    """Pad-free edge-block formulation gate — DEFAULT ON.

    kernel_check passed both formulations on the real chip
    (docs/KERNEL_CHECK_tpu_v5e.log: fused_mha[32,513,6,64].pad_free max
    abs err 2.44e-04 vs the f32-softmax twin), and bench with the
    round-3 kernels on measured 1568.7 vs 1447.6 clouds/sec with them
    off. ``PPT_MHA_PADFREE=0`` restores the HBM-padded formulation."""
    import os

    return os.environ.get("PPT_MHA_PADFREE", "1") != "0"


@functools.partial(jax.jit, static_argnames=("interpret", "pad_free"))
def _mha_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    interpret: bool = False, pad_free: bool | None = None
) -> jax.Array:
    """[B, L, H, D] attention with whole-row VMEM-resident scores.

    Pad-free mode: the kernel block is Lp tall over the L-tall arrays
    (Mosaic masks the edge block), so the 3 input pads + output slice
    the padded formulation pays per call (~28 MB x 4 x 12 blocks
    ~= 1.3 GB HBM/step at the PPT ViT shape) never happen. Padded mode
    materializes zero-padded copies in HBM. Lp is SUBLANE-aligned (16):
    the row dim doesn't need the 128 lane-dim rule, and 528-vs-640 over
    L=513 drops ~17% of every matmul's M-rows (same finding as
    ``fused_vit_block``; measured there at +7.9% step throughput).
    """
    B, L, H, D = q.shape
    Lp = _round_up(L, 16)
    if pad_free is None:
        pad_free = _pad_free()
    if pad_free or Lp == L:
        qp, kp, vp = (
            t.reshape(B, L, H * D) for t in (q, k, v)
        )  # free reshape: (H, D) are the contiguous trailing dims
        l_in = L
    else:
        pad = ((0, 0), (0, Lp - L), (0, 0), (0, 0))
        qp, kp, vp = (
            jnp.pad(t, pad).reshape(B, Lp, H * D) for t in (q, k, v)
        )
        l_in = Lp
    spec = pl.BlockSpec(
        (1, Lp, H * D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_mha_kernel, L, H, D, 1.0 / math.sqrt(D)),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, l_in, H * D), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, l_in, H, D)[:, :L]


def _mha_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """XLA twin of ``_mha_kernel``'s math (f32 scores/softmax, bf16 PV
    when inputs are bf16) — the golden for tests and the VJP source."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


@jax.custom_vjp
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Whole-row fused attention (Pallas forward, XLA recompute VJP).

    The PPT flagship's point tower is a frozen partition — no parameter
    gradient ever flows through its attention, so the backward is XLA
    dead code there; for partial-tuning head types the recompute VJP is
    exact (same f32-softmax math as the kernel's twin).
    """
    return _mha_pallas(q, k, v)


def _fused_mha_fwd(q, k, v):
    return _mha_pallas(q, k, v), (q, k, v)


def _fused_mha_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_mha_reference, q, k, v)
    return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


def chunked_mha(
    q: jax.Array,  # [B, L, H, Dh]
    k: jax.Array,
    v: jax.Array,
    chunk: int = 128,
) -> jax.Array:
    """Online-softmax attention over KV chunks in pure XLA.

    Flash-attention's traffic shape without a Mosaic kernel: the
    [B, H, L, L] score tensor never fully materializes — each unrolled
    chunk produces [B, H, L, chunk] scores that XLA can fuse, with the
    running (max, denom, accumulator) carried in registers/VMEM. A
    candidate replacement for the einsum path at PPT's L=513 where the
    real flash kernel measured slower (head dim 64, pad-to-512 waste).
    """
    B, L, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    Lp = _round_up(L, chunk)
    pad = Lp - L
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else k
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else v

    m = jnp.full((B, H, L), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, L), jnp.float32)
    acc = jnp.zeros((B, L, H, Dh), jnp.float32)
    for c in range(Lp // chunk):
        kc = kp[:, c * chunk : (c + 1) * chunk]
        vc = vp[:, c * chunk : (c + 1) * chunk]
        s = jnp.einsum("blhd,bchd->bhlc", q, kc).astype(jnp.float32) * scale
        if pad and c == Lp // chunk - 1:
            valid = jnp.arange(c * chunk, (c + 1) * chunk) < L
            s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
        m2 = jnp.maximum(m, s.max(-1))
        p = jnp.exp(s - m2[..., None])
        corr = jnp.exp(m - m2)
        l = l * corr + p.sum(-1)
        pv = jnp.einsum("bhlc,bchd->blhd", p.astype(v.dtype), vc)
        acc = acc * jnp.swapaxes(corr, 1, 2)[..., None] + pv
        m = m2
    out = acc / jnp.swapaxes(l, 1, 2)[..., None]
    return out.astype(q.dtype)


def flash_mha(
    q: jax.Array,  # [B, L, H, Dh]
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    force_xla: bool = False,
) -> jax.Array:
    """Multi-head attention: XLA for short sequences (PPT's 77/513), the
    Pallas flash kernel for long ones (large-npoints scaling regime).

    Inputs/outputs in ``[B, L, H, Dh]`` (the ``jax.nn`` convention).
    """
    B, L, H, Dh = q.shape
    if force_xla or L < FLASH_MIN_SEQ or not _is_tpu():
        return jax.nn.dot_product_attention(q, k, v, is_causal=causal)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    Lp = _round_up(L, 512)
    pad = Lp - L

    def to_bhld(t):
        t = jnp.swapaxes(t, 1, 2)  # [B, H, L, Dh]
        if pad:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return t

    qp, kp, vp = to_bhld(q), to_bhld(k), to_bhld(v)
    if pad:
        ids = (jnp.arange(Lp) >= L).astype(jnp.int32)  # 0 real, 1 padding
        seg = fa.SegmentIds(
            q=jnp.broadcast_to(ids, (B, Lp)),
            kv=jnp.broadcast_to(ids, (B, Lp)),
        )
    else:
        seg = None

    out = fa.flash_attention(
        qp, kp, vp,
        segment_ids=seg,
        causal=causal,
        sm_scale=1.0 / math.sqrt(Dh),
    )
    out = out[:, :, :L, :]
    return jnp.swapaxes(out, 1, 2)  # back to [B, L, H, Dh]
