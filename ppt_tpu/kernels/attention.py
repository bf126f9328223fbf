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

import math
import jax
import jax.numpy as jnp


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
