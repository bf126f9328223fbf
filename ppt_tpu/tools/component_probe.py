"""Trusted per-component chain probes for the PPT-Base train step.

`step_profile`'s whole-step subtraction shows session-to-session compile
variance through the axon tunnel (two round-3 attributions — the
"3.5 ms readout/glue" and "6.2 ms text" blocks — turned out to be its
artifacts; docs/PROFILE_r04.md Findings 1/3). This tool measures each
component the trusted way instead: a K-iteration ``lax.scan`` chain over
the component alone, scalar value-fetch (CLAUDE.md timing-truth), net of
an empty-chain baseline measured in the same session.

    python -m ppt_tpu.tools.component_probe [--iters 16] \
        [--components grouping,mini_fwd,mini_stats,text_fwd,text_grad,vit12]

One TPU process at a time — do not run concurrently with bench. The ViT
block-variant ablations live in ``tools/vitblock_probe.py``.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _chain_time(fn, operand, iters: int, nil_ms: float) -> float:
    """Best-of-3 wall time of a K-iteration scan chain over ``fn``,
    net of the measured empty-chain baseline, in ms per iteration."""

    def run(x):
        def it(c, _):
            return fn(x, c), None

        c, _ = lax.scan(it, jnp.float32(0.0), None, length=iters)
        return c

    g = jax.jit(run)
    float(g(operand))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(operand))
        best = min(best, time.perf_counter() - t0)
    return (best * 1e3 - nil_ms) / iters


def _nil_ms(operand, iters: int) -> float:
    def run(x):
        def it(c, _):
            return c, None

        c, _ = lax.scan(it, jnp.float32(0.0), None, length=iters)
        return c + jnp.sum(x.astype(jnp.float32)) * 1e-30

    g = jax.jit(run)
    float(g(operand))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(operand))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def probe_grouping(iters: int, npoints: int = 1024) -> float:
    """fused_group at B32, ``--npoints`` x (512x32) — 1024 is the
    flagship, 8192 the reference-native config."""
    from ppt_tpu.kernels.group import fused_group

    xyz = jnp.asarray(
        np.random.RandomState(0).rand(32, npoints, 3).astype(np.float32)
    )
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        nb, ctr = fused_group(x + c * 1e-20, 512, 32)
        return jnp.sum(nb.astype(jnp.float32)) * 1e-9 + jnp.sum(
            ctr.astype(jnp.float32)
        ) * 1e-9

    return _chain_time(f, xyz, iters, nil)


def probe_fps(iters: int, npoints: int = 1024) -> float:
    """fps_batched alone at B32, ``--npoints`` points -> 512 centers."""
    from ppt_tpu.kernels.group import fps_batched

    xyz = jnp.asarray(
        np.random.RandomState(0).rand(32, npoints, 3).astype(np.float32)
    )
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx = fps_batched(x + c * 1e-20, 512)
        return jnp.sum(idx.astype(jnp.float32)) * 1e-9

    return _chain_time(f, xyz, iters, nil)


def probe_knn(
    iters: int, npoints: int = 1024, pair="auto", gather="fused"
) -> float:
    """knn_gather alone (k=32, 512 centers) at B32, ``--npoints`` — at
    the SHIPPED defaults (pair='auto' N-adaptive cadence, fused in-loop
    gather), so the canonical 'knn' row always times what production
    runs; variants below pin explicit configs for A/Bs."""
    from ppt_tpu.kernels.group import knn_gather

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(32, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(32, 512, 3).astype(np.float32))
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx, nb = knn_gather(32, x + c * 1e-20, ctr, pair=pair, gather=gather)
        return jnp.sum(nb.astype(jnp.float32)) * 1e-9 + jnp.sum(
            idx.astype(jnp.float32)
        ) * 1e-12

    return _chain_time(f, xyz, iters, nil)


def probe_knn_fusedgather(iters: int, npoints: int = 1024) -> float:
    """Paired cadence + in-loop gather pinned — the pre-r5 shipped
    config (A/B vs the N-adaptive 'knn' default and vs 'knn_stacked')."""
    return probe_knn(iters, npoints, pair=True, gather="fused")


def probe_knn_stacked(iters: int, npoints: int = 1024) -> float:
    """Post-loop batched one-hot gather, paired cadence — the r5
    alternative that measured SLOWER at both benched N (documented
    negative, docs/PROFILE_r05.md §3)."""
    return probe_knn(iters, npoints, pair=True, gather="stacked")


def probe_knn_stacked_quad(iters: int, npoints: int = 1024) -> float:
    """Stacked gather + 4 winners/write-back."""
    return probe_knn(iters, npoints, pair=4, gather="stacked")


def probe_knn_single(iters: int, npoints: int = 1024) -> float:
    """The round-3 single-winner extraction loop (A/B reference)."""
    return probe_knn(iters, npoints, pair=False, gather="fused")


def probe_knn_quad(iters: int, npoints: int = 1024) -> float:
    """Four winners per eviction write-back pinned (A/B vs paired: the
    write-back saving shrinks geometrically past g=2 at small N but
    wins at N>=4096 — what pair='auto' encodes)."""
    return probe_knn(iters, npoints, pair=4, gather="fused")


def probe_knn_nogather(iters: int, npoints: int = 1024) -> float:
    """Selection loop only — the one-hot MXU coordinate gather ablated.
    Difference to ``knn`` = what the per-winner dot_general costs after
    overlap with the VPU extraction chain."""
    from ppt_tpu.kernels.group import knn_gather

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(32, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(32, 512, 3).astype(np.float32))
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx, _ = knn_gather(32, x + c * 1e-20, ctr, gather=False)
        return jnp.sum(idx.astype(jnp.float32)) * 1e-12

    return _chain_time(f, xyz, iters, nil)


def probe_ball(iters: int, npoints: int = 1024, mode: str = "paired") -> float:
    """ball_query_gather_feats at the PointNeXt-S stage-1 anchor shape
    (B128, N=--npoints, S=512, r=0.15, nsample=32, F=32 bf16)."""
    from ppt_tpu.kernels.group import ball_query_gather_feats

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(128, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(xyz[:, :512, :])
    feats = jnp.asarray(rng.rand(128, npoints, 32).astype(np.float32)).astype(
        jnp.bfloat16
    )
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx, rel, fj = ball_query_gather_feats(
            0.15, 32, x + c * 1e-20, ctr, feats, mode=mode
        )
        return (
            jnp.sum(rel.astype(jnp.float32)) * 1e-9
            + jnp.sum(fj.astype(jnp.float32)) * 1e-9
            + jnp.sum(idx.astype(jnp.float32)) * 1e-12
        )

    return _chain_time(f, xyz, iters, nil)


def probe_ball_evict(iters: int, npoints: int = 1024) -> float:
    return probe_ball(iters, npoints, mode="evict")


def probe_ball_thresh(iters: int, npoints: int = 1024) -> float:
    return probe_ball(iters, npoints, mode="threshold")


def _mini_weights(rng):
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    return (r(3, 128), r(128), r(128, 256), r(256), r(256, 512),
            r(256, 512), r(512), r(512, 256), r(256))


def probe_mini_fwd(iters: int) -> float:
    from ppt_tpu.kernels.mini import mini_forward

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(32, 512 * 32, 3).astype(np.float32))
    w1, b1, w2, b2, wg, wl, bs, w3, b3 = _mini_weights(rng)
    nil = _nil_ms(x, iters)

    def f(xx, c):
        out = mini_forward(
            32, jnp.bfloat16, False, xx + c * 1e-20,
            w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
            wg.astype(jnp.bfloat16), wl.astype(jnp.bfloat16), bs,
            w3.astype(jnp.bfloat16), b3,
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    return _chain_time(f, x, iters, nil)


def probe_mini_stats(iters: int) -> float:
    from ppt_tpu.kernels.mini import mini_stats

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(32, 512 * 32, 3).astype(np.float32))
    w1, b1, w2, b2, wg, wl, bs, _, _ = _mini_weights(rng)
    nil = _nil_ms(x, iters)

    def f(xx, c):
        s, ss = mini_stats(
            32, jnp.bfloat16, False, xx + c * 1e-20,
            w1, b1, w2, b2, wg, wl, bs,
        )
        return jnp.sum(s) * 1e-9 + jnp.sum(ss) * 1e-12

    return _chain_time(f, x, iters, nil)


def _text_setup():
    from ppt_tpu.nn import TextConfig, TextTransformer

    model = TextTransformer(TextConfig(), dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(40, 48, 512).astype(np.float32) * 0.1)
    eot = jnp.asarray(rng.randint(4, 48, 40).astype(np.int32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, eot)
    return model, variables, x, eot


def probe_text_fwd(iters: int) -> float:
    model, variables, x, eot = _text_setup()
    nil = _nil_ms(x, iters)

    def f(xx, c):
        emb = model.apply(variables, xx + c * 1e-20, eot)
        return jnp.sum(emb.astype(jnp.float32)) * 1e-9

    return _chain_time(f, x, iters, nil)


def probe_text_grad(iters: int) -> float:
    model, variables, x, eot = _text_setup()
    nil = _nil_ms(x, iters)

    def f(xx, c):
        def one(z):
            emb = model.apply(variables, z, eot)
            return jnp.sum(jnp.sin(emb.astype(jnp.float32)))

        val, g = jax.value_and_grad(one)(xx + c * 1e-20)
        return val * 1e-9 + jnp.sum(g.astype(jnp.float32)) * 1e-9

    return _chain_time(f, x, iters, nil)


def probe_vit12(iters: int) -> float:
    """12 production fused blocks at the flagship shape."""
    from ppt_tpu.kernels.vitblock import _block_pallas

    B, L, C, H = 32, 513, 384, 6
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    mk = lambda *s: jnp.asarray(
        (rng.randn(*s) * 0.02).astype(np.float32)
    ).astype(dt)
    x = mk(B, L, C)
    pos = mk(B, L, C)
    dp = jnp.ones((B, 2), jnp.float32)
    ws = [
        (jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
         mk(C, 3 * C), mk(C, C), jnp.zeros((C,), jnp.float32),
         jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
         mk(C, 4 * C), jnp.zeros((4 * C,), jnp.float32),
         mk(4 * C, C), jnp.zeros((C,), jnp.float32))
        for _ in range(12)
    ]
    stacked = [jnp.stack(w) for w in zip(*ws)]
    nil = _nil_ms(x, iters)

    def f(xx, c):
        def body(xc, w):
            return _block_pallas(xc, pos, dp, *w, heads=H), None

        y, _ = lax.scan(body, (xx + c * 1e-20).astype(dt), stacked)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9

    return _chain_time(f, x, iters, nil)


def probe_knn_hybrid(iters: int, npoints: int = 1024) -> float:
    """idx-only Pallas selection + XLA take_along_axis gather: the
    in-kernel per-winner one-hot matmul measured ~1 ms of the 2.06 ms
    kernel at N=1024 (serialized 9-lane MXU calls) — this prices the
    alternative of gathering outside the kernel."""
    from ppt_tpu import ops
    from ppt_tpu.kernels.group import knn_gather

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(32, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(32, 512, 3).astype(np.float32))
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx, _ = knn_gather(32, x + c * 1e-20, ctr, gather=False)
        nb = ops.index_points(x, idx) - ctr[:, :, None, :]
        return jnp.sum(nb.astype(jnp.float32)) * 1e-9 + jnp.sum(
            idx.astype(jnp.float32)
        ) * 1e-12

    return _chain_time(f, xyz, iters, nil)


def probe_knn_hybrid_quad(iters: int, npoints: int = 1024) -> float:
    """Hybrid with 4 winners/write-back: with the gather out of the
    loop the extraction is pure VPU, where the write-back saving is a
    larger share (quad beat paired at N=8192 in the full kernel too)."""
    from ppt_tpu import ops
    from ppt_tpu.kernels.group import knn_gather

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(32, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(32, 512, 3).astype(np.float32))
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx, _ = knn_gather(32, x + c * 1e-20, ctr, gather=False, pair=4)
        nb = ops.index_points(x, idx) - ctr[:, :, None, :]
        return jnp.sum(nb.astype(jnp.float32)) * 1e-9 + jnp.sum(
            idx.astype(jnp.float32)
        ) * 1e-12

    return _chain_time(f, xyz, iters, nil)


def probe_knn_xla(iters: int, npoints: int = 1024) -> float:
    """XLA ``ops.knn_point`` + gather (the kernel-off fallback path) at
    the same shape as ``probe_knn`` — the fused/XLA crossover check."""
    from ppt_tpu import ops

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(32, npoints, 3).astype(np.float32))
    ctr = jnp.asarray(rng.rand(32, 512, 3).astype(np.float32))
    nil = _nil_ms(xyz, iters)

    def f(x, c):
        idx = ops.knn_point(32, x + c * 1e-20, ctr)
        nb = ops.index_points(x, idx) - ctr[:, :, None, :]
        return jnp.sum(nb.astype(jnp.float32)) * 1e-9 + jnp.sum(
            idx.astype(jnp.float32)
        ) * 1e-12

    return _chain_time(f, xyz, iters, nil)


PROBES = {
    "grouping": probe_grouping,
    "fps": probe_fps,
    "knn": probe_knn,
    "knn_single": probe_knn_single,
    "knn_quad": probe_knn_quad,
    "knn_nogather": probe_knn_nogather,
    "knn_hybrid": probe_knn_hybrid,
    "knn_hybrid_quad": probe_knn_hybrid_quad,
    "knn_fusedgather": probe_knn_fusedgather,
    "knn_stacked": probe_knn_stacked,
    "knn_stacked_quad": probe_knn_stacked_quad,
    "knn_xla": probe_knn_xla,
    "ball": probe_ball,
    "ball_evict": probe_ball_evict,
    "ball_thresh": probe_ball_thresh,
    "mini_fwd": probe_mini_fwd,
    "mini_stats": probe_mini_stats,
    "text_fwd": probe_text_fwd,
    "text_grad": probe_text_grad,
    "vit12": probe_vit12,
}

# probes whose cost depends on the raw point count (--npoints)
_NPOINT_PROBES = (
    "grouping", "fps", "knn", "knn_single", "knn_quad", "knn_nogather",
    "knn_hybrid", "knn_hybrid_quad", "knn_fusedgather", "knn_stacked",
    "knn_stacked_quad", "knn_xla", "ball", "ball_evict", "ball_thresh",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument("--components", default=",".join(PROBES))
    flags = ap.parse_args()
    for name in flags.components.split(","):
        if name in _NPOINT_PROBES:
            ms = PROBES[name](flags.iters, npoints=flags.npoints)
        else:
            ms = PROBES[name](flags.iters)
        print(f"{name:>11}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
