"""Backbone inference throughput (the modelzoo-anchor comparison).

Measures steady-state forward clouds/sec for the point backbones at the
reference's benchmark setting (batch 128 x 1024 points — the V100
numbers in ``PointNeXt/docs/modelzoo.md:11-18``: PointNeXt-S 2040,
PointNet++ 1872 ins/sec). Value-fetch timing over a 16-iteration scan
(CLAUDE.md timing-truth).

  python -m ppt_tpu.tools.backbone_bench --model pointnext
  python -m ppt_tpu.tools.backbone_bench --model pointnet2_ssg --batch 128
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(name: str, dtype):
    from ppt_tpu import nn as pnn

    if name == "pointnext":
        return pnn.PointNext(dtype=dtype), 4
    if name == "pointnet2_ssg":
        return pnn.PointNet2Ssg(dtype=dtype), 3
    if name == "pointnet2_msg":
        return pnn.PointNet2Msg(dtype=dtype), 3
    if name == "pointmlp":
        return pnn.PointMLP(dtype=dtype), 3
    if name == "dgcnn":
        return pnn.DgcnnClassifier(dtype=dtype), 3
    raise KeyError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="pointnext")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, in_ch = build(args.model, dtype)
    B, N, K = args.batch, args.npoints, args.iters
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(B, N, in_ch).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:2])
    pcs = jnp.asarray(rng.rand(K, B, N, in_ch).astype(np.float32))

    def body(c, x):
        out = model.apply(variables, x)
        return c + jnp.sum(out.astype(jnp.float32)) * 1e-30, None

    @jax.jit
    def run(xs):
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(run(pcs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(pcs))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000
    print(json.dumps({
        "model": args.model, "batch": B, "npoints": N,
        "fwd_ms": round(ms, 3),
        "clouds_per_sec": round(B / (ms / 1000), 1),
    }))


if __name__ == "__main__":
    main()
