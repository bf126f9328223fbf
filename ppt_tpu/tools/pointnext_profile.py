"""Per-piece PointNeXt-S inference profile at the modelzoo anchor shape.

Times FPS / ball-query / full forward at B=128 x 1024 with value-fetch
chained timing (CLAUDE.md timing-truth), isolating where the 2040
clouds/sec V100 anchor (modelzoo.md:17) is won or lost.

  python -m ppt_tpu.tools.pointnext_profile --only fps1,bq1
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def chain(fn, xs, iters, reps=3):
    import jax
    import jax.numpy as jnp

    def body(c, x):
        out = fn(x)
        s = sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree.leaves(out)
            if hasattr(l, "dtype")
        )
        return c + s * 1e-30, None

    @jax.jit
    def run(xs):
        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(run(xs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(xs))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax.numpy as jnp

    from ppt_tpu import ops
    from ppt_tpu.kernels.group import ball_query_gather, fps_batched

    B, K = args.batch, args.iters
    rng = np.random.RandomState(0)

    def want(name):
        return only is None or name in only

    def report(name, ms):
        print(json.dumps({"component": name, "ms": round(ms, 3)}), flush=True)

    pcs = jnp.asarray(rng.rand(K, B, 1024, 3).astype(np.float32))
    report("overhead", chain(lambda x: x * 1.000001,
                             jnp.zeros((K,), jnp.float32), K))

    # per-stage FPS (stage s: N -> N/2)
    for s, (n, np_) in enumerate(
        [(1024, 512), (512, 256), (256, 128), (128, 64)], start=1
    ):
        if want(f"fps{s}"):
            xs = pcs[:, :, :n]
            report(f"fps{s}", chain(lambda x, np_=np_: fps_batched(x, np_), xs, K))

    # per-stage ball query (radius schedule of PointNeXt-S)
    radii = [0.15, 0.225, 0.3375, 0.50625]
    for s, (n, np_) in enumerate(
        [(1024, 512), (512, 256), (256, 128), (128, 64)], start=1
    ):
        if want(f"bq{s}"):
            xs = pcs[:, :, :n]

            def f(x, np_=np_, r=radii[s - 1]):
                q = x[:, :np_]
                return ball_query_gather(r, 32, x, q, relative=True)

            report(f"bq{s}", chain(f, xs, K))

    # feature gathers (ops.index_points of [B, N, C] by [B, S, 32]) —
    # XLA TPU gathers are historically the silent cost
    chans = [32, 64, 128, 256]
    for s, (n, np_) in enumerate(
        [(1024, 512), (512, 256), (256, 128), (128, 64)], start=1
    ):
        if want(f"gather{s}"):
            c = chans[s - 1]
            feats = jnp.asarray(
                rng.rand(B, n, c).astype(np.float32)
            ).astype(jnp.bfloat16)
            idxs = jnp.asarray(
                rng.randint(0, n, (K, B, np_, 32)).astype(np.int32)
            )
            report(
                f"gather{s}",
                chain(lambda i, feats=feats: ops.index_points(feats, i),
                      idxs, K),
            )

    # stage conv stacks alone on pre-gathered tensors
    for s, (np_, cin, cout) in enumerate(
        [(512, 35, 64), (256, 67, 128), (128, 131, 256), (64, 259, 512)],
        start=1,
    ):
        if want(f"conv{s}"):
            from flax import linen as fnn

            class Sa(fnn.Module):
                @fnn.compact
                def __call__(self, x):
                    x = fnn.Dense(cout // 2, use_bias=False, name="c0")(x)
                    x = fnn.BatchNorm(use_running_average=True,
                                      dtype=jnp.float32, name="b0")(x)
                    x = fnn.relu(x)
                    x = fnn.Dense(cout, use_bias=False, name="c1")(x)
                    x = fnn.BatchNorm(use_running_average=True,
                                      dtype=jnp.float32, name="b1")(x)
                    return jnp.max(x, axis=2)

            sa = Sa()
            import jax

            x0 = jnp.asarray(
                rng.rand(B, np_, 32, cin).astype(np.float32)
            ).astype(jnp.bfloat16)
            v = jax.jit(sa.init)(jax.random.PRNGKey(0), x0[:2])
            xsk = jnp.asarray(
                rng.rand(K, B, np_, 32, cin).astype(np.float32)
            ).astype(jnp.bfloat16)
            report(f"conv{s}", chain(lambda x: sa.apply(v, x), xsk, K))

    if want("fwd"):
        from ppt_tpu.nn import PointNext
        import jax

        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        model = PointNext(dtype=dtype)
        pc4 = jnp.asarray(rng.rand(B, 1024, 4).astype(np.float32))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc4[:2])
        pcs4 = jnp.asarray(rng.rand(K, B, 1024, 4).astype(np.float32))
        report("fwd", chain(lambda x: model.apply(variables, x), pcs4, K))


if __name__ == "__main__":
    main()
