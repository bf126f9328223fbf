"""Per-component step-time profiler for the PPT-Base train step.

Times each piece of the flagship ULIP-PointBERT training step on the
current backend with value-fetch timing (CLAUDE.md: block_until_ready
does not wait through the remote TPU tunnel), chaining ``iters``
executions inside ONE jitted ``lax.scan`` dispatch so the ~28 ms scalar
round-trip amortizes away.

Each component also reports XLA-cost-analysis FLOPs so the table carries
an honest per-component MFU against the measured ~200 TFLOPS bf16 peak
(CLAUDE.md timing-truth note).

Usage:
  python -m ppt_tpu.tools.step_profile            # full table, JSON lines
  python -m ppt_tpu.tools.step_profile --only step,fwd
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 200.0  # honest v5e bf16 peak measured via 64-chain matmul


def chain_time(fn, const_args, xs, iters=8, reps=3):
    """Per-iteration ms for ``fn(*const_args, x_k)`` over ``iters``
    scan steps in ONE dispatch (bench.py's pattern: the per-iteration
    input ``xs`` is a stacked ``[iters, ...]`` pytree, so nothing is
    loop-invariant and nothing needs per-leaf perturbation — which the
    axon tunnel's remote_compile rejects with HTTP 413 at full-model
    scale)."""

    @jax.jit
    def run(c_args, xs):
        # NOTE: c_args MUST be threaded through the jit parameter, not
        # captured by closure — closure-captured arrays are embedded in
        # the serialized module as dense constants, and at full-model
        # scale (~340 MB of params) the tunnel's remote_compile rejects
        # the request with HTTP 413.
        def body(c, x):
            out = fn(*c_args, x)
            leaves = [
                l for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return c

    float(run(const_args, xs))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(const_args, xs))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def flops_of(fn, *args) -> float:
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--npoints", type=int, default=1024)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from __graft_entry__ import _flagship
    from ppt_tpu.models import trainable_mask
    from ppt_tpu.nn.pointbert import group_points
    from ppt_tpu.train import (
        cosine_with_warmup,
        create_train_state,
        make_train_multi_step,
    )
    from ppt_tpu.train.trainer import (
        _make_train_step_fn,
        make_optimizer,
        make_train_step,
        merge_params,
    )

    B, N = args.batch, args.npoints
    model, prompts = _flagship()
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, (B,)))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:2], prompts)
    mask = trainable_mask(variables["params"], head_type=0)
    opt = make_optimizer(cosine_with_warmup(3e-3, 1e-5, 250, 100, warmup_epochs=1))
    state = create_train_state(variables, mask, opt, jax.random.PRNGKey(1))
    params_bs = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}

    results = {}

    def report(name, ms, flops=0.0):
        mfu = flops / (ms / 1000.0) / 1e12 / PEAK_TFLOPS * 100 if flops else 0.0
        results[name] = {"ms": round(ms, 3), "gflop": round(flops / 1e9, 1),
                         "mfu_pct": round(mfu, 1)}
        print(json.dumps({"component": name, **results[name]}), flush=True)

    def want(name):
        return only is None or name in only

    K = args.iters
    pcs_k = jnp.asarray(rng.rand(K, B, N, 3).astype(np.float32))
    eps_k = jnp.zeros((K,), jnp.float32)

    # --- dispatch+fetch overhead calibration: chain of trivial bodies ---
    if want("overhead"):
        report("overhead", chain_time(lambda x: x * 1.000001, (), eps_k, K))

    # --- full train step (the number that matters) -----------------------
    if want("step"):
        # chain via scan over K distinct batches, like bench.py.
        # NOTE: make_train_multi_step donates its state, whose leaves
        # alias `variables` (partition_params shares buffers) — donating
        # them would invalidate every other component's inputs, so each
        # call gets a deep copy of the state.
        K = args.iters
        pcs = jnp.asarray(rng.rand(K, B, N, 3).astype(np.float32))
        lbls = jnp.asarray(rng.randint(0, 40, (K, B)))
        mstep = make_train_multi_step(model, opt, smoothing=0.2)
        batches = {"pc": pcs, "label": lbls}

        def fresh():
            return jax.tree.map(jnp.copy, state)

        s2, m = mstep(fresh(), batches, prompts)
        float(m["loss"][-1])
        del s2
        best = float("inf")
        for _ in range(3):
            state_in = fresh()
            t0 = time.perf_counter()
            s2, m = mstep(state_in, batches, prompts)
            float(m["loss"][-1])
            best = min(best, time.perf_counter() - t0)
            del s2
        fl = flops_of(
            lambda st, b, p: _make_train_step_fn(model, opt, 0.2)(st, b, p)[1]["loss"],
            state, {"pc": pc, "label": labels}, prompts,
        )
        report("step", best / K * 1000.0, fl)

    # --- forward-only full model ----------------------------------------
    if want("fwd"):
        fn = lambda v, pr, pc: model.apply(v, pc, pr)
        report("fwd", chain_time(fn, (params_bs, prompts), pcs_k, K),
               flops_of(lambda v, pc, pr: model.apply(v, pc, pr),
                        params_bs, pc, prompts))

    # --- grouping (FPS + kNN + gather) ------------------------------------
    if want("group"):
        fn = lambda pc: group_points(pc, 512, 32)
        report("group", chain_time(fn, (), pcs_k, K), flops_of(fn, pc))

    # --- point tower forward ----------------------------------------------
    if want("tower"):
        fn = lambda v, pc: model.apply(v, pc, method=lambda m, pc: m.encode_pc(pc))
        report("tower", chain_time(fn, (params_bs,), pcs_k, K),
               flops_of(fn, params_bs, pc))

    # --- text tower forward -------------------------------------------------
    # no per-iteration float input exists, so the loop-carried eps is
    # injected into the token embedding to defeat loop-invariant hoisting
    if want("text"):
        def text_fn(v, pr, eps):
            emb = v["params"]["text"]["token_embedding"]["embedding"]
            v2 = jax.tree.map(lambda x: x, v)  # shallow-copy tree
            v2["params"]["text"]["token_embedding"]["embedding"] = (
                emb + eps.astype(emb.dtype)
            )
            return model.apply(v2, pr, method=lambda m, pr: m.encode_text(pr))

        report("text", chain_time(text_fn, (params_bs, prompts), eps_k, K),
               flops_of(lambda v, pr: model.apply(
                   v, pr, method=lambda m, pr: m.encode_text(pr)),
                   params_bs, prompts))

    # --- MiniPointNet alone (the [B,G,M,*] shared-MLP stage) ---------------
    if want("mini"):
        from ppt_tpu.nn.pointbert import MiniPointNet

        mini = MiniPointNet(256, dtype=model.dtype)
        nbrs = jnp.asarray(
            rng.rand(B, 512, 32, 3).astype(np.float32)
        )
        mini_vars = mini.init(jax.random.PRNGKey(0), nbrs[:2])
        nbrs_k = jnp.asarray(rng.rand(K, B, 512, 32, 3).astype(np.float32))
        fn = lambda v, x: mini.apply(v, x)
        report("mini", chain_time(fn, (mini_vars,), nbrs_k, K),
               flops_of(fn, mini_vars, nbrs))

    # --- 12 ViT blocks alone (tokens + per-block pos add) -------------------
    if want("vit"):
        from ppt_tpu.nn.pointbert import VitBlock

        class _Trunk:
            pass

        from flax import linen as fnn

        class Trunk(fnn.Module):
            dtype: object = model.dtype

            @fnn.compact
            def __call__(self, x, pos):
                for i in range(12):
                    x = VitBlock(6, dtype=self.dtype, name=f"block_{i}")(
                        x, pos=pos
                    )
                return x

        trunk = Trunk()
        toks = jnp.asarray(rng.rand(B, 513, 384).astype(np.float32))
        pos = jnp.asarray(rng.rand(B, 513, 384).astype(np.float32))
        tvars = trunk.init(jax.random.PRNGKey(0), toks[:2], pos[:2])
        toks_k = jnp.asarray(rng.rand(K, B, 513, 384).astype(np.float32))
        fn = lambda v, p, x: trunk.apply(v, x, p)
        report("vit", chain_time(fn, (tvars, pos), toks_k, K),
               flops_of(lambda v, x, p: trunk.apply(v, x, p), tvars, toks, pos))

    # --- attention variants at the exact ViT shape --------------------------
    if want("attn"):
        from ppt_tpu.kernels.attention import chunked_mha

        L, h, hd = 513, 6, 64
        qkv = jnp.asarray(
            rng.rand(3, B, L, h, hd).astype(np.float32)
        ).astype(model.dtype)
        q0, k0, v0 = qkv[0], qkv[1], qkv[2]
        qs = jnp.asarray(rng.rand(K, B, L, h, hd).astype(np.float32)).astype(
            model.dtype
        )

        def einsum_attn(k, v, q):
            scale = 1.0 / (hd ** 0.5)
            s = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhlm,bmhd->blhd", p, v)

        report("attn_einsum", chain_time(einsum_attn, (k0, v0), qs, K))
        report("attn_chunked",
               chain_time(lambda k, v, q: chunked_mha(q, k, v), (k0, v0), qs, K))

    # --- tokenization path: grouping + MiniPointNet + reduce + pos ---------
    if want("embed"):
        from flax import linen as fnn

        from ppt_tpu.nn.pointbert import MiniPointNet, group_points

        class Embed(fnn.Module):
            dtype: object = model.dtype

            @fnn.compact
            def __call__(self, pc):
                nbr, center = group_points(pc, 512, 32)
                toks = MiniPointNet(256, dtype=self.dtype, name="enc")(nbr)
                toks = fnn.Dense(384, dtype=self.dtype, name="reduce")(toks)
                pos = fnn.Dense(128, dtype=self.dtype, name="p1")(center)
                pos = fnn.gelu(pos)
                pos = fnn.Dense(384, dtype=self.dtype, name="p2")(pos)
                return toks, pos

        emb = Embed()
        evars = emb.init(jax.random.PRNGKey(0), pc[:2])
        fn = lambda v, x: emb.apply(v, x)
        report("embed", chain_time(fn, (evars,), pcs_k, K),
               flops_of(fn, evars, pc))

    # --- value_and_grad (no optimizer) --------------------------------------
    if want("grad"):
        from ppt_tpu.models.losses import smoothed_cross_entropy

        def loss_fn(trainable, frozen, bs, pc, labels, prompts, key):
            params = merge_params(trainable, frozen)
            logits, _ = model.apply(
                {"params": params, "batch_stats": bs}, pc, prompts,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key, "droppath": key},
            )
            return smoothed_cross_entropy(logits, labels, 0.2)

        g = lambda tr, fr, bs, lb, pr, k, pc: jax.value_and_grad(loss_fn)(
            tr, fr, bs, pc, lb, pr, k
        )
        consts = (state.trainable, state.frozen, state.batch_stats, labels,
                  prompts, jax.random.PRNGKey(2))
        report("grad", chain_time(g, consts, pcs_k, K),
               flops_of(lambda tr, fr, bs, pc, lb, pr, k:
                        jax.value_and_grad(loss_fn)(tr, fr, bs, pc, lb, pr, k),
                        state.trainable, state.frozen, state.batch_stats, pc,
                        labels, prompts, jax.random.PRNGKey(2)))

    # --- fwd in train mode (BN stats + dropout rng, no grad) ---------------
    if want("fwd_train"):
        def ft(v, pr, key, pc):
            return model.apply(
                v, pc, pr, train=True, mutable=["batch_stats"],
                rngs={"dropout": key, "droppath": key},
            )[0]
        a = (params_bs, prompts, jax.random.PRNGKey(2))
        report("fwd_train", chain_time(ft, a, pcs_k, K),
               flops_of(lambda v, pc, pr, key: model.apply(
                   v, pc, pr, train=True, mutable=["batch_stats"],
                   rngs={"dropout": key, "droppath": key})[0],
                   params_bs, pc, prompts, jax.random.PRNGKey(2)))

    # --- optimizer update alone ---------------------------------------------
    if want("opt"):
        import optax

        def ou(ostate, trainable, eps):
            grads = jax.tree.map(
                lambda p: jnp.full_like(p, 1e-6) + eps.astype(p.dtype),
                trainable,
            )
            up, no = opt.update(grads, ostate, trainable)
            return optax.apply_updates(trainable, up), no

        report("opt", chain_time(ou, (state.opt_state, state.trainable),
                                 eps_k, K))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
