"""One-time FLOP audit for the bench workloads -> ppt_tpu/assets/flops.json.

``bench.py`` wants honest ``gflop_per_cloud``/``mfu_pct`` numbers, but XLA
cost analysis of the TPU executable can't see inside the fused Pallas
kernels (custom calls report zero FLOPs — measured 0.95 GFLOP/cloud for a
train step whose matmuls alone are >20x that). This tool lowers the SAME
computations on the CPU backend, where the product paths take their pure
XLA formulations (the Pallas kernels are TPU-gated), so ``cost_analysis``
counts every matmul. FLOP counts are backend-independent; the resulting
per-cloud numbers are committed and read by bench at run time.

Run in a fresh process (the sitecustomize force-registers the TPU
backend): ``python tools/flops_audit.py``. It re-execs itself with the
CPU backend forced if needed.

Workloads audited (canonical bench shapes; FLOPs scale linearly in B/K):
  - ``train_per_cloud``   — full PPT-Base train step, B32xN1024
  - ``n8192_fwd_per_cloud`` — flagship eval forward, B32xN8192
  - ``anchor_per_cloud``  — PointNeXt-S inference, B128xN1024
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ppt_tpu", "assets", "flops.json")


def _flops(lowered) -> float:
    cost = lowered.compile().cost_analysis() or {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def audit():
    import jax

    assert jax.default_backend() == "cpu", jax.default_backend()
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from __graft_entry__ import _flagship
    from ppt_tpu.models import trainable_mask
    from ppt_tpu.train import (
        cosine_with_warmup,
        create_train_state,
        make_train_step,
    )
    from ppt_tpu.train.trainer import make_optimizer

    results = {
        "_provenance": (
            "XLA cost_analysis on the CPU backend (pure-XLA product paths; "
            "the TPU-gated Pallas kernels compute the same math). "
            "Regenerate: python tools/flops_audit.py"
        ),
    }
    rng = np.random.RandomState(0)
    model, prompts = _flagship()

    # --- train step (single step; per-cloud = flops / B) ---------------
    B, N = 32, 1024
    pc = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, (B,)))
    variables = jax.eval_shape(
        lambda k: model.init(k, pc[:2], prompts), jax.random.PRNGKey(0)
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    mask = trainable_mask(variables["params"], head_type=0)
    opt = make_optimizer(cosine_with_warmup(3e-3, 1e-5, 250, 100, warmup_epochs=1))
    state = create_train_state(variables, mask, opt, jax.random.PRNGKey(1))
    step = make_train_step(model, opt, smoothing=0.2)
    fl = _flops(step.lower(state, {"pc": pc, "label": labels}, prompts))
    results["train_per_cloud"] = fl / B
    print(f"train: {fl / B / 1e9:.2f} GFLOP/cloud")

    # --- flagship forward at N=8192 ------------------------------------
    B8, N8 = 32, 8192
    pc8 = jnp.asarray(rng.rand(B8, N8, 3).astype(np.float32))
    v = {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}
    fwd = jax.jit(lambda v, x, pr: model.apply(v, x, pr))
    fl8 = _flops(fwd.lower(v, pc8, prompts))
    results["n8192_fwd_per_cloud"] = fl8 / B8
    print(f"n8192 fwd: {fl8 / B8 / 1e9:.2f} GFLOP/cloud")

    # --- train step at the reference-native N=8192 ---------------------
    labels8 = jnp.asarray(rng.randint(0, 40, (B8,)))
    fl8t = _flops(step.lower(state, {"pc": pc8, "label": labels8}, prompts))
    results["n8192_train_per_cloud"] = fl8t / B8
    print(f"n8192 train: {fl8t / B8 / 1e9:.2f} GFLOP/cloud")

    # --- anchor: PointNeXt-S inference ----------------------------------
    from ppt_tpu.nn import PointNext

    model2 = PointNext()
    Ba = 128
    pc4 = jnp.asarray(rng.rand(Ba, 1024, 4).astype(np.float32))
    v2 = jax.eval_shape(lambda k: model2.init(k, pc4[:2]), jax.random.PRNGKey(0))
    v2 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v2)
    fwd2 = jax.jit(lambda v, x: model2.apply(v, x))
    fla = _flops(fwd2.lower(v2, pc4))
    results["anchor_per_cloud"] = fla / Ba
    print(f"anchor: {fla / Ba / 1e9:.2f} GFLOP/cloud")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {OUT}")


def main():
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "?"
    if backend != "cpu":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.path.insert(0, %r); "
            "from tools.flops_audit import audit; audit()" % REPO
        )
        raise SystemExit(
            subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO).returncode
        )
    audit()


if __name__ == "__main__":
    main()
