"""Model profiler: params, FLOPs, throughput, and trace capture.

Equivalent of the reference's profiling harness
(``examples/profile.py:22-173`` — deepspeed FLOPs profiler + wall-clock
throughput loops), TPU-native: FLOPs come from XLA's own cost analysis of
the compiled executable, throughput from steady-state timing of the
jitted forward, and ``--trace`` captures a ``jax.profiler`` trace
viewable in TensorBoard/Perfetto.

Usage:
  python -m ppt_tpu.tools.profile --model ULIP_PointBERT --batch 32 --npoints 1024
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def profile_model(
    model_name: str = "ULIP_PointBERT",
    batch: int = 32,
    npoints: int = 1024,
    n_iters: int = 20,
    trace_dir: Optional[str] = None,
    compute_dtype: str = "bfloat16",
) -> Dict[str, float]:
    from ppt_tpu.models import PromptArrays, build_model
    from ppt_tpu.prompt import build_prompt_spec
    from ppt_tpu.tasks.args import TaskArgs

    args = TaskArgs(model=model_name, compute_dtype=compute_dtype)
    args.classnames = [f"class {i}" for i in range(40)]
    spec = build_prompt_spec(args.classnames, n_ctx=32)
    prompts = PromptArrays.from_spec(spec)
    model = build_model(model_name, args).model

    rng = np.random.RandomState(0)
    n_chan = 4 if model_name == "ULIP_PN_NEXT" else 3
    pc = jnp.asarray(rng.rand(batch, npoints, n_chan).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pc[:2], prompts)

    fwd = jax.jit(lambda pc: model.apply(variables, pc, prompts))
    lowered = fwd.lower(pc)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))

    out = fwd(pc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(pc)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    result = {
        "model": model_name,
        "params": count_params(variables["params"]),
        "flops_per_batch": flops,
        "gflops_per_cloud": flops / batch / 1e9 if flops else 0.0,
        "latency_ms": dt / n_iters * 1000,
        "clouds_per_sec": batch * n_iters / dt,
    }

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = fwd(pc)
            jax.block_until_ready(out)
        result["trace_dir"] = trace_dir
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ULIP_PointBERT")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default=None, help="profiler trace output dir")
    ap.add_argument("--all", action="store_true", help="profile every model")
    args = ap.parse_args()

    if args.all:
        from ppt_tpu.models import MODEL_REGISTRY

        for name in MODEL_REGISTRY:
            if "partseg" in name:
                continue
            try:
                print(json.dumps(profile_model(name, args.batch, args.npoints, args.iters)))
            except Exception as e:  # keep going across models
                print(json.dumps({"model": name, "error": str(e)}))
    else:
        print(
            json.dumps(
                profile_model(
                    args.model, args.batch, args.npoints, args.iters, args.trace
                )
            )
        )


if __name__ == "__main__":
    main()
