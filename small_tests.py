#!/usr/bin/env python
"""Smoke script: instantiate every registry model and dataset, count
parameters, run one tiny forward (reference ``small_tests.py:12-88``).

Runs on CPU by default so it never competes for the TPU tunnel; pass
``--tpu`` to exercise the accelerator path instead.

Usage: python small_tests.py [--models-only|--datasets-only] [--tpu]
"""
from __future__ import annotations

import argparse
import sys
import time


def _human(n: int) -> str:
    return f"{n / 1e6:.2f}M" if n >= 1e6 else f"{n / 1e3:.1f}K"


def smoke_models() -> int:
    import jax
    import jax.numpy as jnp

    from ppt_tpu.models.ulip import MODEL_REGISTRY, PromptArrays, build_model
    from ppt_tpu.prompt.learner import build_prompt_spec
    from ppt_tpu.tasks.args import TaskArgs

    failures = 0
    args = TaskArgs(npoints=256, num_learnable_prompt_tokens=4)
    classnames = ["airplane", "chair", "person"]
    prompts = PromptArrays.from_spec(build_prompt_spec(classnames, n_ctx=4))
    pc = jnp.zeros((2, 256, 3), jnp.float32)
    for name in sorted(MODEL_REGISTRY):
        t0 = time.time()
        try:
            extra = {}
            if "partseg" in name:
                import dataclasses

                spec = build_model(name, dataclasses.replace(args, task="partseg"))
                extra["cls_onehot"] = jnp.zeros((2, 16), jnp.float32)
            else:
                spec = build_model(name, args)
            variables = jax.jit(
                spec.model.init, static_argnames=()
            )(jax.random.PRNGKey(0), pc, prompts, **extra)
            logits = spec.model.apply(variables, pc, prompts, **extra)
            n_params = sum(
                x.size for x in jax.tree_util.tree_leaves(variables["params"])
            )
            print(
                f"  {name:28s} params={_human(n_params):>8s} "
                f"logits={tuple(logits.shape)} ({time.time() - t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001 — smoke test reports and moves on
            failures += 1
            print(f"  {name:28s} FAILED: {type(e).__name__}: {e}")
    return failures


def smoke_datasets() -> int:
    from ppt_tpu.data.datasets import DATASET_REGISTRY, build_dataset
    from ppt_tpu.tasks.args import TaskArgs

    failures = 0
    args = TaskArgs(npoints=64, batch_size=4, nshots=2)
    for name in sorted(DATASET_REGISTRY):
        try:
            ds = build_dataset(name, args, "train")
            print(
                f"  {name:24s} len={len(ds):>6d} points={ds.points.shape} "
                f"classes={ds.num_classes}"
                + (" [synthetic fallback]" if ds.name.startswith("synthetic")
                   and not name.startswith("synthetic") else "")
            )
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name:24s} FAILED: {type(e).__name__}: {e}")
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-only", action="store_true")
    ap.add_argument("--datasets-only", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU instead of forcing CPU")
    ns = ap.parse_args()

    if not ns.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    failures = 0
    if not ns.datasets_only:
        print("== models ==")
        failures += smoke_models()
    if not ns.models_only:
        print("== datasets ==")
        failures += smoke_datasets()
    print("OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
