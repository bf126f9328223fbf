"""AOT serving export: the trained recognizer as a versioned StableHLO
artifact (``jax.export``).

The reference has no deployment story beyond "load the .pt in the same
torch codebase" (``main_cls.py:142-176`` re-instantiates the whole
training stack to run inference). TPU-native serving wants the
opposite: ahead-of-time lower the EVAL forward once, serialize it, and
run it from any minimal runtime (JAX on CPU/TPU, or IFRT/PJRT loaders)
with no model code, no flax, no tokenizer at serve time.

What gets exported (``pc -> logits``):
  - the point-tower eval forward (eval BatchNorm, drop-path off),
  - ``pc_projection`` and the ln(100)-clamped logit scale,
  - the TEXT side collapsed to a constant: after prompt tuning the
    class-prompt embeddings never change, so ``encode_text`` is run
    once at export time and its [C, E] output is baked into the graph —
    serving never pays the text tower (``ULIP_models.py:260-276``
    recomputes it every eval batch).

Artifact layout (``--out DIR``):
  serve_logits.jaxexport   serialized Exported (StableHLO + vjp-less
                           calling convention); self-contained when
                           ``--bake-weights``, else takes the param
                           pytree as its first argument
  weights.msgpack          full serving variables (absent when baked)
  meta.json                class labels, shapes, dtypes, platforms,
                           framework git rev

Round-trip loader: ``load_exported(path)`` -> ``Exported`` whose
``.call(...)`` jit-executes on the local backend (cross-platform lowered
with ``--platform cpu tpu`` so one artifact serves both).

Usage:
  python -m ppt_tpu.tools.export --out outputs/export_cls \
      --ckpt outputs/exp/checkpoint_best.msgpack --head_type 0
  python -m ppt_tpu.tools.export --out /tmp/e --tiny --batch 4  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import numpy as np


def jnp_shape(a):
    return tuple(np.shape(a))


def jnp_dtype(a):
    return getattr(a, "dtype", None) or np.asarray(a).dtype


def serving_variables(variables) -> dict:
    """The subset of variables the serving graph actually reads: the
    point tower + projection + logit scale (+ its BN stats). The text
    tower and prompt learner are baked into the graph as a constant, so
    shipping their ~weights would be dead payload at serve time (flax
    only materializes submodule params on use, so the pruned tree
    applies cleanly through ``encode_pc``)."""
    keep = ("point_encoder", "pc_projection", "logit_scale")
    out = {
        "params": {
            k: variables["params"][k] for k in keep if k in variables["params"]
        }
    }
    if variables.get("batch_stats"):
        out["batch_stats"] = variables["batch_stats"]
    return out


def build_serving_fn(model, variables, prompts, *, bake_weights: bool):
    """Returns ``(fn, example_args)`` for the eval ``pc -> logits`` path
    with the text embeddings precomputed as a graph constant."""
    import jax
    import jax.numpy as jnp

    text_embed = jax.jit(
        lambda v, p: model.apply(
            {"params": v["params"]}, p, method="encode_text"
        )
    )(variables, prompts)
    text_embed = jnp.asarray(np.asarray(text_embed))  # host-snap: constant
    # parity: logit_scale is clamped to ln(100) at USE time
    # (ULIP_models.py:113 clamps in the train loop; serving honors it)
    scale = float(
        np.exp(
            min(float(np.asarray(variables["params"]["logit_scale"])), np.log(100.0))
        )
    )

    def serve(v, pc):
        pc_embed = model.apply(v, pc, method="encode_pc")
        return scale * pc_embed @ text_embed.T

    serve_vars = serving_variables(variables)
    if bake_weights:
        host_vars = jax.tree_util.tree_map(np.asarray, serve_vars)

        def serve_baked(pc):
            return serve(host_vars, pc)

        return serve_baked, None
    return serve, serve_vars


def export_serving(
    model,
    variables,
    prompts,
    *,
    batch: int,
    npoints: int,
    platforms: Optional[Sequence[str]] = None,
    bake_weights: bool = False,
    sym_batch: bool = False,
):
    """Lower + export the serving fn. ``sym_batch`` exports a symbolic
    batch dimension (one artifact, any batch); static batch is the
    TPU-friendly default (XLA tiles static shapes onto the MXU)."""
    import jax
    from jax import export as jexport

    fn, var_arg = build_serving_fn(
        model, variables, prompts, bake_weights=bake_weights
    )
    pc_shape = (batch, npoints, 3)
    if sym_batch:
        (b,) = jexport.symbolic_shape("b")
        pc_spec = jax.ShapeDtypeStruct((b, npoints, 3), np.float32)
    else:
        pc_spec = jax.ShapeDtypeStruct(pc_shape, np.float32)

    exp = jexport.export(jax.jit(fn), platforms=platforms)
    if var_arg is None:
        return exp(pc_spec)
    # specs from metadata only — never pull device arrays to host
    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp_shape(a), jnp_dtype(a)), var_arg
    )
    return exp(var_specs, pc_spec)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def _restore_ckpt(variables, ckpt_path: str, head_type: int, task: str):
    """Merge a framework checkpoint (trainable partition + batch stats,
    train/checkpoint.py:35-49) into freshly-built serving variables."""
    from flax import serialization

    from ppt_tpu.models import trainable_mask
    from ppt_tpu.train.trainer import merge_params, partition_params

    if os.path.isdir(ckpt_path):
        ckpt_path = os.path.join(ckpt_path, "checkpoint_best.msgpack")
    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    mask = trainable_mask(variables["params"], head_type=head_type, task=task)
    trainable, frozen = partition_params(variables["params"], mask)
    trainable = serialization.from_state_dict(trainable, raw["trainable"])
    out = dict(variables)
    out["params"] = merge_params(trainable, frozen)
    if variables.get("batch_stats") and raw.get("batch_stats"):
        out["batch_stats"] = serialization.from_state_dict(
            variables["batch_stats"], raw["batch_stats"]
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ckpt", default="", help="checkpoint_best.msgpack")
    ap.add_argument("--head_type", type=int, default=0)
    ap.add_argument(
        "--pretrained_dir", default="",
        help="directory of converted backbone msgpacks (ckpt_convert "
        "output). REQUIRED for a faithful artifact from a training "
        "checkpoint: checkpoints persist only the TRAINABLE partition "
        "(train/checkpoint.py:35-49), so the frozen towers must be "
        "loaded here exactly as the training run loaded them "
        "(tasks/cls.py:136-147)",
    )
    ap.add_argument(
        "--ulip2", action="store_true",
        help="pick the ULIP-2 backbone file, as in training",
    )
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument(
        "--platform", nargs="*", default=None,
        help="lowering platforms, e.g. --platform cpu tpu (default: local)",
    )
    ap.add_argument("--bake-weights", action="store_true")
    ap.add_argument("--sym-batch", action="store_true")
    ap.add_argument(
        "--tiny", action="store_true",
        help="tiny model (CI/smoke; same code path)",
    )
    ap.add_argument(
        "--measure", type=int, default=0, metavar="N",
        help="after exporting, load the artifact back and time N serving "
        "calls (weights device-resident; completion forced by a scalar "
        "fetch — CLAUDE.md timing-truth); prints a latency JSON line",
    )
    args = ap.parse_args(argv)

    import sys

    import jax

    # the flagship builder lives in the repo-root driver module; make the
    # CLI work from any cwd
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __graft_entry__ as graft
    from flax import serialization

    model, prompts = graft._flagship(tiny=args.tiny)
    n = args.npoints
    pc0 = np.random.RandomState(0).rand(2, n, 3).astype(np.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.numpy.asarray(pc0), prompts
    )
    if args.pretrained_dir:
        # frozen towers first (the training run's own load order):
        # checkpoints carry only the trainable partition
        import types

        from ppt_tpu.train.checkpoint import load_pretrained_backbones

        variables = load_pretrained_backbones(
            types.SimpleNamespace(
                model="ULIP_PointBERT",
                ulip2=args.ulip2,
                pretrained_dir=args.pretrained_dir,
            ),
            variables,
        )
    elif args.ckpt:
        print(
            "WARNING: --ckpt without --pretrained_dir: the frozen "
            "towers stay at random init, the artifact will NOT "
            "reproduce the trained model (checkpoints persist only "
            "the trainable partition)",
            file=sys.stderr,
        )
    if args.ckpt:
        variables = _restore_ckpt(
            variables, args.ckpt, args.head_type, "cls"
        )

    exported = export_serving(
        model,
        variables,
        prompts,
        batch=args.batch,
        npoints=n,
        platforms=args.platform,
        bake_weights=args.bake_weights,
        sym_batch=args.sym_batch,
    )
    os.makedirs(args.out, exist_ok=True)
    art = os.path.join(args.out, "serve_logits.jaxexport")
    save_exported(exported, art)
    serve_vars = serving_variables(variables)
    if not args.bake_weights:
        # only what the graph reads: point tower + projection + scale
        # (+ BN stats) — the text tower is a baked constant
        with open(os.path.join(args.out, "weights.msgpack"), "wb") as f:
            f.write(
                serialization.to_bytes(
                    jax.tree_util.tree_map(np.asarray, serve_vars)
                )
            )
    labels_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "labels.json",
    )
    meta = {
        "input": ["params pytree (weights.msgpack)"] * (not args.bake_weights)
        + [f"pc [b, {n}, 3] f32" if args.sym_batch else f"pc [{args.batch}, {n}, 3] f32"],
        "output": "logits [batch, n_classes] (scale * pc_embed @ text_embed.T)",
        "n_classes": int(json.load(open(labels_path))["modelnet40"].__len__())
        if not args.tiny else None,
        "platforms": list(exported.platforms),
        "baked_weights": bool(args.bake_weights),
        "artifact_bytes": os.path.getsize(art),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"out": args.out, **meta}))

    if args.measure:
        # round-trip + latency: the PROFILE_r05 §7 measurement, repeatable
        import time

        import jax.numpy as jnp

        loaded = load_exported(art)
        pc = jax.numpy.asarray(
            np.random.RandomState(1)
            .rand(args.batch, n, 3)
            .astype(np.float32)
        )
        if args.bake_weights:
            call = jax.jit(loaded.call)
            run = lambda: call(pc)
        else:
            # already device-resident after init/restore; no host trip
            dev_vars = jax.device_put(serve_vars)
            call = jax.jit(loaded.call)
            run = lambda: call(dev_vars, pc)
        warm = float(jnp.sum(run()))  # compile + correctness probe
        times = []
        for _ in range(args.measure):
            t0 = time.time()
            _ = float(jnp.sum(run()))
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            json.dumps(
                {
                    "surface": "exported_serving_latency",
                    "batch": args.batch,
                    "npoints": n,
                    "median_latency_ms": round(med * 1000, 2),
                    "clouds_per_sec": round(args.batch / med, 1),
                    "spread_pct": round(
                        100 * (max(times) - min(times)) / med, 1
                    ),
                    "reps": args.measure,
                    "logit_sum_probe": warm,
                }
            )
        )


if __name__ == "__main__":
    main()
