"""Scene semantic segmentation driver: seg backbones on scene datasets.

Equivalent of the openpoints segmentation example trainer
(``examples/segmentation/main.py`` — per-point CE with ignore label,
ConfusionMatrix mIoU/OA eval) wired to this framework's pieces: the
scene loaders (``data/scenes.py``), the seg backbones ported this round
(PointTransformerSeg / StratifiedSeg / RandLANet / BaafNet), fixed-size
crops for static TPU shapes, jitted AdamW train step.

Usage:
  python -m ppt_tpu.tasks.sceneseg --dataset_name s3dis \
      --model ptseg --npoints 4096 --epochs 100
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppt_tpu.data.datasets import build_dataset
from ppt_tpu.data.loader import Loader
from ppt_tpu.utils.metrics import ConfusionMatrix

log = logging.getLogger(__name__)


SEG_MODELS = {}


def _register(name):
    def deco(fn):
        SEG_MODELS[name] = fn
        return fn

    return deco


@_register("ptseg")
def _ptseg(num_classes: int, in_channels: int, dtype):
    from ppt_tpu.nn import PointTransformerConfig, PointTransformerSeg

    return PointTransformerSeg(
        PointTransformerConfig(num_classes=num_classes, in_channels=in_channels),
        dtype=dtype,
    )


@_register("stratified")
def _stratified(num_classes: int, in_channels: int, dtype):
    from ppt_tpu.nn import StratifiedConfig, StratifiedSeg

    return StratifiedSeg(
        StratifiedConfig(num_classes=num_classes, in_channels=in_channels),
        dtype=dtype,
    )


@_register("randlanet")
def _randla(num_classes: int, in_channels: int, dtype):
    from ppt_tpu.nn import RandLANet, RandLANetConfig

    return RandLANet(
        RandLANetConfig(num_classes=num_classes, d_in=max(in_channels, 3)),
        dtype=dtype,
    )


@_register("baafnet")
def _baaf(num_classes: int, in_channels: int, dtype):
    from ppt_tpu.nn import BaafNet, BaafNetConfig

    return BaafNet(
        BaafNetConfig(
            num_classes=num_classes,
            dims=(max(in_channels, 3), 4, 16, 64, 128, 256, 512),
        ),
        dtype=dtype,
    )


def _apply(model_name, model, variables, pts, feats, train, rngs=None):
    """Dispatch over the backbones' slightly different signatures."""
    kw = dict(train=train)
    if train:
        kw["mutable"] = ["batch_stats"]
    if rngs:
        kw["rngs"] = rngs
    if model_name == "baafnet":
        f = feats if feats is not None else pts
        return model.apply(variables, pts, f, **kw)
    if model_name == "randlanet":
        x = pts if feats is None else jnp.concatenate([pts, feats], -1)
        return model.apply(variables, x, **kw)
    return model.apply(variables, pts, feats, **kw)


def make_seg_train_step(model_name: str, model, optimizer, num_classes: int):
    """Jitted step: per-point smoothed CE with ignore label -1 masked."""

    def step(params, batch_stats, opt_state, rng, batch):
        rng, key = jax.random.split(rng)

        def loss_fn(p):
            out = _apply(
                model_name, model,
                {"params": p, "batch_stats": batch_stats},
                batch["pts"], batch.get("feats"), True,
                rngs={"dropout": key, "droppath": key, "decimation": key,
                      "graph": key},
            )
            logits, mutated = out
            labels = batch["label"]
            valid = labels >= 0
            safe = jnp.maximum(labels, 0)
            ll = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(ll, safe[..., None], -1)[..., 0]
            loss = jnp.sum(nll * valid) / jnp.maximum(valid.sum(), 1)
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * valid) / (
                jnp.maximum(valid.sum(), 1)
            )
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, new_opt, rng, {"loss": loss, "acc": acc * 100}

    return jax.jit(step, donate_argnums=(0, 2))


def make_seg_eval_step(model_name: str, model):
    def eval_step(params, batch_stats, batch):
        return _apply(
            model_name, model,
            {"params": params, "batch_stats": batch_stats},
            batch["pts"], batch.get("feats"), False,
        )

    return jax.jit(eval_step)


def _split_batch(batch: Dict[str, np.ndarray]):
    pc = jnp.asarray(batch["pc"].astype(np.float32))
    pts = pc[..., :3]
    feats = pc[..., 3:] if pc.shape[-1] > 3 else None
    return {
        "pts": pts,
        "feats": feats,
        "label": jnp.asarray(batch["label"].astype(np.int32)),
    }


def train_loop(args) -> Dict[str, float]:
    train_ds = build_dataset(args.dataset_name, args, "train")
    val_split = "val" if args.dataset_name != "s3dis" else "val"
    try:
        test_ds = build_dataset(args.dataset_name, args, val_split)
    except Exception:
        test_ds = train_ds

    in_channels = train_ds.points.shape[-1]
    num_classes = max(len(train_ds.classnames), int(train_ds.seg_labels.max()) + 1)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = SEG_MODELS[args.model](num_classes, in_channels, dtype)

    sample = {
        "pc": train_ds.points[: min(2, len(train_ds.points))],
        "label": train_ds.seg_labels[:2],
    }
    jb = _split_batch(sample)
    variables = model.init(
        jax.random.PRNGKey(args.seed), jb["pts"], jb["feats"]
    ) if args.model not in ("baafnet", "randlanet") else (
        model.init(jax.random.PRNGKey(args.seed), jb["pts"],
                   jb["feats"] if jb["feats"] is not None else jb["pts"])
        if args.model == "baafnet"
        else model.init(jax.random.PRNGKey(args.seed),
                        jb["pts"] if jb["feats"] is None else
                        jnp.concatenate([jb["pts"], jb["feats"]], -1))
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    schedule = optax.cosine_decay_schedule(args.lr, max(
        args.epochs * max(len(train_ds.points) // args.batch_size, 1), 1
    ))
    optimizer = optax.adamw(schedule, weight_decay=getattr(args, 'wd', 1e-4))
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(args.seed + 1)

    step_fn = make_seg_train_step(args.model, model, optimizer, num_classes)
    eval_fn = make_seg_eval_step(args.model, model)
    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)

    best_miou = 0.0
    history = []
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            jb = _split_batch(batch)
            params, batch_stats, opt_state, rng, m = step_fn(
                params, batch_stats, opt_state, rng, jb
            )
            losses.append(float(m["loss"]))
        cm = ConfusionMatrix(num_classes)
        vloader = Loader(test_ds, batch_size=args.batch_size, shuffle=False)
        for batch in vloader:
            valid_rows = batch.pop("valid")
            jb = _split_batch(batch)
            logits = np.asarray(eval_fn(params, batch_stats, jb))
            preds = np.argmax(logits, -1)[valid_rows]
            labels = batch["label"][valid_rows]
            keep = labels >= 0
            cm.update(preds[keep], labels[keep])
        miou = cm.miou
        if getattr(args, "cm_out", None):
            np.savez(
                args.cm_out, matrix=cm.matrix,
                classnames=np.asarray(train_ds.classnames, dtype=object),
            )
        best_miou = max(best_miou, miou)
        log.info("epoch %d loss %.4f mIoU %.2f OA %.2f", epoch,
                 float(np.mean(losses)), miou, cm.overall_accuracy)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "miou": miou})
    return {"best_miou": best_miou, "history": history}


def main(args):
    logging.basicConfig(level=logging.INFO)
    return train_loop(args)


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
