"""Scene semantic segmentation driver: seg backbones on scene datasets.

Equivalent of the openpoints segmentation example trainer
(``examples/segmentation/main.py``): per-point smoothed CE with ignore
label, ConfusionMatrix mIoU/OA over fixed crops each epoch, best-mIoU
checkpointing with ``--resume``, metrics JSONL/provenance via
ExperimentLogger, and WHOLE-SCENE evaluation (``--eval_scene``) — the
reference's multi-voxel-pass protocol (``main.py:508-612``): voxelize
the raw room, one point per voxel per pass until every point is
covered, run the jitted eval step over fixed-size tiles, scatter-mean
the logits back to raw points, optional rotation voting, and mIoU over
entire scenes. ``--cm_out`` saves the scene confusion matrix for
``tools/s3dis_6fold.py``.

Usage:
  python -m ppt_tpu.tasks.sceneseg --dataset_name s3dis \
      --model ptseg --npoints 4096 --epochs 100 --eval_scene
"""

from __future__ import annotations

import logging
import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ppt_tpu.data.datasets import build_dataset
from ppt_tpu.data.loader import Loader
from ppt_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from ppt_tpu.utils.logging_utils import ExperimentLogger
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


class SegState(struct.PyTreeNode):
    """Checkpointable scene-seg train state (attribute names match
    ``train.checkpoint``'s payload so save/load_checkpoint work as-is)."""

    trainable: dict
    opt_state: object
    batch_stats: dict
    step: jnp.ndarray  # epoch counter


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


def make_seg_train_step(
    model_name: str, model, optimizer, num_classes: int, smoothing: float = 0.0
):
    """Jitted step: per-point label-smoothed CE, ignore label -1 masked
    (openpoints s3dis recipes train with label smoothing —
    ``cfgs/s3dis/default.yaml`` criterion SmoothCrossEntropy)."""

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
            if smoothing > 0.0:
                soft = (
                    jax.nn.one_hot(safe, num_classes) * (1.0 - smoothing)
                    + smoothing / num_classes
                )
                nll = -jnp.sum(soft * ll, axis=-1)
            else:
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


# ---------------------------------------------------------------------------
# Whole-scene evaluation (examples/segmentation/main.py:508-612)
# ---------------------------------------------------------------------------


def whole_scene_eval(
    eval_fn,
    params,
    batch_stats,
    scene_ds,
    *,
    npoints: int,
    num_classes: int,
    voxel_size: float = 0.04,
    batch_size: int = 8,
    num_votes: int = 1,
    max_passes: int = 0,
    seed: int = 0,
) -> ConfusionMatrix:
    """Multi-voxel-pass whole-scene mIoU over RAW points.

    Per scene: voxelize (mode 1), then pass ``i`` takes the i-th member
    of every voxel (one point per voxel, reference ``main.py:100-107``)
    so the union of passes covers every raw point; each variable-size
    subcloud is shuffled and tiled into fixed ``npoints`` chunks
    (wraparound padding) for the static-shape jitted eval step; logits
    scatter-mean back to raw point indices (``scatter(...,
    reduce='mean')``, main.py:596); votes > 1 average extra
    z-rotated passes. ``max_passes=0`` keeps the reference's
    full-coverage behavior.
    """
    cm = ConfusionMatrix(num_classes)
    rng = np.random.RandomState(seed)
    from ppt_tpu.data.scenes import voxelize

    for coord, feat, label in scene_ds.scenes:
        n_raw = coord.shape[0]
        logits_acc = np.zeros((n_raw, num_classes), np.float64)
        counts = np.zeros((n_raw,), np.float64)
        for vote in range(max(1, num_votes)):
            c = coord.astype(np.float32).copy()
            if vote > 0:  # rotation voting around gravity axis
                ang = rng.uniform(0, 2 * np.pi)
                ca, sa = np.cos(ang), np.sin(ang)
                rot = np.array(
                    [[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32
                )
                c = c @ rot.T
            c -= c.min(0)
            idx_sort, voxel_idx, count = voxelize(c, voxel_size, mode=1)
            starts = np.cumsum(np.insert(count, 0, 0)[:-1])
            n_pass = int(count.max())
            if max_passes:
                n_pass = min(n_pass, max_passes)
            for i in range(n_pass):
                idx_part = idx_sort[starts + i % count]
                rng.shuffle(idx_part)
                n_sub = idx_part.shape[0]
                n_tiles = max(1, math.ceil(n_sub / npoints))
                padded = np.resize(idx_part, n_tiles * npoints)  # wraps
                tiles = padded.reshape(n_tiles, npoints)
                for ts in range(0, n_tiles, batch_size):
                    tb = tiles[ts : ts + batch_size]
                    real_b = tb.shape[0]
                    if real_b < batch_size:  # static batch shape
                        tb = np.resize(tb, (batch_size, npoints))
                    pts = c[tb]
                    pts = pts - pts.min(axis=1, keepdims=True)
                    batch = {"pts": jnp.asarray(pts)}
                    if feat is not None:
                        batch["feats"] = jnp.asarray(
                            feat[tb].astype(np.float32)
                        )
                    logits = np.asarray(
                        eval_fn(params, batch_stats, batch),
                        dtype=np.float64,
                    )[:real_b]
                    flat = tb[:real_b].reshape(-1)
                    np.add.at(
                        logits_acc, flat, logits.reshape(-1, num_classes)
                    )
                    np.add.at(counts, flat, 1.0)
        pred = np.argmax(
            logits_acc / np.maximum(counts, 1.0)[:, None], axis=-1
        )
        keep = (label >= 0) & (counts > 0)
        cm.update(pred[keep], label[keep].astype(np.int64))
    return cm


def _load_eval_scenes(args):
    """Raw (un-voxelized) scenes of the eval split — whole-scene eval
    voxelizes internally per pass and maps back to every raw point."""
    name = args.dataset_name
    if name == "s3dis":
        from ppt_tpu.data.scenes import load_s3dis

        return load_s3dis(
            args.data_path, "val",
            test_area=getattr(args, "test_area", 5), voxel_size=0.0,
        )
    if name == "scannetv2":
        from ppt_tpu.data.scenes import load_scannetv2

        return load_scannetv2(args.data_path, "val")
    if name == "semantic_kitti":
        from ppt_tpu.data.scenes import load_semantic_kitti

        return load_semantic_kitti(args.data_path, "val")
    raise KeyError(f"whole-scene eval: unknown scene dataset {name}")


def train_loop(args) -> Dict[str, float]:
    train_ds = build_dataset(args.dataset_name, args, "train")
    eval_split_name = "val"
    try:
        test_ds = build_dataset(args.dataset_name, args, "val")
    except Exception as e:
        if not getattr(args, "allow_train_eval", False):
            raise RuntimeError(
                f"could not load the '{args.dataset_name}' val split ({e}); "
                "pass --allow_train_eval to evaluate on the TRAIN split "
                "(metric will be reported as train_miou)"
            ) from e
        log.warning(
            "val split unavailable (%s) — evaluating on the TRAIN split; "
            "reported metric is train_miou, NOT validation mIoU", e,
        )
        test_ds = train_ds
        eval_split_name = "train"

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
    # optimizer by name, like the reference seg example's
    # build_optimizer_from_cfg (PointNeXt/examples/segmentation/main.py)
    # — adamw is its s3dis default
    optim_name = (getattr(args, "optim", "") or "adamw").lower()
    if optim_name == "adahessian":
        raise ValueError(
            "sceneseg's train step does not thread the Hessian diagonal; "
            "use adamw/sgd/lamb/... (adahessian is supported by the "
            "cls/partseg/mpm/dvae drivers)"
        )
    from ppt_tpu.train.optim import build_optimizer

    # --betas/--eps are honored when the user overrides them; otherwise
    # this driver keeps the openpoints seg recipe's torch-AdamW default
    # (0.9, 0.999) rather than TaskArgs' CLIP-style (0.9, 0.98)
    betas = tuple(getattr(args, "betas", (0.9, 0.98)))
    if betas == (0.9, 0.98):
        betas = (0.9, 0.999)
    optimizer = build_optimizer(
        optim_name, schedule, weight_decay=getattr(args, "wd", 1e-4),
        betas=betas, eps=getattr(args, "eps", 1e-8),
        grad_norm_clip=getattr(args, "grad_norm_clip", 0.0),
    )
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(args.seed + 1)

    start_epoch = 0
    resumed_best = 0.0
    if getattr(args, "resume", ""):
        template = SegState(params, opt_state, batch_stats, jnp.asarray(0))
        restored = load_checkpoint(args.resume, template)
        params, opt_state = restored.trainable, restored.opt_state
        batch_stats = restored.batch_stats
        start_epoch = int(restored.step) + 1
        # restore the best metric so a worse post-resume epoch cannot
        # clobber checkpoint_best
        meta_path = args.resume
        if not os.path.isdir(meta_path):
            meta_path = os.path.dirname(meta_path)
        meta_file = os.path.join(meta_path, "checkpoint_best.json")
        if os.path.exists(meta_file):
            import json as _json

            with open(meta_file) as f:
                meta = _json.load(f)
            resumed_best = max(
                float(meta.get("miou", 0.0) or 0.0),
                float(meta.get("train_miou", 0.0) or 0.0),
            )
        log.info("resumed from %s at epoch %d (best mIoU %.2f)",
                 args.resume, start_epoch, resumed_best)

    logger = ExperimentLogger(args, task_name="sceneseg")
    smoothing = float(getattr(args, "label_smoothing", 0.0))
    step_fn = make_seg_train_step(
        args.model, model, optimizer, num_classes, smoothing=smoothing
    )
    eval_fn = make_seg_eval_step(args.model, model)
    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)

    miou_key = "miou" if eval_split_name == "val" else "train_miou"
    best_miou = resumed_best
    cm = None  # last crop-eval confusion matrix (loop may not run)
    history = []
    for epoch in range(start_epoch, args.epochs):
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
        if miou >= best_miou:
            best_miou = miou
            save_checkpoint(
                logger.dir,
                SegState(params, opt_state, batch_stats, jnp.asarray(epoch)),
                meta={"epoch": epoch, miou_key: miou,
                      "oa": cm.overall_accuracy},
            )
        record = {"epoch": epoch, "loss": float(np.mean(losses)),
                  miou_key: miou, "oa": cm.overall_accuracy,
                  "eval_split": eval_split_name}
        logger.log(record, step=epoch)
        log.info("epoch %d loss %.4f %s %.2f OA %.2f", epoch,
                 record["loss"], miou_key, miou, cm.overall_accuracy)
        history.append({"epoch": epoch, "loss": record["loss"],
                        "miou": miou})

    result = {"best_miou": best_miou, "history": history}

    if getattr(args, "eval_scene", False):
        # evaluate the BEST checkpoint, not the final epoch (reference
        # protocol: segmentation main.py tests the best model)
        eval_params, eval_bs = params, batch_stats
        if os.path.exists(os.path.join(logger.dir, "checkpoint_best.msgpack")):
            best = load_checkpoint(
                logger.dir,
                SegState(params, opt_state, batch_stats, jnp.asarray(0)),
            )
            eval_params, eval_bs = best.trainable, best.batch_stats
        scenes = _load_eval_scenes(args)
        cm = whole_scene_eval(
            eval_fn, eval_params, eval_bs, scenes,
            npoints=args.npoints, num_classes=num_classes,
            voxel_size=getattr(args, "voxel_size", 0.04),
            batch_size=max(1, args.batch_size),
            num_votes=getattr(args, "votes", 1),
            max_passes=getattr(args, "max_eval_passes", 0),
            seed=args.seed,
        )
        result["scene_miou"] = cm.miou
        result["scene_oa"] = cm.overall_accuracy
        logger.log({"scene_miou": cm.miou, "scene_oa": cm.overall_accuracy})
        log.info("whole-scene eval: mIoU %.2f OA %.2f (%d scenes)",
                 cm.miou, cm.overall_accuracy, len(scenes))
        if getattr(args, "cm_out", ""):
            np.savez(
                args.cm_out, matrix=cm.matrix,
                classnames=np.asarray(scenes.classnames, dtype=object),
            )
    elif getattr(args, "cm_out", "") and cm is not None:
        log.warning("--cm_out without --eval_scene: writing the crop-eval "
                    "confusion matrix")
        np.savez(
            args.cm_out, matrix=cm.matrix,
            classnames=np.asarray(train_ds.classnames, dtype=object),
        )
    elif getattr(args, "cm_out", ""):
        log.warning("--cm_out: no evaluation ran (no epochs, no "
                    "--eval_scene) — nothing written")

    logger.close()
    return result


def main(args):
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)  # pod-slice bring-up; no-op single-process
    return train_loop(args)


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
