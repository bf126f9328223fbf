"""Part segmentation task driver (ShapeNetPart).

Equivalent of ``main_partseg.py:29-373``: dense per-point prompt-tuned
classification over 50 part labels. The model is
``ULIP_PointBERT_partseg`` — the PointBERT trunk with multi-level feature
taps and hierarchical propagation producing 128-d per-point features,
projected against per-part text embeddings.

Eval parity: predictions are refined by masking logits to the
ground-truth object category's part range before the argmax
(``main_partseg.py:219-225``), then overall accuracy, instance mIoU and
category mIoU are computed (``:317-367``) — here as vectorized masked
reductions on device instead of per-sample Python loops.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ppt_tpu.data import Loader, build_dataset
from ppt_tpu.data.datasets import SHAPENETPART_PART_RANGES
from ppt_tpu.models import PromptArrays, build_model, trainable_mask
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.prompt import build_prompt_spec
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.train import (
    cosine_with_warmup,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from ppt_tpu.train.checkpoint import save_checkpoint
from ppt_tpu.utils.metrics import Meter, partseg_ious, refine_partseg_logits

log = logging.getLogger(__name__)


def setup(args: TaskArgs):
    args.task = "partseg"
    train_ds = build_dataset(args.dataset_name, args, "train")
    # reference evaluates partseg on the 'val' split (main_partseg.py:69)
    eval_split = "val" if args.dataset_name == "shapenetpart" else "test"
    test_ds = build_dataset(args.dataset_name, args, eval_split)

    # prompt classes = the 50 part names (labels.json 'shapenetpart')
    import json

    labels_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "labels.json",
    )
    part_names = json.load(open(labels_path))["shapenetpart"]

    spec = build_prompt_spec(
        part_names,
        n_ctx=args.num_learnable_prompt_tokens,
        class_name_position=args.class_name_position,
        template_init=args.template_init,
    )
    prompts = PromptArrays.from_spec(spec)

    model_spec = build_model(args.model, args)
    model = model_spec.model

    mesh = create_mesh(args.mesh_devices or None, batch_size=args.batch_size)
    sample_pc = jnp.asarray(train_ds.points[:2])
    sample_oh = jnp.eye(16, dtype=jnp.float32)[jnp.asarray(train_ds.labels[:2]) % 16]
    variables = jax.jit(model.init, static_argnames=())(
        jax.random.PRNGKey(args.seed), sample_pc, prompts, cls_onehot=sample_oh
    )
    if args.pretrained_dir and os.path.isdir(args.pretrained_dir):
        from ppt_tpu.train.checkpoint import load_pretrained_backbones

        try:
            variables = load_pretrained_backbones(args, variables)
        except FileNotFoundError:
            log.warning("no converted ckpts under %s", args.pretrained_dir)

    mask = trainable_mask(variables["params"], head_type=args.head_type, task="partseg")
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    sched = cosine_with_warmup(
        args.lr, args.lr_end, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_start_lr=args.lr_start,
    )
    # by-name optimizer so --optim/--grad_norm_clip are honored here
    # like in the cls driver (the train step already threads the
    # Hessian diagonal for adahessian, partseg.py:142)
    from ppt_tpu.train.optim import build_optimizer

    optimizer = build_optimizer(
        args.optim, sched, weight_decay=args.wd, betas=args.betas,
        eps=args.eps, grad_norm_clip=getattr(args, "grad_norm_clip", 0.0),
    )
    state = create_train_state(variables, mask, optimizer, jax.random.PRNGKey(args.seed + 1))
    state = replicate(state, mesh)
    prompts = replicate(prompts, mesh)
    return {
        "train_ds": train_ds,
        "test_ds": test_ds,
        "prompts": prompts,
        "model": model,
        "optimizer": optimizer,
        "state": state,
        "mesh": mesh,
    }


def validate(state, eval_fn, test_ds, prompts, args, mesh) -> Dict[str, float]:
    part_ranges = jnp.asarray(SHAPENETPART_PART_RANGES)
    loader = Loader(test_ds, batch_size=args.batch_size, shuffle=False)
    all_preds, all_labels, all_cats = [], [], []
    for batch in loader:
        valid = batch.pop("valid")
        jbatch = shard_batch(
            {
                "pc": batch["pc"].astype(np.float32),
                "cls_onehot": batch["cls_onehot"],
            },
            mesh,
        )
        logits = eval_fn(state, jbatch, prompts)
        refined = refine_partseg_logits(
            logits, jnp.asarray(batch["category"]), part_ranges
        )
        all_preds.append(np.asarray(refined)[valid])
        all_labels.append(batch["label"][valid])
        all_cats.append(batch["category"][valid])
    preds = jnp.asarray(np.concatenate(all_preds))
    labels = jnp.asarray(np.concatenate(all_labels))
    cats = jnp.asarray(np.concatenate(all_cats))
    ious = partseg_ious(preds, labels, cats, part_ranges, 16)
    return {k: np.asarray(v) for k, v in ious.items()}


def train_loop(args: TaskArgs, ctx) -> Dict[str, float]:
    model, optimizer, state = ctx["model"], ctx["optimizer"], ctx["state"]
    prompts, mesh = ctx["prompts"], ctx["mesh"]
    train_ds, test_ds = ctx["train_ds"], ctx["test_ds"]

    step_fn = make_train_step(
        model, optimizer, smoothing=args.label_smoothing, partseg=True,
        second_order=args.optim.lower() == "adahessian",
    )
    eval_fn = make_eval_step(model, partseg=True)
    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)
    aug_key = jax.random.PRNGKey(args.seed + 2)

    from ppt_tpu.utils.logging_utils import ExperimentLogger

    exp_log = ExperimentLogger(args, task_name="partseg")

    best = {"instance_miou": 0.0}
    best_epoch = -1
    history = []
    for epoch in range(args.start_epoch, args.epochs):
        loader.set_epoch(epoch)
        loss_meter, acc_meter = Meter("loss"), Meter("acc")
        t0 = time.time()
        for batch in loader:
            aug_key, k = jax.random.split(aug_key)
            # NOTE: no point shuffle for partseg (labels are per-point);
            # only the anisotropic scale+shift augmentation applies.
            from ppt_tpu.data.augment import translate_pointcloud

            pc = translate_pointcloud(k, jnp.asarray(batch["pc"]))
            jbatch = shard_batch(
                {
                    "pc": pc,
                    "label": jnp.asarray(batch["label"]),
                    "cls_onehot": jnp.asarray(batch["cls_onehot"]),
                },
                mesh,
            )
            state, metrics = step_fn(state, jbatch, prompts)
            loss_meter.update(float(metrics["loss"]), len(batch["label"]))
            acc_meter.update(float(metrics["acc"]), len(batch["label"]))

        entry = {
            "epoch": epoch,
            "loss": loss_meter.avg,
            "train_acc": acc_meter.avg,
            "epoch_time": time.time() - t0,
        }
        if (epoch % args.eval_freq) == 0 or epoch == args.epochs - 1:
            val = validate(state, eval_fn, test_ds, prompts, args, mesh)
            entry.update(
                {k: float(v) for k, v in val.items() if np.ndim(v) == 0}
            )
            if val["instance_miou"] > best["instance_miou"]:
                best = {k: float(v) for k, v in val.items() if np.ndim(v) == 0}
                best_epoch = epoch
                if args.output_dir:
                    save_checkpoint(
                        os.path.join(args.output_dir, args.exp_name or "partseg"),
                        state,
                        meta={"epoch": epoch, **best},
                    )
        history.append(entry)
        exp_log.log(entry, step=epoch)
        log.info("epoch %d: %s", epoch, entry)

    exp_log.close()
    ctx["state"] = state
    return {"best": best, "best_epoch": best_epoch, "history": history}


def main(args: TaskArgs):
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)  # pod-slice bring-up; no-op single-process
    args.model = args.model if "partseg" in args.model else "ULIP_PointBERT_partseg"
    ctx = setup(args)
    if args.evaluate_3d:
        eval_fn = make_eval_step(ctx["model"], partseg=True)
        val = validate(ctx["state"], eval_fn, ctx["test_ds"], ctx["prompts"], args, ctx["mesh"])
        return {"best": {k: float(v) for k, v in val.items() if np.ndim(v) == 0},
                "best_epoch": -1, "history": []}
    return train_loop(args, ctx)


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
