"""Recognition task driver (full-dataset and few-shot classification).

Equivalent of ``main_cls.py:30-305`` / ``main_fewshot.py`` (the loops are
identical; few-shot differs only in dataset construction, which the
dataset registry handles). One process drives the whole mesh; the train
step is jitted once and fed device-sharded batches.

Loop structure parity:
  - per-iteration cosine LR with linear warmup (``main_cls.py:90-91``);
  - label-smoothed CE (``:195``);
  - logit-scale clamp each step (``:213``, inside the jitted step);
  - ``data_ratio`` early-break for data-efficiency runs (``:173-174``);
  - eval every ``eval_freq`` epochs, track best overall accuracy +
    per-class accuracies (``:270-299``);
  - best-only checkpointing of the trainable partition (``:118-137``).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ppt_tpu.data import Loader, build_dataset, train_augment
from ppt_tpu.models import PromptArrays, build_model, trainable_mask
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.prompt import build_prompt_spec
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.train import (
    create_train_state,
    make_cached_text_eval,
    make_eval_step,
    make_train_step,
)
from ppt_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from ppt_tpu.utils.metrics import Meter, per_class_accuracy

log = logging.getLogger(__name__)


def setup(args: TaskArgs):
    """Build dataset/model/state/steps shared by train and evaluate."""
    train_ds = build_dataset(args.dataset_name, args, "train")
    test_ds = build_dataset(args.dataset_name, args, "test")
    if train_ds.name.startswith("synthetic"):
        # synthetic (incl. fallback) datasets carry their own classnames
        classnames = train_ds.classnames
    else:
        classnames = args.load_classnames()

    spec = build_prompt_spec(
        classnames,
        n_ctx=args.num_learnable_prompt_tokens,
        class_name_position=args.class_name_position,
        template_init=args.template_init,
    )
    prompts = PromptArrays.from_spec(spec)

    model_spec = build_model(args.model, args)
    model = model_spec.model

    mesh = create_mesh(args.mesh_devices or None, batch_size=args.batch_size)
    sample = jnp.asarray(train_ds.points[: min(2, len(train_ds))])
    if args.use_height:
        from ppt_tpu.data import append_height

        sample = append_height(sample)
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), sample, prompts)

    if args.pretrained_dir and os.path.isdir(args.pretrained_dir):
        variables = _maybe_load_pretrained(args, variables)

    mask = trainable_mask(
        variables["params"], head_type=args.head_type, task=args.task
    )
    n_train = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda p, m: p if m else None, variables["params"], mask
            )
        )
    )
    log.info("trainable params: %d", n_train)

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    from ppt_tpu.train.optim import build_optimizer, build_schedule

    sched = build_schedule(
        args.sched, args.lr, args.epochs, steps_per_epoch,
        final_lr=args.lr_end, warmup_epochs=args.warmup_epochs,
        warmup_start_lr=args.lr_start,
    )
    optimizer = build_optimizer(
        args.optim, sched, weight_decay=args.wd, betas=args.betas, eps=args.eps,
        plateau_patience_epochs=(
            args.plateau_patience if args.sched == "plateau" else 0
        ),
        steps_per_epoch=steps_per_epoch,
        plateau_factor=args.plateau_factor,
        grad_norm_clip=getattr(args, "grad_norm_clip", 0.0),
    )
    state = create_train_state(
        variables, mask, optimizer, jax.random.PRNGKey(args.seed + 1)
    )
    if args.resume:
        state = load_checkpoint(args.resume, state)
        meta_path = os.path.join(args.resume, "checkpoint_best.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                args.start_epoch = json.load(f).get("epoch", -1) + 1
        log.info("resumed from %s at epoch %d", args.resume, args.start_epoch)
    state = replicate(state, mesh)
    prompts = replicate(prompts, mesh)

    return {
        "classnames": classnames,
        "train_ds": train_ds,
        "test_ds": test_ds,
        "prompts": prompts,
        "model": model,
        "optimizer": optimizer,
        "state": state,
        "mesh": mesh,
        "steps_per_epoch": steps_per_epoch,
        "sched": sched,
    }


def _maybe_load_pretrained(args: TaskArgs, variables):
    """Load converted ULIP/SLIP weights if present (see
    tools/ckpt_convert.py); silently keep random init otherwise."""
    from ppt_tpu.train.checkpoint import load_pretrained_backbones

    try:
        return load_pretrained_backbones(args, variables)
    except FileNotFoundError:
        log.warning("pretrained checkpoints not found under %s; random init",
                    args.pretrained_dir)
        return variables


def validate(
    state, eval_fn, test_ds, prompts, args, mesh, votes: int = 1
) -> Dict[str, float]:
    """Eval loop; ``votes > 1`` averages logits over randomly scaled/
    shifted copies of each batch (the openpoints voting-eval protocol,
    ``examples/classification/train.py`` --vote).

    ``eval_fn`` may be either the plain jitted step or the
    (embed_fn, step_fn) pair from ``make_cached_text_eval`` — with the
    pair the text tower runs once for the whole pass instead of once per
    batch (the embeddings are constant while the state is fixed).
    """
    loader = Loader(test_ds, batch_size=args.batch_size, shuffle=False)
    vote_key = jax.random.PRNGKey(args.seed + 7)
    text_embed = None
    if isinstance(eval_fn, tuple):
        embed_fn, step_fn = eval_fn
        text_embed = embed_fn(state, prompts)
        eval_fn = lambda st, b, pr: step_fn(st, b, text_embed)
    preds, labels = [], []
    for batch in loader:
        valid = batch.pop("valid")
        pc0 = jnp.asarray(batch["pc"].astype(np.float32))
        logits_sum = None
        for v in range(max(votes, 1)):
            pc = pc0
            if v > 0:
                from ppt_tpu.data.augment import translate_pointcloud

                vote_key, k = jax.random.split(vote_key)
                pc = translate_pointcloud(k, pc)
            jbatch = shard_batch({"pc": pc, "label": batch["label"]}, mesh)
            if args.use_height:
                from ppt_tpu.data import append_height

                jbatch["pc"] = append_height(jbatch["pc"])
            logits = np.asarray(eval_fn(state, jbatch, prompts))
            logits_sum = logits if logits_sum is None else logits_sum + logits
        preds.append(np.argmax(logits_sum, -1)[valid])
        labels.append(batch["label"][valid])
    preds = np.concatenate(preds)
    labels = np.concatenate(labels)
    acc = 100.0 * float(np.mean(preds == labels))
    per_class = per_class_accuracy(preds, labels, test_ds.num_classes)
    return {"acc1": acc, "per_class": per_class}


def train_loop(args: TaskArgs, ctx) -> Dict[str, float]:
    model, optimizer, state = ctx["model"], ctx["optimizer"], ctx["state"]
    prompts, mesh = ctx["prompts"], ctx["mesh"]
    train_ds, test_ds = ctx["train_ds"], ctx["test_ds"]

    K = max(args.steps_per_dispatch, 1)
    # adahessian needs the Hutchinson Hessian diagonal threaded into the
    # step (reference: openpoints/optim/adahessian.py set_hessian)
    second_order = args.optim.lower() == "adahessian"
    if K > 1:
        from ppt_tpu.train import make_train_multi_step

        multi_fn = make_train_multi_step(
            model, optimizer, smoothing=args.label_smoothing,
            second_order=second_order,
        )
    step_fn = make_train_step(model, optimizer, smoothing=args.label_smoothing,
                              second_order=second_order)
    eval_fn = make_cached_text_eval(model)
    loader = Loader(
        train_ds, batch_size=args.batch_size, shuffle=True, drop_last=True,
        seed=args.seed,
    )
    aug_key = jax.random.PRNGKey(args.seed + 2)

    from ppt_tpu.utils.logging_utils import ExperimentLogger

    exp_log = ExperimentLogger(args, task_name=args.task)

    best_acc = 0.0
    best_epoch = -1
    history = []
    for epoch in range(args.start_epoch, args.epochs):
        loader.set_epoch(epoch)
        loss_meter, acc_meter = Meter("loss"), Meter("acc")
        t0 = time.time()
        n_batches = len(loader)
        pending = []  # batches awaiting a multi-step dispatch
        for it, batch in enumerate(loader):
            # data-efficiency early break (main_cls.py:173-174)
            if it / max(n_batches, 1) > args.data_ratio:
                break
            aug_key, k = jax.random.split(aug_key)
            pc = jnp.asarray(batch["pc"])
            pc = train_augment(k, pc, use_height=args.use_height)
            jbatch = shard_batch(
                {"pc": pc, "label": jnp.asarray(batch["label"])}, mesh
            )
            if K > 1:
                pending.append(jbatch)
                if len(pending) < K:
                    continue
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pending
                )
                pending = []
                state, metrics = multi_fn(state, stacked, prompts)
                loss_meter.update(
                    float(jnp.mean(metrics["loss"])), K * len(batch["label"])
                )
                acc_meter.update(
                    float(jnp.mean(metrics["acc"])), K * len(batch["label"])
                )
            else:
                state, metrics = step_fn(state, jbatch, prompts)
                loss_meter.update(float(metrics["loss"]), len(batch["label"]))
                acc_meter.update(float(metrics["acc"]), len(batch["label"]))
            if not np.isfinite(loss_meter.avg):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch}"
                )  # reference sys.exit(1), main_cls.py:205-207
        # leftover batches (< K) run through the single-step path
        for jbatch in pending:
            state, metrics = step_fn(state, jbatch, prompts)
            loss_meter.update(float(metrics["loss"]), args.batch_size)
            acc_meter.update(float(metrics["acc"]), args.batch_size)

        entry = {
            "epoch": epoch,
            "loss": loss_meter.avg,
            "train_acc": acc_meter.avg,
            "lr": float(ctx["sched"]((epoch + 1) * ctx["steps_per_epoch"] - 1)),
            "epoch_time": time.time() - t0,
        }
        if (epoch % args.eval_freq) == 0 or epoch == args.epochs - 1:
            val = validate(state, eval_fn, test_ds, prompts, args, mesh,
                           votes=args.votes)
            entry["val_acc1"] = val["acc1"]
            if val["acc1"] > best_acc:
                best_acc = val["acc1"]
                best_epoch = epoch
                if args.output_dir:
                    save_checkpoint(
                        os.path.join(args.output_dir, args.exp_name or "cls"),
                        state,
                        meta={
                            "epoch": epoch,
                            "best_acc": best_acc,
                            "args": {
                                k: v
                                for k, v in vars(args).items()
                                if isinstance(v, (int, float, str, bool))
                            },
                        },
                    )
        history.append(entry)
        exp_log.log(entry, step=epoch)
        log.info("epoch %d: %s", epoch, entry)

    exp_log.close()
    ctx["state"] = state
    return {"best_acc": best_acc, "best_epoch": best_epoch, "history": history}


def main(args: TaskArgs) -> Dict[str, float]:
    logging.basicConfig(level=logging.INFO)
    # pod-slice process bring-up MUST precede first device use
    # (no-op single-process; reference parity: utils.py:104-143)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)
    ctx = setup(args)
    if args.evaluate_3d:
        if args.test_ckpt_addr:
            ctx["state"] = load_checkpoint(args.test_ckpt_addr, ctx["state"])
        eval_fn = make_cached_text_eval(ctx["model"])
        val = validate(
            ctx["state"], eval_fn, ctx["test_ds"], ctx["prompts"], args,
            ctx["mesh"],
        )
        log.info("eval acc1=%.2f", val["acc1"])
        return {"best_acc": val["acc1"], "best_epoch": -1, "history": []}
    return train_loop(args, ctx)


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
