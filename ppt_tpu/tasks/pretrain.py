"""ULIP contrastive pretraining on ShapeNet-55 triplets.

The capability the reference ships but whose driver it omits: the
``ShapeNet`` dataset (``data/dataset_3d.py:470-653``) pairs each cloud
with a caption built from one of 64 templates (``data/templates.json``)
and trains the point encoder to align with the frozen SLIP text tower via
the symmetric InfoNCE loss (``models/losses.py:14-90``,
``ULIPWithImageLoss``).

Trainable partition: point encoder + pc_projection + logit_scale; text
tower frozen (the ULIP recipe). Caption token tensors for every
(class, template) pair are precomputed once on the host; each step gathers
one per item under a per-epoch template draw — tokenization never appears
in the hot loop.
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
import optax

from ppt_tpu.data import Loader, build_dataset, train_augment
from ppt_tpu.models import build_model, trainable_mask, ulip_contrastive_loss
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.prompt import tokenize
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.train import cosine_with_warmup, create_train_state
from ppt_tpu.train.checkpoint import save_checkpoint
from ppt_tpu.train.trainer import merge_params

log = logging.getLogger(__name__)

TEMPLATES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "templates.json",
)


def build_caption_bank(classnames, template_set: str = "shapenet_64") -> np.ndarray:
    """[C, T, 77] int32 token bank for every (class, template) pair."""
    with open(TEMPLATES_PATH) as f:
        templates = json.load(f)[template_set]
    bank = np.zeros((len(classnames), len(templates), 77), dtype=np.int32)
    for c, name in enumerate(classnames):
        bank[c] = tokenize([t.format(name) for t in templates])
    return bank


def make_pretrain_step(model, optimizer):
    def step(state, batch, tokens):
        rng, k = jax.random.split(state.rng)
        d1, d2 = jax.random.split(k)

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            variables = {"params": params, "batch_stats": state.batch_stats}
            pc_embed, mutated = model.apply(
                variables, batch["pc"], train=True,
                mutable=["batch_stats"],
                rngs={"dropout": d1, "droppath": d2},
                method=model.encode_pc,
            )
            text_embed = model.apply(variables, tokens, method=model.encode_captions)
            logit_scale = jnp.exp(params["logit_scale"])
            out = ulip_contrastive_loss(pc_embed, text_embed, None, logit_scale)
            return out["loss"], (mutated["batch_stats"], out["pc_text_acc"])

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        if "logit_scale" in trainable:
            trainable = dict(trainable)
            trainable["logit_scale"] = jnp.clip(trainable["logit_scale"], 0.0, 4.6052)
        new_state = state.replace(
            step=state.step + 1, trainable=trainable, batch_stats=bs,
            opt_state=opt_state, rng=rng,
        )
        return new_state, {"loss": loss, "pc_text_acc": acc}

    return jax.jit(step, donate_argnums=(0,))


def main(args: TaskArgs) -> Dict:
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)  # pod-slice bring-up; no-op single-process
    args.task = "pretrain"
    if args.dataset_name not in ("shapenet", "synthetic"):
        args.dataset_name = "shapenet"
    train_ds = build_dataset(args.dataset_name, args, "train")
    classnames = train_ds.classnames

    template_set = "shapenet_64"
    bank = build_caption_bank(classnames, template_set)

    model = build_model(args.model, args).model
    mesh = create_mesh(args.mesh_devices or None, batch_size=args.batch_size)
    sample = jnp.asarray(train_ds.points[:2])
    def _init(key, pc):
        return model.init(
            key, pc, None,
            method=lambda m, pc, _=None: (
                m.encode_pc(pc),
                m.encode_captions(jnp.zeros((1, 77), jnp.int32)),
            ),
        )

    variables = jax.jit(_init)(jax.random.PRNGKey(args.seed), sample)
    mask = trainable_mask(variables["params"], task="pretrain")

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    sched = cosine_with_warmup(
        args.lr, args.lr_end, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_start_lr=args.lr_start,
    )
    # by-name optimizer so --optim/--grad_norm_clip are honored; the
    # contrastive pretrain step has no Hessian threading, so adahessian
    # is rejected here (mpm/dvae pretraining do support it)
    if args.optim.lower() == "adahessian":
        raise ValueError(
            "the ULIP contrastive pretrain step does not thread the "
            "Hessian diagonal; use adamw/sgd/lamb/... (adahessian is "
            "supported by the cls/partseg/mpm/dvae drivers)"
        )
    from ppt_tpu.train.optim import build_optimizer

    optimizer = build_optimizer(
        args.optim, sched, weight_decay=args.wd, betas=args.betas,
        eps=args.eps, grad_norm_clip=getattr(args, "grad_norm_clip", 0.0),
    )
    state = create_train_state(variables, mask, optimizer, jax.random.PRNGKey(args.seed + 1))
    state = replicate(state, mesh)

    step_fn = make_pretrain_step(model, optimizer)
    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)
    aug_key = jax.random.PRNGKey(args.seed + 2)
    cap_rng = np.random.RandomState(args.seed + 3)

    history = []
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        losses, accs = [], []
        t0 = time.time()
        for batch in loader:
            aug_key, k = jax.random.split(aug_key)
            pc = train_augment(k, jnp.asarray(batch["pc"]))
            t_idx = cap_rng.randint(0, bank.shape[1], size=len(batch["label"]))
            tokens = bank[batch["label"], t_idx]  # [B, 77]
            jbatch = shard_batch({"pc": pc}, mesh)
            tokens = shard_batch(jnp.asarray(tokens), mesh)
            state, metrics = step_fn(state, jbatch, tokens)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["pc_text_acc"]))
        entry = {
            "epoch": epoch,
            "loss": float(np.mean(losses)),
            "pc_text_acc": float(np.mean(accs)),
            "epoch_time": time.time() - t0,
        }
        history.append(entry)
        log.info("epoch %d: %s", epoch, entry)
        if args.output_dir:
            save_checkpoint(
                os.path.join(args.output_dir, args.exp_name or "pretrain"),
                state, meta={"epoch": epoch, **entry},
            )
    return {"history": history}


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
