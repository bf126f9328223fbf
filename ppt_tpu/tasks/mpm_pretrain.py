"""PointBERT masked-point-modeling pretraining driver.

Stage 2 of the PointBERT recipe (stage 1 is ``dvae_pretrain``): a frozen
dVAE tokenizes each FPS/kNN group into a discrete id; the ViT student
sees the group sequence with a random subset replaced by a learnable mask
token and is trained to predict the dVAE ids at the masked positions.
Completes the masked-point pretraining capability the reference vendors
(``openpoints/models/reconstruction/maskedpoint*.py``) without a driver.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppt_tpu.data import Loader, build_dataset, train_augment
from ppt_tpu.nn.dvae import DiscreteVAE, DvaeConfig
from ppt_tpu.nn.mpm import PointBertMPM, dvae_tokenize, mpm_loss, sample_group_mask
from ppt_tpu.nn.pointbert import PointBertConfig, group_points
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.train import cosine_with_warmup
from ppt_tpu.train.checkpoint import save_checkpoint
from ppt_tpu.train.optim import build_optimizer
from ppt_tpu.train.trainer import TrainState

log = logging.getLogger(__name__)


def make_mpm_step(student, dvae, dvae_variables, optimizer, mask_ratio: float,
                  num_group: int, group_size: int,
                  second_order: bool = False):
    def step(state: TrainState, batch):
        rng, mask_rng, dp_rng, hess_rng = jax.random.split(state.rng, 4)
        pc = batch["pc"]
        neighborhood, center = group_points(pc, num_group, group_size)
        targets = dvae_tokenize(dvae, dvae_variables, neighborhood, center)
        mask = sample_group_mask(mask_rng, pc.shape[0], num_group, mask_ratio)

        def loss_fn(params):
            logits, mutated = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                neighborhood, center, mask, train=True,
                mutable=["batch_stats"],
                rngs={"droppath": dp_rng, "dropout": dp_rng},
            )
            loss, acc = mpm_loss(logits, targets, mask)
            return loss, (mutated["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        extra = {}
        if second_order:  # adahessian: Hutchinson Hessian diagonal
            from ppt_tpu.train.optim import hutchinson_diag

            grad_fn = lambda t: jax.grad(loss_fn, has_aux=True)(t)[0]  # noqa: E731
            extra["hess"] = hutchinson_diag(grad_fn, state.trainable, hess_rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable, **extra
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(
            step=state.step + 1, trainable=trainable, batch_stats=bs,
            opt_state=opt_state, rng=rng,
        )
        return new_state, {"loss": loss, "masked_acc": acc * 100.0}

    return jax.jit(step, donate_argnums=(0,))


def main(
    args: TaskArgs,
    config: Optional[PointBertConfig] = None,
    dvae_config: Optional[DvaeConfig] = None,
    mask_ratio: float = 0.4,
) -> Dict:
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)  # pod-slice bring-up; no-op single-process
    args.task = "mpm"
    cfg = config or PointBertConfig()
    dcfg = dvae_config or DvaeConfig(
        group_size=cfg.group_size, num_group=cfg.num_group
    )
    train_ds = build_dataset(args.dataset_name, args, "train")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    dvae = DiscreteVAE(dcfg, dtype=dtype)
    student = PointBertMPM(cfg, num_tokens=dcfg.num_tokens, dtype=dtype)

    sample = jnp.asarray(train_ds.points[:2])
    nb, ct = group_points(sample, cfg.num_group, cfg.group_size)
    dvae_variables = jax.jit(
        lambda key: dvae.init(
            {"params": key, "gumbel": jax.random.PRNGKey(0)}, sample, train=False
        )
    )(jax.random.PRNGKey(args.seed + 10))
    dvae_ckpt = os.path.join(args.output_dir, "dvae", "checkpoint_best.msgpack")
    if os.path.exists(dvae_ckpt):
        import flax.serialization as ser

        with open(dvae_ckpt, "rb") as f:
            payload = ser.msgpack_restore(f.read())
        dvae_variables = {
            "params": payload["trainable"],
            "batch_stats": payload.get("batch_stats", {}),
        }
        log.info("loaded frozen dVAE from %s", dvae_ckpt)
    else:
        log.warning("no trained dVAE at %s; using random tokenizer", dvae_ckpt)

    mesh = create_mesh(args.mesh_devices or None, batch_size=args.batch_size)
    mask0 = sample_group_mask(jax.random.PRNGKey(0), 2, cfg.num_group, mask_ratio)
    variables = jax.jit(
        lambda key: student.init(key, nb, ct, mask0, train=False)
    )(jax.random.PRNGKey(args.seed))

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    sched = cosine_with_warmup(
        args.lr, args.lr_end, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_start_lr=args.lr_start,
    )
    optimizer = build_optimizer(args.optim, sched, weight_decay=args.wd,
                                grad_norm_clip=getattr(args, 'grad_norm_clip', 0.0),
                                betas=args.betas, eps=args.eps)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=variables["params"],
        frozen={},
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        rng=jax.random.PRNGKey(args.seed + 1),
    )
    state = replicate(state, mesh)
    dvae_variables = replicate(dvae_variables, mesh)
    step_fn = make_mpm_step(
        student, dvae, dvae_variables, optimizer, mask_ratio,
        cfg.num_group, cfg.group_size,
        second_order=args.optim.lower() == "adahessian",
    )

    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)
    aug_key = jax.random.PRNGKey(args.seed + 2)
    history = []
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        losses, accs = [], []
        t0 = time.time()
        for batch in loader:
            aug_key, k = jax.random.split(aug_key)
            pc = train_augment(k, jnp.asarray(batch["pc"]))
            jbatch = shard_batch({"pc": pc}, mesh)
            state, metrics = step_fn(state, jbatch)
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["masked_acc"]))
        entry = {
            "epoch": epoch,
            "loss": float(np.mean(losses)),
            "masked_acc": float(np.mean(accs)),
            "epoch_time": time.time() - t0,
        }
        history.append(entry)
        log.info("epoch %d: %s", epoch, entry)
        if args.output_dir:
            save_checkpoint(
                os.path.join(args.output_dir, args.exp_name or "mpm"),
                state, meta={"epoch": epoch, **entry},
            )
    return {"history": history}


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
