"""dVAE tokenizer pretraining driver.

Trains the PointBERT discrete VAE (``ppt_tpu/nn/dvae.py``) with the
reference's objective (``models/pointbert/dvae.py:301-330``):
coarse+fine per-group Chamfer-L1 reconstruction plus a KL term pushing
mean codebook usage toward uniform, under a Gumbel-softmax temperature
annealed from ``temp_start`` to ``temp_end`` (the PointBERT recipe).

The reference vendors the dVAE but ships no trainer for it; this driver
completes the capability so PointBERT-style tokenizers can be trained
in-framework.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppt_tpu.data import Loader, build_dataset, train_augment
from ppt_tpu.nn.dvae import DiscreteVAE, DvaeConfig, dvae_loss
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.train import cosine_with_warmup
from ppt_tpu.train.checkpoint import save_checkpoint
from ppt_tpu.train.optim import build_optimizer
from ppt_tpu.train.trainer import TrainState

log = logging.getLogger(__name__)


def make_dvae_step(model, optimizer, kl_weight: float = 0.1,
                   second_order: bool = False):
    def step(state: TrainState, batch, temperature):
        rng, gumbel_rng, hess_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            ret, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pc"],
                temperature=temperature,
                train=True,
                mutable=["batch_stats"],
                rngs={"gumbel": gumbel_rng},
            )
            recon, klv = dvae_loss(ret, model.config.num_tokens)
            return recon + kl_weight * klv, (mutated["batch_stats"], recon, klv)

        (loss, (bs, recon, klv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable)
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
        return new_state, {"loss": loss, "recon": recon, "kl": klv}

    return jax.jit(step, donate_argnums=(0,))


def main(args: TaskArgs, config: DvaeConfig | None = None) -> Dict:
    logging.basicConfig(level=logging.INFO)
    from ppt_tpu.parallel import init_multihost

    init_multihost(args)  # pod-slice bring-up; no-op single-process
    args.task = "dvae"
    train_ds = build_dataset(args.dataset_name, args, "train")
    model = DiscreteVAE(
        config or DvaeConfig(),
        dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )

    mesh = create_mesh(args.mesh_devices or None, batch_size=args.batch_size)
    sample = jnp.asarray(train_ds.points[:2])
    variables = jax.jit(
        lambda key, pc: model.init(
            {"params": key, "gumbel": jax.random.PRNGKey(0)}, pc, train=True
        )
    )(jax.random.PRNGKey(args.seed), sample)

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
    step_fn = make_dvae_step(
        model, optimizer,
        second_order=args.optim.lower() == "adahessian",
    )

    loader = Loader(train_ds, batch_size=args.batch_size, shuffle=True,
                    drop_last=True, seed=args.seed)
    aug_key = jax.random.PRNGKey(args.seed + 2)
    temp_start, temp_end = 1.0, 0.0625  # PointBERT anneal endpoints
    total_steps = max(args.epochs * steps_per_epoch, 1)

    history = []
    gstep = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        recons, kls = [], []
        t0 = time.time()
        for batch in loader:
            aug_key, k = jax.random.split(aug_key)
            pc = train_augment(k, jnp.asarray(batch["pc"]))
            jbatch = shard_batch({"pc": pc}, mesh)
            frac = min(gstep / total_steps, 1.0)
            temp = float(temp_start * (temp_end / temp_start) ** frac)
            state, metrics = step_fn(state, jbatch, temp)
            recons.append(float(metrics["recon"]))
            kls.append(float(metrics["kl"]))
            gstep += 1
        entry = {
            "epoch": epoch,
            "recon": float(np.mean(recons)),
            "kl": float(np.mean(kls)),
            "temperature": temp,
            "epoch_time": time.time() - t0,
        }
        history.append(entry)
        log.info("epoch %d: %s", epoch, entry)
        if args.output_dir:
            save_checkpoint(
                os.path.join(args.output_dir, args.exp_name or "dvae"),
                state, meta={"epoch": epoch, **entry},
            )
    return {"history": history}


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
