"""Optimizer & LR-schedule factories.

Capability parity with the vendored openpoints factories (timm-style
optimizer zoo, ``openpoints/optim/optim_factory.py:216-280`` — adamw,
lamb, lars, adabelief, adafactor, sgd/nesterov/momentum, radam, nadam,
adamax, adadelta, adagrad, novograd, rmsprop, ... — and scheduler zoo,
``openpoints/scheduler/`` — cosine, multistep, step, poly,
plateau-style). Here both map onto optax transforms behind string
names, so configs port directly. Reference names without an optax
equivalent (sgdp/adamp, madgrad, rmsproptf, adahessian, trust-clip
lamb/lars variants, apex fused) raise KeyError with the supported list.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import optax

from ppt_tpu.train.schedules import cosine_with_warmup


def build_schedule(
    name: str,
    base_lr: float,
    epochs: int,
    steps_per_epoch: int,
    *,
    final_lr: float = 0.0,
    warmup_epochs: int = 0,
    warmup_start_lr: float = 0.0,
    milestones: Sequence[int] = (120, 160),
    gamma: float = 0.1,
    power: float = 0.9,
) -> Callable:
    total = epochs * steps_per_epoch
    warm = warmup_epochs * steps_per_epoch
    name = name.lower()
    if name in ("cosine", "coslr"):
        return cosine_with_warmup(
            base_lr, final_lr, epochs, steps_per_epoch,
            warmup_epochs=warmup_epochs, warmup_start_lr=warmup_start_lr,
        )
    if name == "multistep":
        boundaries = {m * steps_per_epoch: gamma for m in milestones}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    elif name == "step":
        sched = optax.exponential_decay(
            base_lr, steps_per_epoch * max(milestones[0], 1), gamma,
            staircase=True,
        )
    elif name == "poly":
        sched = optax.polynomial_schedule(
            base_lr, final_lr, power, total - warm
        )
    elif name == "constant":
        sched = optax.constant_schedule(base_lr)
    elif name in ("cosine_restarts", "sgdr"):
        # CosineAnnealingWarmupRestarts alternative (reference
        # utils/utils.py:268-276): cycles of warmup+cosine, one cycle
        # per `milestones[0]` epochs (default one restart per 120 ep).
        cycle = max(milestones[0], 1) * steps_per_epoch
        n_cycles = max(total // cycle, 1)
        return optax.sgdr_schedule(
            [
                dict(
                    init_value=warmup_start_lr,
                    peak_value=base_lr,
                    warmup_steps=max(warm, 1),
                    decay_steps=cycle,
                    end_value=final_lr,
                )
            ]
            * n_cycles
        )
    elif name in ("tanh", "tanhlr"):
        # timm TanhLRScheduler (openpoints scheduler/tanh_lr.py:83-96):
        # lr = lr_min + (lr_max-lr_min)/2 * (1 - tanh(lb*(1-tr) + ub*tr))
        lb, ub = -7.0, 3.0
        span = max(total - warm, 1)

        def sched(step, _span=span):
            import jax.numpy as jnp

            tr = jnp.clip(step / _span, 0.0, 1.0)
            return final_lr + 0.5 * (base_lr - final_lr) * (
                1.0 - jnp.tanh(lb * (1.0 - tr) + ub * tr)
            )

    else:
        raise KeyError(
            f"unknown schedule {name!r}; supported: cosine multistep step "
            "poly constant tanh cosine_restarts"
        )
    if warm:
        warmup = optax.linear_schedule(warmup_start_lr, base_lr, warm)
        return optax.join_schedules([warmup, sched], [warm])
    return sched


def build_optimizer(
    name: str,
    schedule,
    *,
    weight_decay: float = 0.1,
    betas: Tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-8,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adamw":
        return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    if name == "adam":
        return optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
    if name in ("sgd", "nesterov"):
        # reference 'sgd' is SGD + Nesterov momentum for legacy reasons
        # (openpoints optim_factory.py:216-219); plain momentum is 'momentum'
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum, nesterov=True),
        )
    if name == "momentum":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum),
        )
    if name == "lamb":
        return optax.lamb(schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    if name == "lars":
        return optax.lars(schedule, weight_decay=weight_decay,
                          momentum=momentum)
    if name == "adabelief":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adabelief(schedule, b1=betas[0], b2=betas[1], eps=eps),
        )
    if name == "adafactor":
        return optax.adafactor(schedule, weight_decay_rate=weight_decay)
    if name == "radam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.radam(schedule, b1=betas[0], b2=betas[1], eps=eps),
        )
    if name == "nadam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.nadam(schedule, b1=betas[0], b2=betas[1], eps=eps),
        )
    if name == "adamax":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adamax(schedule, b1=betas[0], b2=betas[1], eps=eps),
        )
    if name == "adadelta":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adadelta(schedule, eps=eps),
        )
    if name == "adagrad":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adagrad(schedule, eps=max(eps, 1e-8)),
        )
    if name in ("novograd", "nvnovograd"):
        return optax.novograd(schedule, b1=betas[0], b2=betas[1], eps=eps,
                              weight_decay=weight_decay)
    if name == "rmsprop":
        # reference uses alpha=0.9 (torch RMSprop smoothing constant)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.rmsprop(schedule, decay=0.9, eps=eps, momentum=momentum),
        )
    raise KeyError(
        f"unknown optimizer {name!r}; supported: adamw adam sgd nesterov "
        "momentum lamb lars adabelief adafactor radam nadam adamax "
        "adadelta adagrad novograd rmsprop"
    )
