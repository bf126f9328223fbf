"""Generic trainer: partitioned parameters, masked AdamW, jitted steps.

Design (SURVEY.md §7.1): the reference's ``requires_grad=False`` freezing
becomes an explicit parameter *partition* — the loss is differentiated
only with respect to the trainable subset, so XLA never materializes
gradients for the frozen towers (in particular not the [49408, 512] token
embedding the torch autograd would produce). Gradients still flow
*through* the frozen weights, exactly like the reference
(``models/ULIP_models.py:472-507`` + ``main_cls.py:197``).

Data parallelism: the train step is ``jax.jit`` over a mesh; the batch
arrives sharded on the ``data`` axis, parameters replicated. XLA inserts
the gradient psum over ICI — the reference's scaled_all_reduce
(``utils/utils.py:154-176``) has no hand-written equivalent here.

The logit-scale clamp to [0, ln(100)] after each update reproduces
``main_cls.py:213``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from ppt_tpu.models.losses import smoothed_cross_entropy

LOGIT_SCALE_MAX = 4.6052  # ln(100), main_cls.py:213

Params = Dict[str, Any]


def partition_params(params: Params, mask: Params) -> Tuple[Params, Params]:
    """Split a param tree into (trainable, frozen) by a boolean mask tree."""
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return (
        traverse_util.unflatten_dict(train),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable: Params, frozen: Params) -> Params:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


class TrainState(struct.PyTreeNode):
    """Functional training state. ``trainable``/``frozen`` partition the
    model params; only ``trainable`` has optimizer state."""

    step: jax.Array
    trainable: Params
    frozen: Params
    batch_stats: Params
    opt_state: optax.OptState
    rng: jax.Array

    def params(self) -> Params:
        return merge_params(self.trainable, self.frozen)


def make_optimizer(
    schedule: Callable,
    weight_decay: float = 0.1,
    betas: Tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW matching the reference driver's optimizer config
    (``main_cls.py`` AdamW betas (0.9, 0.98), eps 1e-8, wd 0.1)."""
    return optax.adamw(
        learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
        weight_decay=weight_decay,
    )


def create_train_state(
    variables: Params,
    mask: Params,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
) -> TrainState:
    params = variables["params"]
    trainable, frozen = partition_params(params, mask)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(trainable),
        rng=rng,
    )


def _clamp_logit_scale(trainable: Params) -> Params:
    if "logit_scale" in trainable:
        trainable = dict(trainable)
        trainable["logit_scale"] = jnp.clip(
            trainable["logit_scale"], 0.0, LOGIT_SCALE_MAX
        )
    return trainable


def _make_train_step_fn(
    model,
    optimizer: optax.GradientTransformation,
    smoothing: float = 0.0,
    partseg: bool = False,
    second_order: bool = False,
    n_hess_samples: int = 1,
):
    """Unjitted single-step body shared by the jitted single- and
    multi-step trainers.

    ``second_order=True`` (required for adahessian) additionally
    estimates the Hessian diagonal with ``n_hess_samples`` Rademacher
    probes — one ``jax.jvp`` of the gradient function each, the JAX
    form of the reference's ``torch.autograd.grad(grads, params,
    grad_outputs=zs)`` (``openpoints/optim/adahessian.py:96-102``) —
    and threads it to the optimizer as the ``hess`` extra arg.
    """

    # extra-args support lets metric-driven stages (reduce_on_plateau)
    # receive the loss; plain transforms ignore the kwarg. State layout
    # is unchanged, so create_train_state's init stays compatible.
    optimizer = optax.with_extra_args_support(optimizer)

    def train_step(state: TrainState, batch, prompts):
        rng, step_rng = jax.random.split(state.rng)
        dropout_rng, droppath_rng, hess_rng = jax.random.split(step_rng, 3)

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            kwargs = {}
            if partseg:
                kwargs["cls_onehot"] = batch["cls_onehot"]
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pc"],
                prompts,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng, "droppath": droppath_rng},
                **kwargs,
            )
            if partseg:
                flat_logits = logits.reshape(-1, logits.shape[-1])
                flat_labels = batch["label"].reshape(-1)
                loss = smoothed_cross_entropy(flat_logits, flat_labels, smoothing)
                acc = jnp.mean(
                    jnp.argmax(flat_logits, -1) == flat_labels
                )
            else:
                loss = smoothed_cross_entropy(logits, batch["label"], smoothing)
                acc = jnp.mean(jnp.argmax(logits, -1) == batch["label"])
            return loss, (mutated["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.trainable)
        extra = {}
        if second_order:
            from ppt_tpu.train.optim import hutchinson_diag

            grad_fn = lambda t: jax.grad(loss_fn, has_aux=True)(t)[0]  # noqa: E731
            extra["hess"] = hutchinson_diag(
                grad_fn, state.trainable, hess_rng, n_samples=n_hess_samples
            )
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.trainable, value=loss, **extra
        )
        new_trainable = optax.apply_updates(state.trainable, updates)
        new_trainable = _clamp_logit_scale(new_trainable)
        new_state = state.replace(
            step=state.step + 1,
            trainable=new_trainable,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=rng,
        )
        metrics = {"loss": loss, "acc": acc * 100.0}
        return new_state, metrics

    return train_step


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    smoothing: float = 0.0,
    partseg: bool = False,
    second_order: bool = False,
):
    """Build the jitted classification/partseg train step.

    batch: dict with 'pc' [B,N,3], 'label' [B] (cls) or [B,N] (partseg),
    optional 'cls_onehot' [B,16] for partseg. ``prompts`` is the constant
    PromptArrays for the task's classname set.

    Donating the state lets XLA alias the pass-through frozen tree
    (hundreds of MB) instead of copying it into the new state each step.
    """
    return jax.jit(
        _make_train_step_fn(model, optimizer, smoothing, partseg,
                            second_order),
        donate_argnums=(0,),
    )


def make_train_multi_step(
    model,
    optimizer: optax.GradientTransformation,
    smoothing: float = 0.0,
    partseg: bool = False,
    second_order: bool = False,
):
    """Multi-step trainer: one dispatch runs K optimizer steps via
    ``lax.scan`` over stacked batches ``[K, B, ...]``.

    Amortizes per-dispatch overhead (host->device launch + on this
    environment's remote tunnel ~7 ms/step) across K real steps — each
    scan iteration consumes a different batch, so nothing is hoisted.
    Returns per-step metrics ``[K]``.
    """
    single = _make_train_step_fn(model, optimizer, smoothing, partseg,
                                 second_order)

    def multi_step(state: TrainState, batches, prompts):
        def body(carry, batch):
            new_state, metrics = single(carry, batch, prompts)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, batches)
        return state, metrics

    return jax.jit(multi_step, donate_argnums=(0,))


def make_cached_text_eval(model):
    """Split eval for the contrastive cls path: the text tower runs ONCE
    per validation pass (its embeddings are constant while the state is
    fixed), each batch then only pays for the point tower + one matmul.

    The plain ``make_eval_step`` recomputes all C text prompts per batch
    — ~4 ms of the text tower plus dispatch per eval batch wasted on the
    real TPU (VERDICT r1 weak #6).

    Returns (embed_fn(state, prompts) -> [C, E],
             eval_fn(state, batch, text_embed) -> logits).
    """

    def embed_text(state, prompts):
        params = merge_params(state.trainable, state.frozen)
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            prompts,
            method=lambda m, pr: m.encode_text(pr),
        )

    def eval_step(state, batch, text_embed):
        params = merge_params(state.trainable, state.frozen)
        pc_embed = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["pc"],
            method=lambda m, pc: m.encode_pc(pc),
        )
        scale = jnp.exp(params["logit_scale"])
        return scale * pc_embed @ text_embed.T

    return jax.jit(embed_text), jax.jit(eval_step)


def make_eval_step(model, partseg: bool = False):
    """Jitted eval: returns logits (running stats, no dropout)."""

    def eval_step(state: TrainState, batch, prompts):
        params = merge_params(state.trainable, state.frozen)
        kwargs = {}
        if partseg:
            kwargs["cls_onehot"] = batch["cls_onehot"]
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["pc"],
            prompts,
            train=False,
            **kwargs,
        )

    return jax.jit(eval_step)
