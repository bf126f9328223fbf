"""One-command end-to-end bring-up + parity harness vs the torch reference.

Builds the SAME ULIP prompt-tuning model in both frameworks — the torch
reference from ``/root/reference/models/ULIP_models.py`` and this
framework's ``ppt_tpu.models.Ulip`` — transfers the torch weights through
``ppt_tpu.tools.ckpt_convert``, then runs k identical batches through the
reference's eval path (``ULIP_WITH_IMAGE.forward``,
``models/ULIP_models.py:260-283``) and ours, reporting the max
embedding/logit/loss divergence per step. With ``--sgd_steps`` it also
takes lockstep plain-SGD updates on the learnable prompt tokens in both
frameworks (head_type 0: the prompt-only trainable partition,
``main_cls.py:155-234`` workload) and diffs the loss trajectory.

Synthetic stand-in (runs in this environment, no datasets/weights):

    python -m ppt_tpu.tools.e2e_parity --tiny --steps 3 --sgd_steps 3

``--head_type {0,1,2,3}`` widens the lockstep-SGD trainable partition to
the reference's progressive PointAdapter unfreeze lists
(``ULIP_models.py:461-470``: norm2+mlp.fc2, then norm1+mlp.fc1, then
attn.qkv+attn.proj of block 11 — depth is forced to 12 so the literal
``blocks.11`` names exist). ``--task partseg`` runs the dense per-point
path instead: ``PointTransformer_partseg`` trunk, per-point CE over
flattened logits (``main_partseg.py:213``), and the reference's partseg
freeze rule — prompt_learner plus every point_encoder param absent from
the pretrained cls trunk trains (``ULIP_models.py:550-566``).

Real-data bring-up — the day ``pointbert_ulip2.pt`` / ``slip_base_100ep.pt``
and a dataset exist, accuracy-parity is ONE command:

    python -m ppt_tpu.tools.e2e_parity \\
        --point_ckpt data/pretrained_models/pointbert_ulip2.pt \\
        --slip_ckpt data/initialize_models/slip_base_100ep.pt \\
        --dataset modelnet40 --data_root data/modelnet40_normal_resampled \\
        --steps 5 --batch_size 32 --npoints 1024

Both frameworks run f32 on CPU by default (bit-comparable; pass --tpu to
run OUR side on the TPU instead and measure the bf16 kernel-path drift).
Reference quirks handled: the torch PromptLearner hard-codes ``.cuda()``
(``ULIP_models.py:102``) — patched to identity; the reference tokenizer
needs ftfy/regex (absent here) — replaced by our golden-parity-tested
``ClipTokenizer`` behind the reference's ``SimpleTokenizer`` interface;
FPS start randomness pinned to index 0 in both (the
``test_full_model_parity.py`` convention).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import types

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------------------
# reference import machinery (stubs for deps absent in this env)
# ---------------------------------------------------------------------------


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _EasyDict(dict):
    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            self[k] = _EasyDict(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    __setattr__ = dict.__setitem__


def _install_stubs():
    import torch

    from ppt_tpu.prompt.tokenizer import ClipTokenizer

    _ct = ClipTokenizer()

    class SimpleTokenizer:
        """Reference-interface shim over our ClipTokenizer (parity-pinned
        by 6,403 reference-generated golden fixtures in
        tests/fixtures/tokenizer_goldens*). Single-string calls squeeze
        to [L] exactly like ``utils/tokenizer.py:162-164``."""

        def __init__(self, *a, **k):
            pass

        def encode(self, text):
            return _ct.encode(text)

        def __call__(self, texts, context_length=77):
            single = isinstance(texts, str)
            ids = _ct([texts] if single else list(texts), context_length)
            t = torch.as_tensor(np.asarray(ids), dtype=torch.long)
            return t[0] if single else t

    class _DropPath(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    _stub("easydict", EasyDict=_EasyDict)
    _stub("utils.tokenizer", SimpleTokenizer=SimpleTokenizer)
    _stub("cosine_annealing_warmup", CosineAnnealingWarmupRestarts=object)
    _stub("open3d")
    _stub("torch._six", string_classes=str)
    _stub("ftfy", fix_text=lambda s: s)
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_DropPath)
    _stub("matplotlib")
    _stub("matplotlib.pyplot")
    _stub("mpl_toolkits")
    _stub("mpl_toolkits.mplot3d", Axes3D=object)


@contextlib.contextmanager
def _pinned_fps():
    """Pin torch's random FPS start to index 0 (our convention)."""
    import torch

    orig = torch.randint

    def fixed(low, high, size, **kw):
        return torch.zeros(
            size, dtype=kw.get("dtype", torch.long), device=kw.get("device")
        )

    torch.randint = fixed
    try:
        yield
    finally:
        torch.randint = orig


@contextlib.contextmanager
def _cpu_cuda():
    """The reference PromptLearner hard-codes .cuda() (ULIP_models.py:102)."""
    import torch

    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def _import_reference():
    _install_stubs()
    sys.path.insert(0, REF)
    try:
        import importlib

        ulip_models = importlib.import_module("models.ULIP_models")
        point_encoder_mod = importlib.import_module(
            "models.pointbert.point_encoder"
        )
    finally:
        sys.path.pop(0)
    return ulip_models, point_encoder_mod


# ---------------------------------------------------------------------------
# model pair construction
# ---------------------------------------------------------------------------

_TINY = dict(
    trans_dim=96, depth=3, num_heads=6, group_size=8, num_group=32,
    encoder_dims=64, text_width=128, text_layers=2, text_heads=4,
    embed_dim=64,
)
_FLAGSHIP = dict(
    trans_dim=384, depth=12, num_heads=6, group_size=32, num_group=512,
    encoder_dims=256, text_width=512, text_layers=12, text_heads=8,
    embed_dim=512,
)


def _dims(flags) -> dict:
    dims = dict(_TINY if flags.tiny else _FLAGSHIP)
    if flags.task == "partseg":
        # Not free even in the stand-in: DGCNN_Propagation hardcodes
        # 768->512 / 1024->384 widths (pointnet2_utils.py:382-390) and
        # the trunk taps blocks {3,7,11} (point_encoder.py:326).
        dims.update(trans_dim=384, depth=12)
    elif flags.head_type > 0:
        # the unfreeze lists name ``blocks.11`` literally
        dims["depth"] = 12
    return dims


def _make_cfg(dims):
    """PointTransformer config object from ``_dims`` — the ONE place the
    field set lives (build_torch_model and the partseg freeze-rule trunk
    in ``_torch_trainable_names`` must agree on it exactly, or the
    ckpt-membership freeze test silently mis-partitions)."""

    class Cfg:
        trans_dim = dims["trans_dim"]
        depth = dims["depth"]
        drop_path_rate = 0.0
        cls_dim = 40  # unused by the ULIP trunk (partseg: dead conv2 dim)
        num_heads = dims["num_heads"]
        group_size = dims["group_size"]
        num_group = dims["num_group"]
        encoder_dims = dims["encoder_dims"]

    return Cfg()


def build_torch_model(flags, classnames):
    """The reference ULIP_WITH_IMAGE with a PointTransformer tower —
    ULIP_PointBERT (``ULIP_models.py:443-459``) minus its hard-coded yaml
    path / checkpoint IO, so dims are parameterizable for the synthetic
    stand-in. Returns the eval-mode torch module."""
    import torch

    ulip_models, pe_mod = _import_reference()
    dims = _dims(flags)

    torch.manual_seed(flags.seed)
    if flags.task == "partseg":
        point_encoder = pe_mod.PointTransformer_partseg(
            _make_cfg(dims), args=None
        )
        pc_feat_dims = 128  # ULIP_models.py:530
    else:
        point_encoder = pe_mod.PointTransformer(_make_cfg(dims), args=None)
        pc_feat_dims = 2 * dims["trans_dim"]
    with _cpu_cuda():
        model = ulip_models.ULIP_WITH_IMAGE(
            embed_dim=dims["embed_dim"],
            point_encoder=point_encoder,
            context_length=77,
            vocab_size=49408,
            classnames=list(classnames),
            template_init="",
            class_name_position=flags.class_name_position,
            num_learnable_prompt_tokens=flags.n_ctx,
            transformer_width=dims["text_width"],
            transformer_heads=dims["text_heads"],
            transformer_layers=dims["text_layers"],
            pc_feat_dims=pc_feat_dims,
            device=None,
            task=flags.task,
        )

    if flags.point_ckpt or flags.slip_ckpt:
        _load_reference_ckpts(model, flags)

    # REFERENCE QUIRK: the torch PromptLearner caches its prompt base
    # embedding at construction (``ULIP_models.py:102``) — BEFORE
    # ``initialize_parameters()`` re-inits the token-embedding table
    # (``:192-195``) and before the pretrained SLIP table is copied in
    # (``:484-507``) — so the reference as-written runs its text tower
    # on a base embedded with the PRE-init random table (reproducible
    # only through the global torch seed; the SLIP token embeddings
    # never reach the prompt path). Our framework embeds the prompt
    # base with the CURRENT table every forward — the intended
    # semantics. Refresh the torch cache so both sides implement the
    # intended semantics and the comparison is meaningful.
    with torch.no_grad():
        pl = model.prompt_learner
        pl.embedding = model.token_embedding(pl.tokenized_prompts)
    return model.eval()


def _load_reference_ckpts(model, flags):
    """The reference's name-by-name copy with skips
    (``ULIP_models.py:472-507``): point-ckpt params win, slip fills the
    text tower, prompt_learner/cls_head keep their init."""
    import torch

    def _sd(path):
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        return {k.replace("module.", "", 1): v for k, v in sd.items()}

    point_sd = _sd(flags.point_ckpt) if flags.point_ckpt else {}
    slip_sd = _sd(flags.slip_ckpt) if flags.slip_ckpt else {}
    loaded = 0
    for name, param in model.named_parameters():
        if name == "prompt_learner.learnable_tokens" or "cls_head" in name:
            continue
        src = point_sd.get(name, slip_sd.get(name))
        if src is None:
            print(f"  [warn] {name}: in neither checkpoint, keeping init")
            continue
        param.data.copy_(src.data if hasattr(src, "data") else src)
        loaded += 1
    print(f"loaded {loaded} reference param tensors from checkpoints")


def convert_to_flax(torch_model, task="cls"):
    """Full ULIP state dict -> our variables tree, through the same
    converters the real checkpoint files use (``ckpt_convert.py``)."""
    from flax import traverse_util

    from ppt_tpu.tools.ckpt_convert import (
        _t,
        convert_pointbert,
        convert_pointbert_partseg,
        convert_slip_text,
    )

    sd = {k: v for k, v in torch_model.state_dict().items()}
    conv_pc = convert_pointbert_partseg if task == "partseg" else convert_pointbert
    point_tree = conv_pc(sd)  # point_encoder.* + pc_projection
    text_tree = convert_slip_text(sd)  # text tower + logit_scale

    p = {}
    p.update(traverse_util.flatten_dict(point_tree["params"]))
    p.update(traverse_util.flatten_dict(text_tree["params"]))
    p[("prompt_learner", "learnable_tokens")] = _t(
        sd["prompt_learner.learnable_tokens"]
    )
    s = traverse_util.flatten_dict(point_tree["batch_stats"])
    # COPY every leaf: _t() returns numpy VIEWS of torch storage, and the
    # jax CPU backend zero-copies aligned numpy arrays — without this the
    # lockstep-SGD in-place torch update (tokens -= lr*grad) silently
    # mutates the jax side's weights too (observed: step-0 loss computed
    # with post-update tokens).
    import jax

    return jax.tree.map(
        lambda x: np.array(x),
        {
            "params": traverse_util.unflatten_dict(p),
            "batch_stats": traverse_util.unflatten_dict(s),
        },
    )


def build_our_model(flags, classnames):
    import jax
    import jax.numpy as jnp

    from ppt_tpu.models import PromptArrays, Ulip
    from ppt_tpu.nn import (
        PointBert,
        PointBertConfig,
        PointBertPartSeg,
        TextConfig,
    )
    from ppt_tpu.prompt import build_prompt_spec

    dims = _dims(flags)
    cfg = PointBertConfig(
        trans_dim=dims["trans_dim"], depth=dims["depth"],
        num_heads=dims["num_heads"], group_size=dims["group_size"],
        num_group=dims["num_group"], encoder_dims=dims["encoder_dims"],
        drop_path_rate=0.0,
    )
    text_cfg = TextConfig(
        width=dims["text_width"], layers=dims["text_layers"],
        heads=dims["text_heads"], embed_dim=dims["embed_dim"],
    )
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if flags.task == "partseg":
        encoder, pc_feat_dims = PointBertPartSeg(cfg, dtype=dt), 128
    else:
        encoder, pc_feat_dims = PointBert(cfg, dtype=dt), 2 * dims["trans_dim"]
    model = Ulip(
        point_encoder=encoder,
        pc_feat_dims=pc_feat_dims,
        n_ctx=flags.n_ctx,
        task=flags.task,
        text_config=text_cfg,
        dtype=dt,
    )
    spec = build_prompt_spec(
        classnames, n_ctx=flags.n_ctx,
        class_name_position=flags.class_name_position,
    )
    prompts = PromptArrays.from_spec(spec)
    return model, prompts


# ---------------------------------------------------------------------------
# batch source
# ---------------------------------------------------------------------------


def make_batches(flags, n_classes):
    """k identical (pc, label[, cls_onehot]) numpy batches for both
    frameworks. partseg labels are per-point ([B, N] part ids) plus the
    16-category shape one-hot the dense trunk consumes
    (``main_partseg.py:203-210``)."""
    if flags.dataset == "synthetic":
        rng = np.random.RandomState(flags.seed + 1)
        for _ in range(flags.steps):
            pc = rng.rand(flags.batch_size, flags.npoints, 3).astype(
                np.float32
            )
            if flags.task == "partseg":
                onehot = np.eye(16, dtype=np.float32)[
                    rng.randint(0, 16, flags.batch_size)
                ]
                yield pc, rng.randint(
                    0, n_classes, (flags.batch_size, flags.npoints)
                ), onehot
            else:
                yield pc, rng.randint(0, n_classes, flags.batch_size)
        return
    if flags.task == "partseg":
        raise SystemExit("--task partseg supports --dataset synthetic only")
    from ppt_tpu.data import build_dataset

    ds = build_dataset(flags.dataset, flags, "test")
    for k in range(flags.steps):
        lo = k * flags.batch_size
        idx = np.arange(lo, lo + flags.batch_size) % len(ds)
        yield ds.points[idx].astype(np.float32), ds.labels[idx]


# ---------------------------------------------------------------------------
# the comparison loop
# ---------------------------------------------------------------------------


def _torch_eval(model, pc_np, onehot_np=None):
    """(pc_embed, text_embed, logits) through the reference eval path.
    partseg: pc_embed is per-point [B, N, E], logits [B, N, C]
    (``ULIP_models.py:252-283`` with task='partseg')."""
    import torch

    with _pinned_fps(), torch.no_grad():
        pc = torch.tensor(pc_np)
        if onehot_np is not None:
            pc_embed = model.encode_pc(pc, torch.tensor(onehot_np))
        else:
            pc_embed = model.encode_pc(pc)
        prompts_t = model.prompt_learner()
        text_embed = model.encode_text(prompts_t, model.tokenized_prompts)
        text_embed = text_embed / text_embed.norm(dim=-1, keepdim=True)
        logits = model.logit_scale.exp() * pc_embed @ text_embed.t()
    return pc_embed.numpy(), text_embed.numpy(), logits.numpy()


def _report(name, got, want, worst):
    a = np.abs(got - want)
    rel = a / np.maximum(np.abs(want), 1e-6)
    row = {
        "quantity": name,
        "max_abs": float(a.max()),
        "max_rel": float(rel.max()),
        # the pass/fail scale: logits carry exp(logit_scale) ~ 14x, so
        # an absolute threshold must be relative to the quantity's range
        "ref_scale": float(np.abs(want).max()) or 1.0,
    }
    worst[name] = max(worst.get(name, 0.0), row["max_abs"])
    return row


def run(flags) -> int:
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from ppt_tpu.train.checkpoint import merge_pretrained

    if flags.dataset == "synthetic":
        import os

        assets = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "labels.json",
        )
        classnames = json.load(open(assets))["modelnet40"][: flags.n_classes]
    else:
        from ppt_tpu.tasks.args import TaskArgs

        classnames = TaskArgs(
            dataset_name=flags.dataset, data_root=flags.data_root
        ).load_classnames()
    n_classes = len(classnames)
    print(f"== building torch reference model ({n_classes} classes) ==")
    tmodel = build_torch_model(flags, classnames)

    print("== converting weights + building ppt_tpu model ==")
    model, prompts = build_our_model(flags, classnames)
    tree = convert_to_flax(tmodel, task=flags.task)
    pc0 = np.zeros((2, flags.npoints, 3), np.float32)
    init_extra = (
        (jnp.asarray(np.eye(16, dtype=np.float32)[:2]),)
        if flags.task == "partseg" else ()
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(pc0), prompts, *init_extra
    )
    bs = variables.get("batch_stats", {})
    merged = merge_pretrained(
        {"params": variables["params"], "batch_stats": bs}, tree
    )
    # every torch leaf must have landed: count both sides
    from flax import traverse_util

    n_src = len(traverse_util.flatten_dict(tree["params"]))
    n_dst = len(traverse_util.flatten_dict(merged["params"]))
    print(f"   converted {n_src} torch tensors into {n_dst}-leaf tree")

    @jax.jit
    def ours(v, pc, pr, *extra):
        pc_e = model.apply(
            v, pc, *extra, method=lambda m, x, *e: m.encode_pc(x, *e)
        )
        tx_e = model.apply(v, pr, method=lambda m, p: m.encode_text(p))
        logits = model.apply(v, pc, pr, *extra)
        return pc_e, tx_e, logits

    worst: dict = {}
    failures = 0
    print(f"== {flags.steps} eval batches ==")
    for k, batch in enumerate(make_batches(flags, n_classes)):
        pc_np, label_np = batch[0], batch[1]
        extra_np = batch[2:]  # partseg: (cls_onehot,)
        t_pc, t_tx, t_lg = _torch_eval(tmodel, pc_np, *extra_np)
        j_pc, j_tx, j_lg = ours(
            merged, jnp.asarray(pc_np), prompts,
            *(jnp.asarray(e) for e in extra_np),
        )
        # partseg flattens [B, N, C] logits to per-point CE rows
        # (main_partseg.py:213); cls CE is over [B, C] directly
        t_loss = float(
            torch.nn.functional.cross_entropy(
                torch.tensor(np.asarray(t_lg).reshape(-1, n_classes)),
                torch.tensor(label_np.reshape(-1)),
            )
        )
        j_loss = float(
            optax.softmax_cross_entropy_with_integer_labels(
                np.asarray(j_lg).reshape(-1, n_classes),
                label_np.reshape(-1),
            ).mean()
        )
        rows = [
            _report("pc_embed", np.asarray(j_pc), t_pc, worst),
            _report("text_embed", np.asarray(j_tx), t_tx, worst),
            _report("logits", np.asarray(j_lg), t_lg, worst),
        ]
        loss_diff = abs(j_loss - t_loss)
        worst["loss"] = max(worst.get("loss", 0.0), loss_diff)
        for r in rows:
            ok = r["max_abs"] <= flags.atol + flags.rtol * r["ref_scale"]
            failures += not ok
            print(
                f"  step {k} {r['quantity']:>10}: max_abs {r['max_abs']:.3e} "
                f"max_rel {r['max_rel']:.3e} {'ok' if ok else 'DIVERGED'}"
            )
        ok = loss_diff <= flags.atol
        failures += not ok
        print(
            f"  step {k}       loss: torch {t_loss:.6f} ours {j_loss:.6f} "
            f"diff {loss_diff:.3e} {'ok' if ok else 'DIVERGED'}"
        )

    if flags.sgd_steps:
        failures += _sgd_trajectory(
            flags, tmodel, model, merged, prompts, n_classes
        )

    print(
        "== summary:",
        json.dumps({k: round(v, 8) for k, v in worst.items()}),
        "==",
    )
    print("PARITY OK" if failures == 0 else f"PARITY FAILED ({failures})")
    return 1 if failures else 0


# The reference's progressive PointAdapter unfreeze lists, verbatim
# (``ULIP_models.py:461-470``): head_type>0 adds norm2+mlp.fc2 of block
# 11, >1 adds norm1+mlp.fc1, >2 adds attn.qkv(.weight)+attn.proj.
_UNFREEZE_TORCH = {
    1: [
        "point_encoder.blocks.blocks.11.norm2.weight",
        "point_encoder.blocks.blocks.11.norm2.bias",
        "point_encoder.blocks.blocks.11.mlp.fc2.weight",
        "point_encoder.blocks.blocks.11.mlp.fc2.bias",
    ],
    2: [
        "point_encoder.blocks.blocks.11.norm1.weight",
        "point_encoder.blocks.blocks.11.norm1.bias",
        "point_encoder.blocks.blocks.11.mlp.fc1.weight",
        "point_encoder.blocks.blocks.11.mlp.fc1.bias",
    ],
    3: [
        "point_encoder.blocks.blocks.11.attn.qkv.weight",
        "point_encoder.blocks.blocks.11.attn.proj.weight",
        "point_encoder.blocks.blocks.11.attn.proj.bias",
    ],
}


def _torch_trainable_names(flags, tmodel):
    """The reference's trainable partition, by parameter name.

    cls: prompt tokens + the head_type unfreeze lists
    (``ULIP_models.py:461-470``). partseg: prompt_learner plus every
    point_encoder param NOT present in the pretrained cls trunk — the
    stand-in reproduces the ckpt-membership test by instantiating the
    cls ``PointTransformer`` at the same config and using its key set
    (``ULIP_models.py:550-566``: ``if name in
    pretrain_point_model_params: freeze``)."""
    if flags.task == "partseg":
        _, pe_mod = _import_reference()
        trunk = {
            "point_encoder." + k
            for k in pe_mod.PointTransformer(
                _make_cfg(_dims(flags)), args=None
            ).state_dict()
        }
        return [
            n
            for n, _ in tmodel.named_parameters()
            if n.startswith("prompt_learner")
            or (n.startswith("point_encoder.") and n not in trunk)
        ]
    names = ["prompt_learner.learnable_tokens"]
    for ht, lst in sorted(_UNFREEZE_TORCH.items()):
        if flags.head_type >= ht:
            names += lst
    return names


def _sgd_trajectory(flags, tmodel, model, merged, prompts, n_classes) -> int:
    """Lockstep plain-SGD on the task's trainable partition in both
    frameworks; diffs the loss trajectory. Grads must flow THROUGH the
    frozen towers into the trainable leaves — exactly the path the
    reference trains (``main_cls.py:155-234`` / ``main_partseg.py:213``).
    The partition is the reference's: prompt tokens + head_type unfreeze
    lists (cls) or prompt + non-pretrained point_encoder subtrees
    (partseg); ours comes from :func:`ppt_tpu.models.trainable_mask`, so
    a wrong mask shows up as a trajectory (or param-count) divergence."""
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from flax import traverse_util

    from ppt_tpu.models import trainable_mask

    lr = flags.sgd_lr
    rng = np.random.RandomState(flags.seed + 2)

    named = dict(tmodel.named_parameters())
    train_names = _torch_trainable_names(flags, tmodel)
    tparams = [named[n] for n in train_names]
    for p in tparams:
        p.requires_grad_(True)

    mask = trainable_mask(
        merged["params"], head_type=flags.head_type, task=flags.task
    )
    flat_mask = traverse_util.flatten_dict(mask)
    flat_params = traverse_util.flatten_dict(merged["params"])
    n_ours = sum(
        int(np.prod(np.shape(flat_params[k]))) for k, m in flat_mask.items() if m
    )

    def j_loss_fn(params, pc, labels, extra):
        v2 = dict(merged)
        v2["params"] = params
        logits = model.apply(v2, pc, prompts, *extra)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, n_classes), labels.reshape(-1)
        ).mean()

    j_grad = jax.jit(jax.value_and_grad(j_loss_fn))
    j_params = merged["params"]

    failures = 0
    counted = False
    print(
        f"== {flags.sgd_steps} lockstep SGD steps (lr={lr}, "
        f"task={flags.task}, head_type={flags.head_type}, "
        f"{len(train_names)} torch tensors / {n_ours} scalars ours) =="
    )
    for k in range(flags.sgd_steps):
        pc_np = rng.rand(flags.batch_size, flags.npoints, 3).astype(
            np.float32
        )
        if flags.task == "partseg":
            label_np = rng.randint(
                0, n_classes, (flags.batch_size, flags.npoints)
            )
            extra = (np.eye(16, dtype=np.float32)[
                rng.randint(0, 16, flags.batch_size)
            ],)
        else:
            label_np = rng.randint(0, n_classes, flags.batch_size)
            extra = ()

        with _pinned_fps():
            targs = (torch.tensor(pc_np),) + tuple(
                torch.tensor(e) for e in extra
            )
            logits_t = tmodel(*targs)
            loss_t = torch.nn.functional.cross_entropy(
                logits_t.reshape(-1, n_classes),
                torch.tensor(label_np.reshape(-1)),
            )
        # allow_unused: the reference partseg model carries a dead
        # ``conv2`` head (constructed, never called — point_encoder.py
        # :311 vs :418) whose optimizer update is a no-op there too
        grads_t = torch.autograd.grad(loss_t, tparams, allow_unused=True)
        if not counted:
            n_torch = sum(
                p.numel() for p, g in zip(tparams, grads_t) if g is not None
            )
            if n_torch != n_ours:
                print(
                    f"  PARTITION MISMATCH: torch trains {n_torch} "
                    f"scalars, ours {n_ours}"
                )
                failures += 1
            counted = True
        with torch.no_grad():
            for p, g in zip(tparams, grads_t):
                if g is not None:
                    p -= lr * g
            # the reference PromptLearner embeds its base ONCE at init;
            # only the learnable tokens move, nothing to re-embed

        loss_j, grad_j = j_grad(
            j_params, jnp.asarray(pc_np), jnp.asarray(label_np),
            tuple(jnp.asarray(e) for e in extra),
        )
        j_params = jax.tree.map(
            lambda p, g, m: p - lr * g if m else p, j_params, grad_j, mask
        )

        diff = abs(float(loss_j) - float(loss_t.detach()))
        ok = diff <= flags.atol * 10  # drift compounds across steps
        failures += not ok
        print(
            f"  sgd step {k}: torch loss {float(loss_t.detach()):.6f} "
            f"ours {float(loss_j):.6f} diff {diff:.3e} "
            f"{'ok' if ok else 'DIVERGED'}"
        )
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--tiny", action="store_true",
                    help="small dims (CPU-fast synthetic stand-in)")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--sgd_steps", type=int, default=0)
    ap.add_argument("--sgd_lr", type=float, default=0.05)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--npoints", type=int, default=256)
    ap.add_argument("--n_ctx", type=int, default=8)
    ap.add_argument("--n_classes", type=int, default=8,
                    help="synthetic mode: how many ModelNet40 classnames")
    ap.add_argument("--class_name_position", default="middle",
                    choices=["front", "middle", "end"])
    ap.add_argument("--head_type", type=int, default=0,
                    choices=[0, 1, 2, 3],
                    help="PointAdapter unfreeze level for the lockstep "
                         "SGD (ULIP_models.py:461-470); forces depth=12")
    ap.add_argument("--task", default="cls", choices=["cls", "partseg"],
                    help="partseg: dense per-point path + the reference "
                         "partseg freeze rule (ULIP_models.py:550-566)")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--point_ckpt", default="",
                    help="reference pointbert(_ulip2).pt")
    ap.add_argument("--slip_ckpt", default="",
                    help="reference slip_base_100ep.pt")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--atol", type=float, default=5e-3)
    ap.add_argument("--rtol", type=float, default=2e-3)
    ap.add_argument("--tpu", action="store_true",
                    help="run OUR side on TPU — exercises the full bf16 "
                         "fused-kernel stack vs torch f32; pass wider "
                         "tolerances, e.g. --atol 2e-2 --rtol 2e-2 "
                         "(measured drift: pc_embed ~1e-2 abs, loss "
                         "~2e-2 abs at tiny dims)")
    flags = ap.parse_args(argv)
    if flags.task == "partseg":
        if flags.head_type:
            ap.error("--head_type applies to --task cls only (the "
                     "reference partseg factory ignores it)")
        if flags.npoints < 512:
            # the dense trunk FPS-samples 512- and 256-point levels
            # (point_encoder.py:389-394)
            print(f"[note] partseg needs npoints>=512; {flags.npoints} -> 512")
            flags.npoints = 512

    if not flags.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return run(flags)


if __name__ == "__main__":
    sys.exit(main())
