"""Data-parallel equivalence at FLAGSHIP width (VERDICT r2 weak #6).

``dryrun_multichip`` proves the sharding rules compile and execute on
tiny shapes; this test proves the *numbers* are right at the real model
width: one train step of the full-width ULIP-PointBERT (trans_dim 384,
12 blocks, 512-wide 12-layer text tower — only N and num_group are
shrunk to keep CPU time sane) on a 2-device dp mesh must match the same
step on one device.

SGD is used for the update so the comparison is linear in the gradient
(Adam's m/sqrt(v) normalization turns reduction-order noise on
near-zero grads into sign flips); updated-param equality then implies
grad equality through the psum that GSPMD inserts for the sharded
batch (the reference's scaled_all_reduce, ``utils/utils.py:154-176``).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def _build():
    from ppt_tpu.models import PromptArrays, Ulip, trainable_mask
    from ppt_tpu.nn import PointBert, PointBertConfig, TextConfig
    from ppt_tpu.prompt import build_prompt_spec

    labels = json.load(
        open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "ppt_tpu", "assets", "labels.json",
            )
        )
    )["modelnet40"]
    cfg = PointBertConfig(num_group=32, group_size=16)  # full width/depth
    spec = build_prompt_spec(labels, n_ctx=32, class_name_position="middle")
    prompts = PromptArrays.from_spec(spec)
    model = Ulip(
        point_encoder=PointBert(cfg),
        pc_feat_dims=2 * cfg.trans_dim,
        n_ctx=32,
        text_config=TextConfig(),
        dtype=jnp.float32,
    )
    return model, prompts, trainable_mask


def test_dp2_step_matches_single_device_flagship_width():
    from ppt_tpu.parallel import create_mesh, replicate, shard_batch
    from ppt_tpu.train import create_train_state, make_train_step

    model, prompts, trainable_mask = _build()
    B, N = 4, 128
    rs = np.random.RandomState(0)
    pc = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 40, B))
    batch = {"pc": pc, "label": labels}

    variables = model.init(jax.random.PRNGKey(0), pc[:2], prompts)
    mask = trainable_mask(variables["params"], head_type=3)
    opt = optax.sgd(0.05)

    def fresh_state():
        # deep copy: the train step donates its state, and replicate() on
        # an already-placed tree can alias the original buffers — without
        # the copy, run 2 would read donated (deleted) arrays
        v = jax.tree.map(jnp.array, variables)
        return create_train_state(v, mask, opt, jax.random.PRNGKey(7))

    step_fn = make_train_step(model, opt, smoothing=0.2)

    # single device (trivial 1-device mesh keeps the same code path)
    mesh1 = create_mesh(1)
    s1, m1 = step_fn(
        replicate(fresh_state(), mesh1),
        shard_batch(batch, mesh1),
        replicate(prompts, mesh1),
    )
    loss1, acc1 = float(m1["loss"]), float(m1["acc"])
    t1 = jax.device_get(s1.trainable)

    # dp=2: batch sharded over the data axis, params replicated
    mesh2 = create_mesh(2)
    s2, m2 = step_fn(
        replicate(fresh_state(), mesh2),
        shard_batch(batch, mesh2),
        replicate(prompts, mesh2),
    )
    loss2, acc2 = float(m2["loss"]), float(m2["acc"])
    t2 = jax.device_get(s2.trainable)

    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
    np.testing.assert_allclose(acc2, acc1, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(t1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(t2)}
    assert len(flat1) == len(flat2)
    for key, v1 in flat1:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            flat2[ks], v1, rtol=1e-4, atol=1e-5,
            err_msg=f"dp=2 diverges from single device at {ks}",
        )


def _assert_trees_close(t1, t2, rtol, atol, what):
    flat1 = jax.tree_util.tree_leaves_with_path(t1)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(t2)}
    assert len(flat1) == len(flat2)
    for key, v1 in flat1:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            flat2[ks], v1, rtol=rtol, atol=atol,
            err_msg=f"{what}: dp=2 diverges from single device at {ks}",
        )


def test_dp2_partseg_step_matches_single_device():
    """partseg under dp (VERDICT r4 item 4): one SGD step of the dense
    per-point task on a 2-device mesh must match single-device — the
    spot where the reference needed find_unused_parameters DDP handling
    (``main_partseg.py:46-48``) and where a mis-reduced BatchNorm would
    silently pass the dryrun's loss-finite check. Asserts loss, updated
    trainable params, AND the post-step BN batch_stats (sync-BN: global
    batch statistics regardless of sharding)."""
    import optax

    from ppt_tpu.models import PromptArrays, Ulip, trainable_mask
    from ppt_tpu.nn import PointBertConfig, TextConfig
    from ppt_tpu.nn.pointbert import PointBertPartSeg
    from ppt_tpu.parallel import create_mesh, replicate, shard_batch
    from ppt_tpu.prompt import build_prompt_spec
    from ppt_tpu.train import create_train_state, make_train_step

    cfg = PointBertConfig(
        trans_dim=48, depth=12, num_heads=4, group_size=8, num_group=16,
        encoder_dims=32, drop_path_rate=0.0,
    )  # depth 12: the partseg trunk taps blocks {3,7,11}
    n_parts = 8
    spec = build_prompt_spec(
        [f"part {i}" for i in range(n_parts)], n_ctx=4,
        class_name_position="middle",
    )
    prompts = PromptArrays.from_spec(spec)
    model = Ulip(
        point_encoder=PointBertPartSeg(cfg),
        pc_feat_dims=128,
        n_ctx=4,
        text_config=TextConfig(width=64, layers=2, heads=4, embed_dim=64),
        task="partseg",
    )

    # N=512: the dense trunk FPS-samples a 512-point level — any N<512
    # duplicates points there and the 3-NN inverse-distance weights on
    # d=0 pairs amplify f32 reduction-order noise past tolerance
    B, N = 4, 512
    rs = np.random.RandomState(0)
    pc = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    seg_labels = jnp.asarray(rs.randint(0, n_parts, (B, N)))
    cls_onehot = jnp.asarray(
        np.eye(16, dtype=np.float32)[rs.randint(0, 16, B)]
    )
    batch = {"pc": pc, "label": seg_labels, "cls_onehot": cls_onehot}

    variables = model.init(
        jax.random.PRNGKey(0), pc[:2], prompts, cls_onehot=cls_onehot[:2]
    )
    assert variables.get("batch_stats"), "partseg trunk must carry BN stats"
    mask = trainable_mask(variables["params"], head_type=0, task="partseg")
    opt = optax.sgd(0.05)  # linear in the gradient (see module docstring)

    def fresh_state():
        v = jax.tree.map(jnp.array, variables)
        return create_train_state(v, mask, opt, jax.random.PRNGKey(7))

    step_fn = make_train_step(model, opt, smoothing=0.2, partseg=True)

    results = []
    for n_dev in (1, 2):
        mesh = create_mesh(n_dev)
        s, m = step_fn(
            replicate(fresh_state(), mesh),
            shard_batch(batch, mesh),
            replicate(prompts, mesh),
        )
        results.append((
            float(m["loss"]),
            jax.device_get(s.trainable),
            jax.device_get(s.batch_stats),
        ))
    (loss1, t1, bs1), (loss2, t2, bs2) = results

    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
    _assert_trees_close(t1, t2, rtol=1e-4, atol=1e-5, what="partseg params")
    # batch_stats: a local-batch BN would produce per-shard means
    _assert_trees_close(bs1, bs2, rtol=1e-4, atol=1e-5, what="partseg BN")


def test_dp2_pretrain_step_matches_single_device():
    """Contrastive pretraining under dp (VERDICT r4 item 4): the
    symmetric InfoNCE normalizes its softmax over the GLOBAL batch —
    the bug class the reference's hand-written differentiable
    ``GatherLayer`` exists to avoid (``utils/utils.py:212-250``). A
    local-batch-normalized loss yields a DIFFERENT loss value and
    different encoder gradients under dp=2 (each shard would only see
    B/2 negatives); this asserts loss + updated params match the
    single-device step exactly."""
    import optax

    from ppt_tpu.models import trainable_mask
    from ppt_tpu.parallel import create_mesh, replicate, shard_batch
    from ppt_tpu.tasks.pretrain import make_pretrain_step
    from ppt_tpu.train import create_train_state

    model, prompts, _ = _build_tiny()

    B, N = 4, 64
    rs = np.random.RandomState(0)
    pc = jnp.asarray(rs.rand(B, N, 3).astype(np.float32))
    tokens = np.zeros((B, 77), dtype=np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1] = 320 + np.arange(B)
    tokens[:, 2] = 49407
    tokens = jnp.asarray(tokens)

    variables = model.init(
        jax.random.PRNGKey(0), pc[:2], None,
        method=lambda m, p, _=None: (
            m.encode_pc(p),
            m.encode_captions(jnp.zeros((1, 77), jnp.int32)),
        ),
    )
    mask = trainable_mask(variables["params"], task="pretrain")
    opt = optax.sgd(0.05)

    def fresh_state():
        v = jax.tree.map(jnp.array, variables)
        return create_train_state(v, mask, opt, jax.random.PRNGKey(7))

    step_fn = make_pretrain_step(model, opt)

    results = []
    for n_dev in (1, 2):
        mesh = create_mesh(n_dev)
        s, m = step_fn(
            replicate(fresh_state(), mesh),
            shard_batch({"pc": pc}, mesh),
            shard_batch(tokens, mesh),
        )
        results.append((float(m["loss"]), jax.device_get(s.trainable)))
    (loss1, t1), (loss2, t2) = results

    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5)
    _assert_trees_close(t1, t2, rtol=1e-4, atol=1e-5, what="pretrain params")


def _build_tiny():
    """Tiny cls-model triple for the pretrain dp test (full model is
    overkill — the contrastive-gather semantics are width-independent)."""
    from ppt_tpu.models import PromptArrays, Ulip, trainable_mask
    from ppt_tpu.nn import PointBert, PointBertConfig, TextConfig
    from ppt_tpu.prompt import build_prompt_spec

    cfg = PointBertConfig(
        trans_dim=48, depth=2, num_heads=4, group_size=8, num_group=16,
        encoder_dims=32, drop_path_rate=0.0,
    )
    spec = build_prompt_spec(["chair", "table"], n_ctx=4)
    prompts = PromptArrays.from_spec(spec)
    model = Ulip(
        point_encoder=PointBert(cfg),
        pc_feat_dims=2 * cfg.trans_dim,
        n_ctx=4,
        text_config=TextConfig(width=64, layers=2, heads=4, embed_dim=64),
    )
    return model, prompts, trainable_mask


def test_batchnorm_is_sync_bn_under_dp_sharding():
    """flax BatchNorm inside jit over a dp-sharded batch computes
    GLOBAL batch statistics (GSPMD partitions the mean/var reductions
    and inserts the cross-device all-reduce) — the TPU-native
    equivalent of the reference's opt-in torch SyncBatchNorm
    (openpoints train.py sync-BN flag). Verified: sharded-batch
    running stats == single-device global-batch stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("data",))

    bn = nn.BatchNorm(use_running_average=False, momentum=0.0)
    # momentum 0: running stats become exactly this batch's stats
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)

    def step(v, xb):
        _, mut = bn.apply(v, xb, mutable=["batch_stats"])
        return mut["batch_stats"]

    # single-device global stats
    want = jax.tree.map(np.asarray, jax.jit(step)(variables, x))

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    with mesh:
        got = jax.tree.map(
            np.asarray,
            jax.jit(step)(variables, xs),
        )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            got["batch_stats"][k] if "batch_stats" in got else got[k],
            want["batch_stats"][k] if "batch_stats" in want else want[k],
            rtol=1e-5, atol=1e-6,
        )
