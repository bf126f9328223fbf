"""End-to-end training integration: tiny ULIP-PointBERT learns synthetic
classes; only the prompt params move; multi-device sharding works."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ppt_tpu.data import Loader, make_synthetic, train_augment
from ppt_tpu.models import PromptArrays, Ulip, trainable_mask
from ppt_tpu.nn import PointBert, PointBertConfig, TextConfig
from ppt_tpu.parallel import create_mesh, replicate, shard_batch
from ppt_tpu.prompt import ClipTokenizer, build_prompt_spec
from ppt_tpu.train import (
    cosine_with_warmup,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from ppt_tpu.train.trainer import make_optimizer

TINY = PointBertConfig(
    trans_dim=48, depth=12, drop_path_rate=0.0, num_heads=4,
    group_size=8, num_group=32, encoder_dims=32,
)
TEXT = TextConfig(width=512, layers=2, heads=8, embed_dim=512)


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic(num_classes=4, samples_per_class=8, npoints=128)
    tok = ClipTokenizer()
    spec = build_prompt_spec(
        ds.classnames, n_ctx=4, class_name_position="end", tokenizer=tok
    )
    prompts = PromptArrays.from_spec(spec)
    model = Ulip(
        point_encoder=PointBert(TINY),
        pc_feat_dims=2 * TINY.trans_dim,
        n_ctx=4,
        text_config=TEXT,
    )
    pc0 = jnp.asarray(ds.points[:4])
    variables = model.init(jax.random.PRNGKey(0), pc0, prompts)
    mask = trainable_mask(variables["params"], head_type=0)
    sched = cosine_with_warmup(3e-3, 1e-5, 10, 4, warmup_epochs=1, warmup_start_lr=1e-6)
    opt = make_optimizer(sched)

    # the train step donates its state, so each test needs a fresh one —
    # with copied leaves (donation consumes the underlying buffers, which
    # are shared with `variables`)
    def make_state():
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        return create_train_state(fresh, mask, opt, jax.random.PRNGKey(1))

    return ds, prompts, model, opt, make_state


class TestTraining:
    def test_loss_decreases_and_only_prompts_move(self, setup):
        ds, prompts, model, opt, make_state = setup
        state = make_state()
        step_fn = make_train_step(model, opt, smoothing=0.2)
        loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_processes=1, process_index=0)
        frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)
        prompt_before = np.asarray(
            state.trainable["prompt_learner"]["learnable_tokens"]
        )

        losses = []
        for epoch in range(6):
            loader.set_epoch(epoch)
            for batch in loader:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, metrics = step_fn(state, batch, prompts)
                losses.append(float(metrics["loss"]))

        assert np.mean(losses[-4:]) < np.mean(losses[:4])

        # frozen params bit-identical
        frozen_after = jax.tree_util.tree_map(np.asarray, state.frozen)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(frozen_before),
            jax.tree_util.tree_leaves_with_path(frozen_after),
        ):
            np.testing.assert_array_equal(a, b, err_msg=str(pa))
        # prompts moved
        prompt_after = np.asarray(
            state.trainable["prompt_learner"]["learnable_tokens"]
        )
        assert np.abs(prompt_after - prompt_before).max() > 0

        # eval beats chance after training
        eval_fn = make_eval_step(model)
        batch = {
            "pc": jnp.asarray(ds.points),
            "label": jnp.asarray(ds.labels),
        }
        logits = eval_fn(state, batch, prompts)
        acc = np.mean(np.argmax(np.asarray(logits), -1) == ds.labels)
        assert acc > 0.3, acc  # chance = 0.25

    def test_multidevice_sharded_step(self, setup):
        ds, prompts, model, opt, make_state = setup
        state = make_state()
        mesh = create_mesh()
        assert mesh.devices.size == 8
        step_fn = make_train_step(model, opt, smoothing=0.2)
        state_r = replicate(state, mesh)
        prompts_r = replicate(prompts, mesh)
        batch = {
            "pc": ds.points[:16],
            "label": ds.labels[:16],
        }
        batch_s = shard_batch(batch, mesh)
        assert batch_s["pc"].sharding.spec == P("data")
        new_state, metrics = step_fn(state_r, batch_s, prompts_r)
        assert np.isfinite(float(metrics["loss"]))

        # sharded result == single-device result (fresh state: the
        # sharded step donated the previous one)
        state2 = make_state()
        batch_1 = {k: jnp.asarray(v) for k, v in batch.items()}
        new_state_1, metrics_1 = step_fn(state2, batch_1, prompts)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics_1["loss"]), rtol=2e-4
        )

    def test_augment_in_pipeline(self, setup):
        ds, *_ = setup
        pc = jnp.asarray(ds.points[:8])
        out = train_augment(jax.random.PRNGKey(0), pc)
        assert out.shape == pc.shape
        assert not np.allclose(np.asarray(out), np.asarray(pc))
        out_h = train_augment(jax.random.PRNGKey(0), pc, use_height=True)
        assert out_h.shape == (*pc.shape[:2], 4)


class TestShardingRules:
    """ulip_param_spec: exact-component matching (not substrings)."""

    def test_transformer_kernels_shard(self):
        import numpy as np
        from jax.sharding import PartitionSpec as P
        from ppt_tpu.parallel.sharding import ulip_param_spec

        k = np.zeros((8, 8))
        # column-parallel
        assert ulip_param_spec(("text", "block_0", "attn", "in_proj", "kernel"), k) == P(None, "model")
        assert ulip_param_spec(("point_encoder", "block_3", "attn", "qkv", "kernel"), k) == P(None, "model")
        assert ulip_param_spec(("text", "block_0", "c_fc", "kernel"), k) == P(None, "model")
        assert ulip_param_spec(("point_encoder", "block_3", "mlp", "fc1", "kernel"), k) == P(None, "model")
        # row-parallel
        assert ulip_param_spec(("point_encoder", "block_3", "attn", "proj", "kernel"), k) == P("model", None)
        assert ulip_param_spec(("point_encoder", "block_3", "mlp", "fc2", "kernel"), k) == P("model", None)

    def test_non_transformer_modules_replicate(self):
        import numpy as np
        from jax.sharding import PartitionSpec as P
        from ppt_tpu.parallel.sharding import ulip_param_spec

        k = np.zeros((8, 8))
        # 'proj' outside attention (e.g. a pc projection Dense) replicates
        assert ulip_param_spec(("some_head", "proj", "kernel"), k) == P()
        # 'fc1'/'fc2' outside an mlp block (classifier heads) replicate
        assert ulip_param_spec(("head", "fc1", "kernel"), k) == P()
        assert ulip_param_spec(("head", "fc2", "kernel"), k) == P()
        # scalars / biases / 1-d params replicate
        assert ulip_param_spec(("logit_scale",), np.zeros(())) == P()
        assert ulip_param_spec(("text", "block_0", "attn", "qkv", "bias"), np.zeros(8)) == P()

    def test_flagship_tree_pairing(self):
        """Over the real flagship tree: every sharded kernel belongs to a
        transformer block, and column/row counts pair up per block."""
        import numpy as np
        from flax import traverse_util
        from jax.sharding import PartitionSpec as P
        import jax
        from __graft_entry__ import _flagship
        from ppt_tpu.parallel.sharding import ulip_param_spec

        model, prompts = _flagship(tiny=True)
        pts = jnp.asarray(np.zeros((2, 64, 3), np.float32))
        variables = model.init(jax.random.PRNGKey(0), pts, prompts)
        flat = traverse_util.flatten_dict(variables["params"])
        col = row = 0
        for path, leaf in flat.items():
            spec = ulip_param_spec(path, leaf)
            if spec == P(None, "model") and path[-1] == "kernel":
                col += 1
                assert any(p.startswith("block_") for p in path), path
            elif spec == P("model", None):
                row += 1
                assert any(p.startswith("block_") for p in path), path
        assert col > 0 and col == row  # one reduce partner per up-proj
