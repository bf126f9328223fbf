"""Backbone + composite-model smoke tests on small configs.

Mirrors the reference's ``small_tests.py`` role (instantiate every
factory, check shapes/param counts) but as a real automated suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from ppt_tpu.models import Ulip, PromptArrays, trainable_mask
from ppt_tpu.nn import (
    PointBert,
    PointBertConfig,
    PointBertPartSeg,
    PointMLP,
    PointNet2Msg,
    PointNet2Ssg,
    PointNext,
    PointNextConfig,
    TextConfig,
    TextTransformer,
)
from ppt_tpu.nn.pointmlp import PointMLPConfig
from ppt_tpu.prompt import build_prompt_spec, ClipTokenizer

TINY_BERT = PointBertConfig(
    trans_dim=96, depth=12, drop_path_rate=0.1, num_heads=6,
    group_size=8, num_group=64, encoder_dims=64,
)


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


def _pc(rng, B=2, N=600, C=3):
    return jnp.asarray(rng.rand(B, N, C).astype(np.float32))


class TestBackbones:
    def test_pointnet2_ssg(self, rng):
        model = PointNet2Ssg()
        pc = _pc(rng)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_pointnet2_msg(self, rng):
        model = PointNet2Msg()
        pc = _pc(rng)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)

    def test_pointmlp(self, rng):
        model = PointMLP(PointMLPConfig())
        pc = _pc(rng, N=256)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_pointnext(self, rng):
        model = PointNext(PointNextConfig())
        pc = _pc(rng, N=256, C=4)  # xyz + height
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_pointbert(self, rng):
        model = PointBert(TINY_BERT)
        pc = _pc(rng, N=256)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 2 * TINY_BERT.trans_dim)
        assert np.isfinite(np.asarray(out)).all()

    def test_pointbert_partseg(self, rng):
        model = PointBertPartSeg(TINY_BERT)
        pc = _pc(rng, N=1024)
        onehot = jnp.asarray(np.eye(16, dtype=np.float32)[[3, 7]])
        params = model.init(jax.random.PRNGKey(0), pc, onehot)
        out = model.apply(params, pc, onehot)
        assert out.shape == (2, 1024, 128)
        assert np.isfinite(np.asarray(out)).all()


class TestTextTower:
    def test_text_forward(self, rng):
        cfg = TextConfig(width=64, layers=2, heads=4, embed_dim=32)
        model = TextTransformer(cfg)
        prompts = jnp.asarray(rng.randn(5, 77, 64).astype(np.float32))
        eot = jnp.asarray(rng.randint(1, 77, size=5))
        params = model.init(jax.random.PRNGKey(0), prompts, eot)
        out = model.apply(params, prompts, eot)
        assert out.shape == (5, 32)

    def test_causality(self, rng):
        """Changing tokens after the EOT must not affect the pooled embed."""
        cfg = TextConfig(width=32, layers=2, heads=2, embed_dim=16)
        model = TextTransformer(cfg)
        prompts = jnp.asarray(rng.randn(1, 77, 32).astype(np.float32))
        eot = jnp.asarray([10])
        params = model.init(jax.random.PRNGKey(0), prompts, eot)
        out1 = model.apply(params, prompts, eot)
        prompts2 = prompts.at[0, 50:, :].set(99.0)
        out2 = model.apply(params, prompts2, eot)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestUlipComposite:
    @pytest.fixture(scope="class")
    def setup_cls(self, tok):
        classes = ["airplane", "chair", "night stand"]
        spec = build_prompt_spec(classes, n_ctx=4, class_name_position="middle", tokenizer=tok)
        cfg = TextConfig(width=512, layers=2, heads=8, embed_dim=512)
        model = Ulip(
            point_encoder=PointBert(TINY_BERT),
            pc_feat_dims=2 * TINY_BERT.trans_dim,
            n_ctx=4,
            text_config=cfg,
        )
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
        prompts = PromptArrays.from_spec(spec)
        params = model.init(jax.random.PRNGKey(0), pc, prompts)
        return model, params, pc, prompts

    def test_logits_shape(self, setup_cls):
        model, params, pc, prompts = setup_cls
        logits = model.apply(params, pc, prompts)
        assert logits.shape == (2, 3)
        assert np.isfinite(np.asarray(logits)).all()

    def test_text_embed_normalized_pc_not(self, setup_cls):
        model, params, pc, prompts = setup_cls
        te = model.apply(params, prompts, method=model.encode_text)
        norms = np.linalg.norm(np.asarray(te), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        pe = model.apply(params, pc, method=model.encode_pc)
        assert not np.allclose(np.linalg.norm(np.asarray(pe), axis=-1), 1.0)

    def test_trainable_mask_prompt_only(self, setup_cls):
        _, params, _, _ = setup_cls
        mask = trainable_mask(params["params"], head_type=0)
        flat = traverse_util.flatten_dict(mask)
        on = [p for p, v in flat.items() if v]
        assert on == [("prompt_learner", "learnable_tokens")]

    def test_trainable_mask_head_types(self, setup_cls):
        _, params, _, _ = setup_cls
        for ht, expect_counts in [(1, 3), (2, 5), (3, 7)]:
            mask = trainable_mask(params["params"], head_type=ht)
            flat = traverse_util.flatten_dict(mask)
            on = {p for p, v in flat.items() if v}
            # prompt + the adapter modules (each Dense has kernel+bias,
            # each norm scale+bias; qkv has kernel only at ht=3)
            assert ("prompt_learner", "learnable_tokens") in on
            adapters = {p for p in on if p[0] == "point_encoder"}
            assert len(adapters) > 0
            for p in adapters:
                assert p[1] == "block_11"

    def test_grads_flow_to_prompt_through_frozen_towers(self, setup_cls):
        model, params, pc, prompts = setup_cls

        def loss_fn(p):
            logits = model.apply(
                {"params": p, "batch_stats": params.get("batch_stats", {})},
                pc,
                prompts,
            )
            return jnp.sum(jax.nn.log_softmax(logits)[:, 0])

        g = jax.grad(loss_fn)(params["params"])
        gl = np.asarray(g["prompt_learner"]["learnable_tokens"])
        assert np.abs(gl).sum() > 0


class TestClassicBackbones:
    def test_pointnet_classic(self, rng):
        from ppt_tpu.nn import PointNetClassic

        model = PointNetClassic()
        pc = _pc(rng, N=256)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_dgcnn(self, rng):
        from ppt_tpu.nn import DgcnnClassifier

        model = DgcnnClassifier(k=8)
        pc = _pc(rng, N=128)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_customized_factory(self, rng):
        """ULIP_CUSTOMIZED template: any encoder producing [B, D] plugs in
        (reference ULIP_models.py:621-658)."""
        from ppt_tpu.models.ulip import ulip_customized
        from ppt_tpu.models import PromptArrays
        from ppt_tpu.nn import PointNetClassic, TextConfig
        from ppt_tpu.prompt import build_prompt_spec

        class Args:
            num_learnable_prompt_tokens = 4
            task = "cls"
            compute_dtype = "float32"
            text_config = TextConfig(width=64, layers=1, heads=4, embed_dim=64)

        spec_m = ulip_customized(Args(), PointNetClassic(), pc_feat_dims=256)
        pspec = build_prompt_spec(["chair", "car"], n_ctx=4)
        prompts = PromptArrays.from_spec(pspec)
        pc = _pc(rng, N=128)
        variables = spec_m.model.init(jax.random.PRNGKey(0), pc, prompts)
        logits = spec_m.model.apply(variables, pc, prompts)
        assert logits.shape == (2, 2)

    def test_factory_threads_compute_dtype_into_encoder(self):
        """Regression: Ulip.dtype only governs the text tower — the
        encoder submodule keeps its construction-time dtype, so the
        factory must clone it with the requested compute dtype. The
        flagship bench silently ran an f32 point tower from round 1
        until round 3 because of exactly this."""
        import jax.numpy as jnp

        from ppt_tpu.models.ulip import build_model
        from ppt_tpu.nn import TextConfig

        class Args:
            num_learnable_prompt_tokens = 4
            task = "cls"
            compute_dtype = "bfloat16"
            text_config = TextConfig(width=64, layers=1, heads=4, embed_dim=64)

        for name in ("ULIP_PointBERT", "ULIP_PN_SSG", "ULIP_PN_NEXT"):
            spec = build_model(name, Args())
            assert spec.model.dtype == jnp.bfloat16
            assert spec.model.point_encoder.dtype == jnp.bfloat16, name


class TestConfusionMatrix:
    def test_metrics(self):
        from ppt_tpu.utils.metrics import ConfusionMatrix

        cm = ConfusionMatrix(3)
        cm.update(np.array([0, 1, 2, 0]), np.array([0, 1, 1, 0]))
        assert cm.overall_accuracy == 75.0
        np.testing.assert_allclose(cm.class_accuracy[:2], [100.0, 50.0])
        assert np.isnan(cm.class_accuracy[2])  # no class-2 support
        assert 0 < cm.miou <= 100


class TestPct:
    def test_pct_forward(self, rng):
        from ppt_tpu.nn import Pct

        model = Pct()
        pc = _pc(rng, N=600)
        params = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(params, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_offset_attention_residual(self, rng):
        from ppt_tpu.nn.pct import OffsetAttention

        model = OffsetAttention(32)
        x = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == x.shape
        # tied q/k weights: only one qk kernel parameter exists
        assert "qk_conv" in params["params"]


def test_split_dense_equals_concat_dense(rng):
    """_SplitDense(g, l) == Dense(concat[g_tiled, l]) with the same fused
    kernel — the checkpoint layout contract."""
    from ppt_tpu.nn.pointbert import _SplitDense

    g = jnp.asarray(rng.randn(2, 4, 6).astype(np.float32))
    l = jnp.asarray(rng.randn(2, 4, 5, 3).astype(np.float32))
    model = _SplitDense(7)
    params = model.init(jax.random.PRNGKey(0), g, l)
    got = np.asarray(model.apply(params, g, l))

    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    tiled = np.broadcast_to(np.asarray(g)[:, :, None, :], (2, 4, 5, 6))
    concat = np.concatenate([tiled, np.asarray(l)], axis=-1)
    want = concat @ kernel + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pointnext_scaled_variants(rng):
    """B/L/XL plans (InvResMLP depth blocks engaged) build and run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ppt_tpu.nn import PointNext, PointNextConfig

    pc = jnp.asarray(rng.rand(2, 256, 4).astype(np.float32))
    for cfg in (PointNextConfig.b(), PointNextConfig.l()):
        small = dataclasses.replace(cfg, width=8)
        model = PointNext(small)
        variables = model.init(jax.random.PRNGKey(0), pc)
        out = model.apply(variables, pc)
        assert out.shape == (2, 256)
        assert np.isfinite(np.asarray(out)).all()
    assert PointNextConfig.xl().width == 64
