"""Golden tests for the whole-tower fused text kernel
(``kernels/texttower.py``) against the plain XLA TextTransformer —
which is itself HF-CLIP parity-tested (``tests/test_text_parity.py``).

Interpret mode on CPU; the on-chip row lives in
``ppt_tpu.tools.kernel_check``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppt_tpu.nn import TextConfig, TextTransformer


def _tower(rng, C=10, L=16, width=128, layers=2, heads=4, embed=128):
    cfg = TextConfig(
        vocab_size=512, context_length=77, width=width, layers=layers,
        heads=heads, embed_dim=embed,
    )
    model = TextTransformer(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(C, L, width).astype(np.float32))
    eot = jnp.asarray(rng.randint(1, L, C).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), x, eot)
    return model, variables, x, eot


class TestFusedTextTower:
    def test_matches_xla_f32(self, rng, monkeypatch):
        model, variables, x, eot = self._ref = _tower(rng)
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
        want = np.asarray(model.apply(variables, x, eot))
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
        got = np.asarray(model.apply(variables, x, eot))
        # C=10 exercises the pad-to-chunk path (cp=16)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_matches_xla_odd_length(self, rng, monkeypatch):
        # L=24: 8*24=192 not lane-aligned -> pads to Lp=32; padded
        # positions must stay dead (causal mask + zero one-hot)
        model, variables, x, eot = _tower(rng, C=8, L=24)
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
        want = np.asarray(model.apply(variables, x, eot))
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
        got = np.asarray(model.apply(variables, x, eot))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_grads_match_xla_f32(self, rng, monkeypatch):
        """d loss / d prompt_embeds — the ONLY cotangent the train step
        consumes (the tower is frozen; grads flow through the splice to
        the learnable ctx)."""
        model, variables, x, eot = _tower(rng)

        def loss(xx):
            emb = model.apply(variables, xx, eot)
            return jnp.sum(jnp.sin(emb))

        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
        g_want = np.asarray(jax.grad(loss)(x))
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
        g_got = np.asarray(jax.grad(loss)(x))
        scale = np.max(np.abs(g_want)) or 1.0
        assert np.max(np.abs(g_got - g_want)) / scale < 1e-4

    def test_weight_grads_match_xla_f32(self, rng, monkeypatch):
        """WEIGHT cotangents through the fused path must equal the XLA
        path's (they come from the twin's vjp and are dead-code-
        eliminated when the tower is frozen) — a hypothetical
        unfrozen-tower config must never see silent zeros."""
        model, variables, x, eot = _tower(rng)

        def loss(v):
            emb = model.apply(v, x, eot)
            return jnp.sum(jnp.sin(emb))

        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
        g_want = jax.grad(loss)(variables)["params"]
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
        g_got = jax.grad(loss)(variables)["params"]
        flat_w, _ = jax.tree_util.tree_flatten_with_path(g_want)
        flat_g = jax.tree_util.tree_leaves(g_got)
        assert any(float(jnp.max(jnp.abs(w))) > 0 for _, w in flat_w)
        for (path, w), g in zip(flat_w, flat_g):
            scale = float(jnp.max(jnp.abs(w))) or 1.0
            err = float(jnp.max(jnp.abs(g - w))) / scale
            assert err < 1e-4, (jax.tree_util.keystr(path), err)

    def test_bf16_drift_bounded(self, rng, monkeypatch):
        cfg = TextConfig(
            vocab_size=512, context_length=77, width=128, layers=2,
            heads=4, embed_dim=128,
        )
        model = TextTransformer(cfg, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(8, 16, 128).astype(np.float32))
        eot = jnp.asarray(rng.randint(1, 16, 8).astype(np.int32))
        variables = model.init(jax.random.PRNGKey(0), x, eot)
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
        want = np.asarray(model.apply(variables, x, eot)).astype(np.float32)
        monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
        got = np.asarray(model.apply(variables, x, eot)).astype(np.float32)
        scale = np.max(np.abs(want)) or 1.0
        assert np.max(np.abs(got - want)) / scale < 3e-2


def test_ulip_prompt_grads_through_fused_tower(rng, monkeypatch):
    """End-to-end: d loss / d learnable prompt ctx through the fused
    tower's hand-written backward must match the XLA path — the exact
    gradient the prompt-tuning train step consumes."""
    import optax

    from ppt_tpu.models import PromptArrays, Ulip
    from ppt_tpu.nn import PointBert, PointBertConfig
    from ppt_tpu.prompt import build_prompt_spec

    cfg = PointBertConfig(
        trans_dim=48, depth=1, num_heads=4, group_size=8, num_group=16,
        encoder_dims=32, drop_path_rate=0.0,
    )
    model = Ulip(
        point_encoder=PointBert(cfg),
        pc_feat_dims=96,
        n_ctx=4,
        text_config=TextConfig(width=128, layers=2, heads=4, embed_dim=128),
    )
    spec = build_prompt_spec(
        ["chair", "table", "airplane"], n_ctx=4, class_name_position="middle"
    )
    prompts = PromptArrays.from_spec(spec)
    pc = jnp.asarray(np.random.RandomState(0).rand(2, 64, 3), jnp.float32)
    labels = jnp.asarray([0, 2])
    variables = model.init(jax.random.PRNGKey(0), pc, prompts)

    def loss(ctx):
        import flax

        params = flax.core.unfreeze(variables["params"])
        params["prompt_learner"]["learnable_tokens"] = ctx
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pc, prompts,
        )
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    ctx0 = variables["params"]["prompt_learner"]["learnable_tokens"]
    monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "0")
    l_want, g_want = jax.value_and_grad(loss)(ctx0)
    monkeypatch.setenv("PPT_FUSED_TEXT_TOWER", "1")
    l_got, g_got = jax.value_and_grad(loss)(ctx0)
    assert abs(float(l_got) - float(l_want)) < 1e-4
    scale = np.max(np.abs(np.asarray(g_want))) or 1.0
    assert np.max(np.abs(np.asarray(g_got) - np.asarray(g_want))) / scale < 1e-3
