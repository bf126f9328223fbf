"""Text-context truncation is exact.

``PromptArrays.from_spec`` slices the splice tables to ``max(eot)+1``
(rounded to 16) because the CLIP text tower is causal
(reference ``models/ULIP_models.py:224-230``) and pools at the EOT
position (``:219``): every position past the last EOT is dead work.
These tests pin the exactness claim — embeddings AND gradients through
the prompt learner must match the full-77 computation — plus the
bookkeeping (positional-embedding slice, mask slice, param shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppt_tpu.models import PromptArrays, Ulip
from ppt_tpu.nn import PointBert, PointBertConfig, TextConfig
from ppt_tpu.prompt import build_prompt_spec

TINY_BERT = PointBertConfig(
    trans_dim=48, depth=1, num_heads=4, group_size=8, num_group=16,
    encoder_dims=32, drop_path_rate=0.0,
)


def _model(n_ctx):
    return Ulip(
        point_encoder=PointBert(TINY_BERT),
        pc_feat_dims=2 * TINY_BERT.trans_dim,
        n_ctx=n_ctx,
        text_config=TextConfig(width=64, layers=2, heads=4, embed_dim=64),
    )


@pytest.mark.parametrize("position", ["front", "middle", "end"])
def test_truncated_encode_text_matches_full(position):
    classes = ["airplane", "chair", "night stand", "flower pot"]
    spec = build_prompt_spec(classes, n_ctx=6, class_name_position=position)
    full = PromptArrays.from_spec(spec, truncate=False)
    trunc = PromptArrays.from_spec(spec)
    assert trunc.perm_tokens.shape[1] < full.perm_tokens.shape[1]
    # every class's EOT (and therefore every live token) survives the cut
    assert int(spec.eot_pos.max()) < trunc.perm_tokens.shape[1]

    model = _model(6)
    pc = jnp.asarray(np.random.RandomState(0).rand(2, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc, full)

    te_full = model.apply(params, full, method=model.encode_text)
    te_trunc = model.apply(params, trunc, method=model.encode_text)
    np.testing.assert_allclose(
        np.asarray(te_full), np.asarray(te_trunc), rtol=2e-6, atol=2e-6
    )


def test_truncated_gradients_match_full():
    """Grads wrt the learnable prompt tokens — the trainable partition —
    are unchanged by truncation (the training-step consequence)."""
    classes = ["airplane", "chair"]
    spec = build_prompt_spec(classes, n_ctx=4, class_name_position="middle")
    full = PromptArrays.from_spec(spec, truncate=False)
    trunc = PromptArrays.from_spec(spec)

    model = _model(4)
    pc = jnp.asarray(np.random.RandomState(1).rand(2, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc, full)

    def loss(p, prompts):
        te = model.apply(p, prompts, method=model.encode_text)
        return jnp.sum(te * jnp.arange(te.size).reshape(te.shape))

    g_full = jax.grad(loss)(params, full)
    g_trunc = jax.grad(loss)(params, trunc)
    lt_full = g_full["params"]["prompt_learner"]["learnable_tokens"]
    lt_trunc = g_trunc["params"]["prompt_learner"]["learnable_tokens"]
    assert float(jnp.abs(lt_full).max()) > 0  # grads actually flow
    # different context length -> different XLA fusion -> fp32
    # accumulation-order noise; 1e-3 relative is far below any real
    # difference a dropped live token would cause (O(1) relative).
    np.testing.assert_allclose(
        np.asarray(lt_full), np.asarray(lt_trunc), rtol=1e-3, atol=1e-3
    )


def test_param_shapes_unchanged_and_opt_out(monkeypatch):
    """Truncation must not change checkpoint shapes (positional embedding
    stays [context_length, width]); PPT_TEXT_TRUNCATE=0 disables it."""
    classes = ["airplane"]
    spec = build_prompt_spec(classes, n_ctx=4)
    trunc = PromptArrays.from_spec(spec)
    model = _model(4)
    pc = jnp.asarray(np.random.RandomState(2).rand(1, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc, trunc)
    pe = params["params"]["text"]["positional_embedding"]
    assert pe.shape == (77, 64)

    monkeypatch.setenv("PPT_TEXT_TRUNCATE", "0")
    off = PromptArrays.from_spec(spec)
    assert off.perm_tokens.shape[1] == 77


def test_overlong_prompts_rejected():
    from ppt_tpu.nn import TextTransformer

    cfg = TextConfig(width=64, layers=1, heads=4, embed_dim=64)
    model = TextTransformer(cfg)
    x = jnp.zeros((1, 80, 64))
    eot = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="exceeds context_length"):
        model.init(jax.random.PRNGKey(0), x, eot)
