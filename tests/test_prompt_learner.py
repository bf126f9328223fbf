"""PromptLearner splice tests: the vectorized select must reproduce the
reference's per-class concatenation semantics for all three positions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppt_tpu.prompt import ClipTokenizer, PromptLearner, build_prompt_spec


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


CLASSES = ["airplane", "night stand", "flower pot", "car"]


def reference_splice(spec, embedding, learnable, position):
    """Oracle: transcription of the reference's per-class concat loop
    (models/ULIP_models.py:104-151) in numpy."""
    C, L, D = embedding.shape
    n_ctx = spec.n_ctx
    half = n_ctx // 2
    prefix = embedding[:, :1]
    suffix = embedding[:, 1 + n_ctx :]
    out = np.zeros_like(embedding)
    for c in range(C):
        ln = int(spec.name_lengths[c])
        if position == "front":
            parts = [prefix[c], suffix[c][:ln], learnable, suffix[c][ln:]]
        elif position == "middle":
            parts = [
                prefix[c],
                learnable[:half],
                suffix[c][:ln],
                learnable[half:],
                suffix[c][ln:],
            ]
        else:
            parts = [prefix[c], learnable, suffix[c]]
        out[c] = np.concatenate(parts, axis=0)
    return out


@pytest.mark.parametrize("position", ["front", "middle", "end"])
def test_splice_matches_reference(tok, position):
    n_ctx = 6
    spec = build_prompt_spec(CLASSES, n_ctx=n_ctx, class_name_position=position, tokenizer=tok)
    rng = np.random.RandomState(0)
    # fake embedding table: deterministic function of the token id
    table = rng.randn(49408, 8).astype(np.float32)
    embedding = table[spec.tokens]  # [C, L, 8] — unrearranged
    base = table[spec.perm_tokens]  # rearranged base

    model = PromptLearner(n_ctx=n_ctx, width=8)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(base), jnp.asarray(spec.ctx_mask), jnp.asarray(spec.ctx_idx))
    learnable = np.asarray(params["params"]["learnable_tokens"])

    got = np.asarray(
        model.apply(params, jnp.asarray(base), jnp.asarray(spec.ctx_mask), jnp.asarray(spec.ctx_idx))
    )
    want = reference_splice(spec, embedding, learnable, position)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_eot_positions(tok):
    spec = build_prompt_spec(CLASSES, n_ctx=4, class_name_position="middle", tokenizer=tok)
    # EOT position = 1 (SOT) + n_ctx + name_len + 1 (period)
    want = 1 + 4 + spec.name_lengths + 1
    np.testing.assert_array_equal(spec.eot_pos, want)


def test_template_init_sets_n_ctx(tok):
    spec = build_prompt_spec(
        CLASSES, n_ctx=32, class_name_position="end",
        template_init="a_point_cloud_of", tokenizer=tok,
    )
    assert spec.n_ctx == 4  # word count of the template


def test_grads_only_touch_ctx_positions(tok):
    n_ctx = 4
    spec = build_prompt_spec(CLASSES, n_ctx=n_ctx, class_name_position="end", tokenizer=tok)
    base = jnp.zeros((len(CLASSES), 77, 8))
    model = PromptLearner(n_ctx=n_ctx, width=8)
    params = model.init(jax.random.PRNGKey(0), base, jnp.asarray(spec.ctx_mask), jnp.asarray(spec.ctx_idx))

    def loss(p):
        out = model.apply(p, base, jnp.asarray(spec.ctx_mask), jnp.asarray(spec.ctx_idx))
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)["params"]["learnable_tokens"]
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
