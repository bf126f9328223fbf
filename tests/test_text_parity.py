"""Text tower parity vs HuggingFace transformers' CLIPTextModel.

Builds a random-initialized CLIPTextModel (config-only, no downloads)
with quick_gelu activation — the same architecture as the reference's
SLIP text tower — converts its weights into our TextTransformer layout
via the same transforms the ckpt converter uses, and compares the full
per-token hidden states. This pins the whole stack: embeddings + causal
mask + fused-QKV attention + QuickGELU MLP + pre/post LayerNorms.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppt_tpu.nn.text import TextConfig, TextTransformer


def build_hf_model(width=64, layers=2, heads=4, vocab=1000, ctx=77):
    cfg = transformers.CLIPTextConfig(
        vocab_size=vocab,
        hidden_size=width,
        intermediate_size=4 * width,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        max_position_embeddings=ctx,
        hidden_act="quick_gelu",
        eos_token_id=vocab - 1,
    )
    torch.manual_seed(0)
    return transformers.CLIPTextModel(cfg)


def hf_to_ours(hf, width, layers):
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().numpy()

    params = {
        "token_embedding": {
            "embedding": t("text_model.embeddings.token_embedding.weight")
        },
        "positional_embedding": t(
            "text_model.embeddings.position_embedding.weight"
        ),
        "ln_final": {
            "norm": {
                "scale": t("text_model.final_layer_norm.weight"),
                "bias": t("text_model.final_layer_norm.bias"),
            }
        },
        "text_projection": np.eye(width, dtype=np.float32),
    }
    for i in range(layers):
        pre = f"text_model.encoder.layers.{i}"
        in_proj_w = np.concatenate(
            [
                t(f"{pre}.self_attn.q_proj.weight"),
                t(f"{pre}.self_attn.k_proj.weight"),
                t(f"{pre}.self_attn.v_proj.weight"),
            ],
            axis=0,
        )
        in_proj_b = np.concatenate(
            [
                t(f"{pre}.self_attn.q_proj.bias"),
                t(f"{pre}.self_attn.k_proj.bias"),
                t(f"{pre}.self_attn.v_proj.bias"),
            ]
        )
        params[f"block_{i}"] = {
            "ln_1": {"norm": {
                "scale": t(f"{pre}.layer_norm1.weight"),
                "bias": t(f"{pre}.layer_norm1.bias"),
            }},
            "ln_2": {"norm": {
                "scale": t(f"{pre}.layer_norm2.weight"),
                "bias": t(f"{pre}.layer_norm2.bias"),
            }},
            "attn": {
                "in_proj": {"kernel": in_proj_w.T, "bias": in_proj_b},
                "out_proj": {
                    "kernel": t(f"{pre}.self_attn.out_proj.weight").T,
                    "bias": t(f"{pre}.self_attn.out_proj.bias"),
                },
            },
            "c_fc": {
                "kernel": t(f"{pre}.mlp.fc1.weight").T,
                "bias": t(f"{pre}.mlp.fc1.bias"),
            },
            "c_proj": {
                "kernel": t(f"{pre}.mlp.fc2.weight").T,
                "bias": t(f"{pre}.mlp.fc2.bias"),
            },
        }
    return {"params": params}


def test_text_tower_matches_hf_clip():
    width, layers, heads, vocab, ctx = 64, 2, 4, 1000, 77
    hf = build_hf_model(width, layers, heads, vocab, ctx)
    hf.eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(1, vocab - 1, size=(3, ctx))
    ids[:, -1] = vocab - 1  # eos somewhere: put at the end
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()

    ours = TextTransformer(
        TextConfig(vocab_size=vocab, context_length=ctx, width=width,
                   layers=layers, heads=heads, embed_dim=width)
    )
    variables = hf_to_ours(hf, width, layers)

    # drive our full pipeline but read per-token states: embed + forward;
    # pooling at position p recovers hidden state at p (projection = I)
    embeds = np.asarray(
        ours.apply(variables, jnp.asarray(ids), method=ours.embed)
    )
    for pos in (0, 5, ctx - 1):
        pooled = ours.apply(
            variables,
            jnp.asarray(embeds),
            jnp.full((3,), pos, dtype=jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(pooled), hf_out[:, pos, :], rtol=2e-3, atol=2e-4,
            err_msg=f"position {pos}",
        )
