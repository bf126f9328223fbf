"""Checkpoint-converter tests: synthetic torch state dicts with the
reference's parameter names convert into trees that (a) fully merge into
our model init and (b) reproduce torch layer outputs numerically."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import traverse_util

from ppt_tpu.models import PromptArrays, Ulip
from ppt_tpu.nn import PointBert, PointBertConfig, TextConfig
from ppt_tpu.nn.text import FusedQKVAttention, TextBlock, causal_mask
from ppt_tpu.prompt import build_prompt_spec
from ppt_tpu.tools.ckpt_convert import (
    convert_pointbert,
    convert_slip_text,
)
from ppt_tpu.train.checkpoint import merge_pretrained


def _count(tree):
    return len(traverse_util.flatten_dict(tree))


def make_slip_state_dict(width=512, layers=12, heads=8, vocab=49408, ctx=77):
    g = torch.Generator().manual_seed(0)
    sd = {
        "token_embedding.weight": torch.randn(vocab, width, generator=g) * 0.02,
        "positional_embedding": torch.randn(ctx, width, generator=g) * 0.01,
        "text_projection": torch.randn(width, 512, generator=g) * width**-0.5,
        "logit_scale": torch.tensor(np.log(1 / 0.07)),
        "ln_final.weight": torch.ones(width),
        "ln_final.bias": torch.zeros(width),
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = torch.randn(3 * width, width, generator=g) * 0.02
        sd[f"{pre}.attn.in_proj_bias"] = torch.randn(3 * width, generator=g) * 0.01
        sd[f"{pre}.attn.out_proj.weight"] = torch.randn(width, width, generator=g) * 0.02
        sd[f"{pre}.attn.out_proj.bias"] = torch.zeros(width)
        sd[f"{pre}.ln_1.weight"] = torch.ones(width)
        sd[f"{pre}.ln_1.bias"] = torch.zeros(width)
        sd[f"{pre}.ln_2.weight"] = torch.ones(width)
        sd[f"{pre}.ln_2.bias"] = torch.zeros(width)
        sd[f"{pre}.mlp.c_fc.weight"] = torch.randn(4 * width, width, generator=g) * 0.02
        sd[f"{pre}.mlp.c_fc.bias"] = torch.zeros(4 * width)
        sd[f"{pre}.mlp.c_proj.weight"] = torch.randn(width, 4 * width, generator=g) * 0.02
        sd[f"{pre}.mlp.c_proj.bias"] = torch.zeros(width)
    return sd


def make_pointbert_state_dict(cfg: PointBertConfig):
    g = torch.Generator().manual_seed(1)
    D, E = cfg.trans_dim, cfg.encoder_dims
    sd = {
        "pc_projection": torch.randn(2 * D, 512, generator=g) * 0.02,
        "point_encoder.encoder.first_conv.0.weight": torch.randn(128, 3, 1, generator=g),
        "point_encoder.encoder.first_conv.0.bias": torch.zeros(128),
        "point_encoder.encoder.first_conv.1.weight": torch.ones(128),
        "point_encoder.encoder.first_conv.1.bias": torch.zeros(128),
        "point_encoder.encoder.first_conv.1.running_mean": torch.zeros(128),
        "point_encoder.encoder.first_conv.1.running_var": torch.ones(128),
        "point_encoder.encoder.first_conv.3.weight": torch.randn(256, 128, 1, generator=g),
        "point_encoder.encoder.first_conv.3.bias": torch.zeros(256),
        "point_encoder.encoder.second_conv.0.weight": torch.randn(512, 512, 1, generator=g),
        "point_encoder.encoder.second_conv.0.bias": torch.zeros(512),
        "point_encoder.encoder.second_conv.1.weight": torch.ones(512),
        "point_encoder.encoder.second_conv.1.bias": torch.zeros(512),
        "point_encoder.encoder.second_conv.1.running_mean": torch.zeros(512),
        "point_encoder.encoder.second_conv.1.running_var": torch.ones(512),
        "point_encoder.encoder.second_conv.3.weight": torch.randn(E, 512, 1, generator=g),
        "point_encoder.encoder.second_conv.3.bias": torch.zeros(E),
        "point_encoder.reduce_dim.weight": torch.randn(D, E, generator=g) * 0.02,
        "point_encoder.reduce_dim.bias": torch.zeros(D),
        "point_encoder.cls_token": torch.zeros(1, 1, D),
        "point_encoder.cls_pos": torch.randn(1, 1, D, generator=g),
        "point_encoder.pos_embed.0.weight": torch.randn(128, 3, generator=g),
        "point_encoder.pos_embed.0.bias": torch.zeros(128),
        "point_encoder.pos_embed.2.weight": torch.randn(D, 128, generator=g),
        "point_encoder.pos_embed.2.bias": torch.zeros(D),
        "point_encoder.norm.weight": torch.ones(D),
        "point_encoder.norm.bias": torch.zeros(D),
    }
    for i in range(cfg.depth):
        pre = f"point_encoder.blocks.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = torch.ones(D)
        sd[f"{pre}.norm1.bias"] = torch.zeros(D)
        sd[f"{pre}.norm2.weight"] = torch.ones(D)
        sd[f"{pre}.norm2.bias"] = torch.zeros(D)
        sd[f"{pre}.attn.qkv.weight"] = torch.randn(3 * D, D, generator=g) * 0.02
        sd[f"{pre}.attn.proj.weight"] = torch.randn(D, D, generator=g) * 0.02
        sd[f"{pre}.attn.proj.bias"] = torch.zeros(D)
        sd[f"{pre}.mlp.fc1.weight"] = torch.randn(4 * D, D, generator=g) * 0.02
        sd[f"{pre}.mlp.fc1.bias"] = torch.zeros(4 * D)
        sd[f"{pre}.mlp.fc2.weight"] = torch.randn(D, 4 * D, generator=g) * 0.02
        sd[f"{pre}.mlp.fc2.bias"] = torch.zeros(D)
    return sd


class TestSlipConversion:
    def test_full_merge_into_model(self):
        sd = make_slip_state_dict()
        tree = convert_slip_text(sd)

        cfg = PointBertConfig(
            trans_dim=48, depth=2, num_heads=4, group_size=8, num_group=16,
            encoder_dims=32,
        )
        model = Ulip(
            point_encoder=PointBert(cfg), pc_feat_dims=96, n_ctx=4,
            text_config=TextConfig(),
        )
        spec = build_prompt_spec(["chair", "car"], n_ctx=4)
        prompts = PromptArrays.from_spec(spec)
        pc = jnp.zeros((1, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), pc, prompts)

        # every converted leaf must land (name + shape) in the model tree
        flat_model = traverse_util.flatten_dict(variables["params"])
        flat_conv = traverse_util.flatten_dict(tree["params"])
        missing = [
            k for k, v in flat_conv.items()
            if k not in flat_model or flat_model[k].shape != v.shape
        ]
        assert not missing, missing

        merged = merge_pretrained(variables, tree)
        got = traverse_util.flatten_dict(merged["params"])
        np.testing.assert_array_equal(
            got[("text", "positional_embedding")],
            sd["positional_embedding"].numpy(),
        )


class TestPointBertConversion:
    def test_full_merge_into_model(self):
        cfg = PointBertConfig()  # full size
        sd = make_pointbert_state_dict(cfg)
        tree = convert_pointbert(sd)

        model = Ulip(
            point_encoder=PointBert(cfg), pc_feat_dims=2 * cfg.trans_dim,
            n_ctx=4, text_config=TextConfig(width=64, layers=1, heads=4, embed_dim=512),
        )
        spec = build_prompt_spec(["chair", "car"], n_ctx=4)
        prompts = PromptArrays.from_spec(spec)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), prompts
        )
        flat_model = traverse_util.flatten_dict(variables["params"])
        flat_conv = traverse_util.flatten_dict(tree["params"])
        missing = [
            k for k, v in flat_conv.items()
            if k not in flat_model or flat_model[k].shape != v.shape
        ]
        assert not missing, missing
        flat_bs_model = traverse_util.flatten_dict(variables["batch_stats"])
        flat_bs_conv = traverse_util.flatten_dict(tree["batch_stats"])
        missing_bs = [
            k for k, v in flat_bs_conv.items()
            if k not in flat_bs_model or flat_bs_model[k].shape != v.shape
        ]
        assert not missing_bs, missing_bs


class TestNumericalParity:
    def test_attention_matches_torch_mha(self):
        """FusedQKVAttention with converted weights == torch
        nn.MultiheadAttention with a causal mask."""
        width, heads, L, B = 64, 4, 10, 3
        mha = torch.nn.MultiheadAttention(width, heads)
        x = torch.randn(L, B, width)
        mask = torch.full((L, L), float("-inf")).triu_(1)
        with torch.no_grad():
            want, _ = mha(x, x, x, need_weights=False, attn_mask=mask)
        want = want.permute(1, 0, 2).numpy()  # -> [B, L, D]

        model = FusedQKVAttention(heads)
        params = {
            "params": {
                "in_proj": {
                    "kernel": mha.in_proj_weight.detach().numpy().T,
                    "bias": mha.in_proj_bias.detach().numpy(),
                },
                "out_proj": {
                    "kernel": mha.out_proj.weight.detach().numpy().T,
                    "bias": mha.out_proj.bias.detach().numpy(),
                },
            }
        }
        xj = jnp.asarray(x.permute(1, 0, 2).numpy())
        got = np.asarray(model.apply(params, xj, jnp.asarray(causal_mask(L))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv1x1_bn_matches_torch(self):
        """torch Conv1d(k=1)+BatchNorm1d (eval) == Dense+BatchNorm with
        converted weights, channels-last."""
        import torch.nn as tnn

        conv = tnn.Conv1d(5, 7, 1)
        bn = tnn.BatchNorm1d(7)
        bn.eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.randn(7) * 0.1)
            bn.running_var.copy_(torch.rand(7) + 0.5)
            bn.weight.copy_(torch.randn(7))
            bn.bias.copy_(torch.randn(7))
        x = torch.randn(2, 5, 11)
        with torch.no_grad():
            want = bn(conv(x)).permute(0, 2, 1).numpy()  # [B, N, 7]

        from flax import linen as nn

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(7, name="conv")(x)
                return nn.BatchNorm(use_running_average=True, name="bn")(x)

        variables = {
            "params": {
                "conv": {
                    "kernel": conv.weight.detach().numpy()[:, :, 0].T,
                    "bias": conv.bias.detach().numpy(),
                },
                "bn": {
                    "scale": bn.weight.detach().numpy(),
                    "bias": bn.bias.detach().numpy(),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": bn.running_mean.numpy(),
                    "var": bn.running_var.numpy(),
                }
            },
        }
        got = np.asarray(
            Block().apply(variables, jnp.asarray(x.permute(0, 2, 1).numpy()))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
