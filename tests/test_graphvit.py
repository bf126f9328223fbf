"""GraphVit3d / PointPatchEmbed construction tests.

No torch parity is possible: the reference ``graphvit3d.py`` imports a
``GroupEmbed`` that does not exist anywhere in the openpoints tree (the
file is unimportable dead code upstream — see ppt_tpu/nn/graphvit.py
docstring). These tests pin the structural contract instead: shapes,
jit-ability, readout convention, and the patch-embed bottleneck.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ppt_tpu.nn import GraphVit3d, GraphVit3dConfig, PointPatchEmbed

CFG = GraphVit3dConfig(
    encoder_dim=48, depth=2, num_heads=4, num_groups=16, group_size=8,
    embed_dim=32,
)


def test_patch_embed_shapes(rng):
    m = PointPatchEmbed(num_groups=16, group_size=8, embed_dim=32)
    pts = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), pts)
    center, emb = m.apply(variables, pts)
    assert center.shape == (2, 16, 3)
    assert emb.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_patch_embed_feature_types(rng):
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    for ft in ("dp", "fj", "dp_fj", "df", "dp_df"):
        m = PointPatchEmbed(num_groups=8, group_size=4, embed_dim=16,
                            feature_type=ft)
        variables = m.init(jax.random.PRNGKey(0), pts)
        _, emb = m.apply(variables, pts)
        assert emb.shape == (2, 8, 16), ft


def test_graphvit_forward_and_jit(rng):
    model = GraphVit3d(CFG)
    pts = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    center, tokens = jax.jit(lambda v, p: model.apply(v, p))(variables, pts)
    assert center.shape == (2, 16, 3)
    assert tokens.shape == (2, 17, 48)  # cls + 16 groups


def test_graphvit_cls_feat(rng):
    model = GraphVit3d(CFG)
    pts = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    feat = model.apply(variables, pts, method=GraphVit3d.cls_feat)
    assert feat.shape == (2, 96)  # [cls, max-pool] concat
    assert np.isfinite(np.asarray(feat)).all()


def test_pointvitseg_shapes_and_train(rng):
    from ppt_tpu.nn import GraphVit3dConfig, PointVitSeg, PointVitSegConfig

    cfg = PointVitSegConfig(
        num_classes=5,
        encoder=GraphVit3dConfig(encoder_dim=48, depth=2, num_heads=4,
                                 num_groups=16, group_size=8, embed_dim=32),
        num_points=(256, 64),
        fp_width=32,
    )
    model = PointVitSeg(cfg)
    pts = jnp.asarray(rng.rand(2, 512, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = jax.jit(lambda v, p: model.apply(v, p))(variables, pts)
    assert out.shape == (2, 512, 5)
    assert np.isfinite(np.asarray(out)).all()
    out2, mutated = model.apply(
        variables, pts, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1),
              "droppath": jax.random.PRNGKey(2)},
    )
    assert out2.shape == (2, 512, 5)
    assert jax.tree.leaves(mutated["batch_stats"])


def _np_gelu(x):
    # tanh approximation — flax nn.gelu default (approximate=True)
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)
    ))


def _np_ln(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _np_bn_eval(x, p, s, eps=1e-5):
    return (x - s["mean"]) / np.sqrt(s["var"] + eps) * p["scale"] + p["bias"]


def test_graphvit_full_numpy_golden(rng):
    """Numeric golden of the ENTIRE tiny GraphVit3d forward (eval mode):
    numpy FPS + kNN + both patch-embed conv stages (BN running stats) +
    projection + per-block position injection + pre-norm attention/MLP
    blocks + final LN, compared against model.apply with the extracted
    params. Pins the intended math since no torch parity is possible
    (upstream graphvit3d.py is unimportable dead code — see module
    docstring)."""
    B, n, G, K, E, D, H = 1, 32, 4, 4, 8, 16, 2
    cfg = GraphVit3dConfig(
        encoder_dim=D, depth=2, num_heads=H, num_groups=G, group_size=K,
        embed_dim=E,
    )
    model = GraphVit3d(cfg)
    pts = jnp.asarray(rng.rand(B, n, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(3), pts)
    center_j, tokens_j = model.apply(variables, pts)

    p = jax.tree.map(np.asarray, variables["params"])
    bs = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    ge, ge_bs = p["group_embed"], bs["group_embed"]
    x = np.asarray(pts[0], np.float64)  # [n, 3]

    # --- FPS, start index 0 (sampling_gpu.cu convention) ---
    sel = [0]
    dist = np.full(n, np.inf)
    for _ in range(G - 1):
        dist = np.minimum(dist, ((x - x[sel[-1]]) ** 2).sum(-1))
        sel.append(int(dist.argmax()))
    center = x[sel]  # [G, 3]

    # --- kNN neighbor sets (order-free: the embed max-pools over K) ---
    d2 = ((center[:, None, :] - x[None]) ** 2).sum(-1)  # [G, n]
    nbr = np.argsort(d2, axis=1)[:, :K]  # [G, K]

    dp = x[nbr] - center[:, None, :]
    fj = x[nbr]  # features default to coords
    h = np.concatenate([dp, fj], -1)  # [G, K, 6] dp_fj

    # --- conv stage 1: Dense(no bias)+BN+relu, Dense(bias) ---
    h = h @ ge["conv1_0"]["kernel"]
    h = np.maximum(_np_bn_eval(h, ge["bn1_0"], ge_bs["bn1_0"]), 0)
    h = h @ ge["conv1_1"]["kernel"] + ge["conv1_1"]["bias"]
    pooled = h.max(axis=1, keepdims=True)
    h = np.concatenate([np.broadcast_to(pooled, h.shape), h], -1)
    # --- conv stage 2: Dense(2e no bias)+BN+relu, Dense(e bias), max ---
    h = h @ ge["conv2_0"]["kernel"]
    h = np.maximum(_np_bn_eval(h, ge["bn2_0"], ge_bs["bn2_0"]), 0)
    h = h @ ge["conv2_1"]["kernel"] + ge["conv2_1"]["bias"]
    emb = h.max(axis=1)  # [G, E]

    np.testing.assert_allclose(np.asarray(center_j[0]), center, rtol=1e-5)

    # --- ViT trunk with position injected at EVERY block ---
    tok = emb @ p["proj_layer"]["kernel"] + p["proj_layer"]["bias"]
    pos = _np_gelu(center @ p["pos_embed1"]["kernel"]
                   + p["pos_embed1"]["bias"])
    pos = pos @ p["pos_embed2"]["kernel"] + p["pos_embed2"]["bias"]
    tok = np.concatenate([p["cls_token"][0], tok], 0)  # [1+G, D]
    pos = np.concatenate([p["cls_pos"][0], pos], 0)

    hd = D // H
    for i in range(cfg.depth):
        blk = p[f"block_{i}"]
        z = tok + pos
        # attention: LN -> fused qkv (no bias) -> softmax -> proj(+bias)
        a = _np_ln(z, blk["norm1"]["scale"], blk["norm1"]["bias"])
        qkv = a @ blk["attn"]["qkv"]["kernel"]  # [L, 3D]
        q, k, v = np.split(qkv, 3, -1)
        L = z.shape[0]
        out = np.zeros((L, D))
        for hh in range(H):
            sl = slice(hh * hd, (hh + 1) * hd)
            s = (q[:, sl] @ k[:, sl].T) / np.sqrt(hd)
            s = np.exp(s - s.max(-1, keepdims=True))
            s /= s.sum(-1, keepdims=True)
            out[:, sl] = s @ v[:, sl]
        a = out @ blk["attn"]["proj"]["kernel"] + blk["attn"]["proj"]["bias"]
        z = z + a
        m = _np_ln(z, blk["norm2"]["scale"], blk["norm2"]["bias"])
        m = _np_gelu(m @ blk["mlp"]["fc1"]["kernel"] + blk["mlp"]["fc1"]["bias"])
        m = m @ blk["mlp"]["fc2"]["kernel"] + blk["mlp"]["fc2"]["bias"]
        tok = z + m

    want = _np_ln(tok, p["norm"]["scale"], p["norm"]["bias"])
    np.testing.assert_allclose(
        np.asarray(tokens_j[0]), want, rtol=2e-4, atol=2e-5
    )
