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
