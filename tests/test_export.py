"""AOT serving export (tools/export.py): serialize/deserialize
round-trip, parity with the live model, baked-weights variant, symbolic
batch dimension, and checkpoint restore into the serving variables."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

import __graft_entry__ as graft
from ppt_tpu.tools.export import (
    _restore_ckpt,
    export_serving,
    load_exported,
    save_exported,
    serving_variables,
)


@pytest.fixture(scope="module")
def tiny():
    model, prompts = graft._flagship(tiny=True)
    pc = jnp.asarray(
        np.random.RandomState(1).rand(4, 128, 3).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:2], prompts)
    ref = np.asarray(model.apply(variables, pc, prompts))
    return model, prompts, variables, pc, ref


def test_roundtrip_matches_apply(tiny, tmp_path):
    """The artifact takes the PRUNED serving tree (text tower baked,
    not shipped) and still reproduces the FULL model's logits."""
    model, prompts, variables, pc, ref = tiny
    exp = export_serving(
        model, variables, prompts, batch=4, npoints=128
    )
    path = os.path.join(tmp_path, "serve.jaxexport")
    save_exported(exp, path)
    loaded = load_exported(path)
    sv = serving_variables(variables)
    assert "text" not in sv["params"] and "prompt_learner" not in sv["params"]
    host_vars = jax.tree_util.tree_map(np.asarray, sv)
    out = np.asarray(loaded.call(host_vars, np.asarray(pc)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # the full tree no longer matches the calling convention
    with pytest.raises((ValueError, TypeError)):
        loaded.call(jax.tree_util.tree_map(np.asarray, variables), np.asarray(pc))


def test_baked_weights_self_contained(tiny, tmp_path):
    model, prompts, variables, pc, ref = tiny
    exp = export_serving(
        model, variables, prompts, batch=4, npoints=128, bake_weights=True
    )
    path = os.path.join(tmp_path, "baked.jaxexport")
    save_exported(exp, path)
    out = np.asarray(load_exported(path).call(np.asarray(pc)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_symbolic_batch(tiny):
    model, prompts, variables, pc, ref = tiny
    exp = export_serving(
        model, variables, prompts, batch=4, npoints=128,
        bake_weights=True, sym_batch=True,
    )
    out4 = np.asarray(exp.call(np.asarray(pc)))
    np.testing.assert_allclose(out4, ref, atol=1e-4)
    out2 = np.asarray(exp.call(np.asarray(pc[:2])))
    np.testing.assert_allclose(out2, ref[:2], atol=1e-4)


def test_cli_main_writes_artifact_weights_meta(tmp_path):
    """The CLI path end-to-end: artifact + weights + meta land on disk
    and the artifact is loadable."""
    from ppt_tpu.tools.export import main

    out = os.path.join(tmp_path, "exp")
    main(["--out", out, "--tiny", "--batch", "2", "--npoints", "128"])
    art = os.path.join(out, "serve_logits.jaxexport")
    assert os.path.getsize(art) > 0
    assert os.path.getsize(os.path.join(out, "weights.msgpack")) > 0
    import json

    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["baked_weights"] is False
    assert meta["platforms"] == ["cpu"]
    assert load_exported(art).in_avals  # deserializes


def test_ckpt_restore_changes_logits(tiny, tmp_path):
    """A checkpoint whose prompt tokens differ must change the exported
    text constant (i.e. the restore really lands in the graph)."""
    model, prompts, variables, pc, ref = tiny
    from ppt_tpu.models import trainable_mask
    from ppt_tpu.train.trainer import partition_params

    mask = trainable_mask(variables["params"], head_type=0)
    trainable, _ = partition_params(variables["params"], mask)
    rng = np.random.RandomState(7)
    # random (not constant) perturbation: a uniform shift of the ctx
    # embeddings sits in the text tower's first LayerNorm null space
    bumped = jax.tree_util.tree_map(
        lambda a: np.asarray(a)
        + 0.25 * rng.standard_normal(np.shape(a)).astype(np.asarray(a).dtype),
        trainable,
    )
    payload = {
        "trainable": bumped,
        "opt_state": {},
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {})
        ),
        "step": np.asarray(7),
    }
    ckpt = os.path.join(tmp_path, "checkpoint_best.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(payload))

    restored = _restore_ckpt(variables, ckpt, head_type=0, task="cls")
    got = np.asarray(
        restored["params"]["prompt_learner"]["learnable_tokens"]
    )
    want = np.asarray(bumped["prompt_learner"]["learnable_tokens"])
    np.testing.assert_allclose(got, want, atol=1e-6)

    exp = export_serving(
        model, restored, prompts, batch=4, npoints=128, bake_weights=True
    )
    out = np.asarray(exp.call(np.asarray(pc)))
    assert np.max(np.abs(out - ref)) > 1e-3, (
        "restored prompt tokens did not change the served logits"
    )
