"""Driver-contract tests: dryrun_multichip executes a full sharded train
step on the CPU test mesh."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_dryrun_multichip_full_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tp_sharding_specs():
    """TP rules shard the right dims and the sharded-vs-replicated loss
    matches."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ppt_tpu.parallel.sharding import ulip_param_spec

    k = jnp.zeros((64, 192))
    assert ulip_param_spec(("text", "block_0", "attn", "in_proj", "kernel"), k) == P(None, "model")
    assert ulip_param_spec(("text", "block_0", "attn", "out_proj", "kernel"), k) == P("model", None)
    assert ulip_param_spec(("point_encoder", "block_1", "mlp", "fc1", "kernel"), k) == P(None, "model")
    assert ulip_param_spec(("point_encoder", "block_1", "mlp", "fc2", "kernel"), k) == P("model", None)
    assert ulip_param_spec(("point_encoder", "norm", "scale"), jnp.zeros((64,))) == P()
    assert ulip_param_spec(("prompt_learner", "learnable_tokens"), jnp.zeros((4, 64))) == P()
