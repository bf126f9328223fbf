"""MaskedPointMAE: masking invariants + loss decreases under training."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ppt_tpu.nn import MaeConfig, MaskedPointMAE, random_patch_masking

CFG = MaeConfig(num_group=16, group_size=8, mask_ratio=0.5,
                encoder_dims=32, trans_dim=48, depth=2, decoder_depth=1,
                num_heads=4)


def test_random_patch_masking_invariants(rng):
    key = jax.random.PRNGKey(0)
    ids_keep, ids_restore, mask = random_patch_masking(key, 16, 0.75, 3)
    assert ids_keep.shape == (3, 4)  # 25% kept
    assert mask.shape == (3, 16)
    m = np.asarray(mask)
    assert (m.sum(1) == 12).all()  # exactly 75% masked
    # kept ids are exactly the zero entries of the mask
    for b in range(3):
        kept = set(np.asarray(ids_keep)[b].tolist())
        assert kept == set(np.nonzero(m[b] == 0)[0].tolist())
    # restore is the inverse shuffle
    rs = np.asarray(ids_restore)
    assert sorted(rs[0].tolist()) == list(range(16))


def test_mae_forward_and_training_step(rng):
    model = MaskedPointMAE(CFG)
    pts = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        pts,
    )
    loss0, pred = model.apply(
        variables, pts, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert pred.shape == (2, 16, 8, 3)
    assert np.isfinite(float(loss0))

    opt = optax.adam(1e-3)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    state = opt.init(params)

    @jax.jit
    def step(params, bs, state, key):
        def loss_fn(p):
            (l, _), mut = MaskedPointMAE(CFG).apply(
                {"params": p, "batch_stats": bs}, pts, train=True,
                mutable=["batch_stats"],
                rngs={"masking": key, "dropout": key, "droppath": key},
            )
            return l, mut["batch_stats"]

        (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, state2 = opt.update(g, state)
        return optax.apply_updates(params, up), new_bs, state2, l

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(10):
        key, k = jax.random.split(key)
        params, bs, state, l = step(params, bs, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0]
