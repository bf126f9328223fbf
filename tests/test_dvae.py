"""dVAE tests: shapes, loss behavior, straight-through gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppt_tpu.nn.dvae import DiscreteVAE, DvaeConfig, dvae_loss

TINY = DvaeConfig(
    group_size=8, num_group=16, encoder_dims=32, tokens_dims=32,
    decoder_dims=32, num_tokens=64,
)


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.RandomState(0)
    model = DiscreteVAE(TINY)
    pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        pts, train=True,
    )
    return model, variables, pts


def test_forward_shapes(setup):
    model, variables, pts = setup
    ret = model.apply(variables, pts)
    assert ret["coarse"].shape == (2, 16, 2, 3)  # group_size//4 coarse pts
    assert ret["fine"].shape == (2, 16, 8, 3)
    assert ret["whole_fine"].shape == (2, 16 * 8, 3)
    assert ret["logits"].shape == (2, 16, 64)


def test_losses_finite_and_positive(setup):
    model, variables, pts = setup
    ret = model.apply(variables, pts)
    recon, klv = dvae_loss(ret, TINY.num_tokens)
    assert np.isfinite(float(recon)) and float(recon) > 0
    assert np.isfinite(float(klv)) and float(klv) >= -1e-6


def test_hard_mode_straight_through(setup):
    model, variables, pts = setup

    def loss_fn(params):
        ret, _ = model.apply(
            {**variables, "params": params}, pts, temperature=0.5, hard=True,
            train=True,
            rngs={"gumbel": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        recon, klv = dvae_loss(ret, TINY.num_tokens)
        return recon + klv

    g = jax.grad(loss_fn)(variables["params"])
    cb = np.asarray(g["codebook"])
    assert np.isfinite(cb).all()
    assert np.abs(cb).sum() > 0  # gradients reach the codebook through ST


def test_dvae_pretrain_driver(tmp_path):
    """dVAE trainer end-to-end: reconstruction loss decreases over a few
    epochs of synthetic data."""
    from ppt_tpu.tasks import dvae_pretrain
    from ppt_tpu.tasks.args import TaskArgs

    args = TaskArgs(
        dataset_name="synthetic", npoints=64, batch_size=8, epochs=3,
        warmup_epochs=0, lr=1e-3, output_dir=str(tmp_path),
        exp_name="dvae_smoke", pretrained_dir="",
    )
    args.num_classes = 2
    args.samples_per_class = 8
    result = dvae_pretrain.main(args, config=TINY)
    hist = result["history"]
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["recon"])
    assert hist[-1]["recon"] < hist[0]["recon"]  # reconstruction improves
    assert hist[-1]["temperature"] < 1.0  # annealing active
