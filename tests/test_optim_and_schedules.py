"""Optimizer/schedule factory tests + cosine-warmup curve parity with the
reference's precomputed numpy schedule."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppt_tpu.train.optim import build_optimizer, build_schedule
from ppt_tpu.train.schedules import cosine_with_warmup


def reference_cosine(base, final, epochs, niter, warmup_epochs, start):
    """Transcription of utils.cosine_scheduler (utils/utils.py:253-276)."""
    warmup_iters = warmup_epochs * niter
    warmup = np.linspace(start, base, warmup_iters) if warmup_iters else np.array([])
    iters = np.arange(epochs * niter - warmup_iters)
    cos = final + 0.5 * (base - final) * (1 + np.cos(np.pi * iters / len(iters)))
    return np.concatenate([warmup, cos])


class TestCosineWarmup:
    def test_matches_reference_curve(self):
        base, final, epochs, niter, we, start = 3e-3, 1e-5, 10, 7, 2, 1e-6
        sched = cosine_with_warmup(base, final, epochs, niter, we, start)
        ref = reference_cosine(base, final, epochs, niter, we, start)
        got = np.array([float(sched(i)) for i in range(epochs * niter)])
        # same endpoints and shape; small definitional offsets allowed
        # (linspace vs step/total parameterization)
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)
        assert abs(got[we * niter] - base) / base < 0.01
        np.testing.assert_allclose(got[-1], final, rtol=0.1, atol=1e-5)
        assert np.all(np.diff(got[we * niter :]) <= 1e-12)  # monotone decay

    def test_no_warmup(self):
        sched = cosine_with_warmup(1.0, 0.0, 4, 5)
        assert abs(float(sched(0)) - 1.0) < 1e-6


class TestFactories:
    @pytest.mark.parametrize(
        "name", ["adamw", "adam", "sgd", "nesterov", "momentum", "lamb",
                 "lars", "adabelief", "adafactor", "radam", "nadam",
                 "adamax", "adadelta", "adagrad", "novograd", "rmsprop"]
    )
    def test_optimizers_step(self, name):
        import optax

        opt = build_optimizer(name, 1e-3)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        state = opt.init(params)
        grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones((4,)) * 0.1}
        updates, _ = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0

    def test_unknown_optimizer(self):
        with pytest.raises(KeyError):
            build_optimizer("nope", 1e-3)

    @pytest.mark.parametrize("name", ["cosine", "multistep", "step", "poly", "constant", "tanh", "cosine_restarts"])
    def test_schedules_finite(self, name):
        sched = build_schedule(name, 1e-3, 10, 5, warmup_epochs=1)
        vals = [float(sched(i)) for i in (0, 10, 49)]
        assert all(np.isfinite(v) and v >= 0 for v in vals)

    def test_unknown_schedule(self):
        with pytest.raises(KeyError):
            build_schedule("nope", 1e-3, 10, 5)


def test_tanh_schedule_matches_timm_formula():
    """lr = lr_min + (lr_max-lr_min)/2 * (1 - tanh(-7*(1-tr) + 3*tr))
    (openpoints scheduler/tanh_lr.py:83-96)."""
    import math

    from ppt_tpu.train.optim import build_schedule

    sched = build_schedule("tanh", 0.1, 10, 20, final_lr=0.001)
    for step in (0, 50, 100, 199):
        tr = min(step / 200, 1.0)
        want = 0.001 + 0.5 * (0.1 - 0.001) * (
            1 - math.tanh(-7.0 * (1 - tr) + 3.0 * tr)
        )
        assert abs(float(sched(step)) - want) < 1e-7, step


def test_cosine_restarts_cycles():
    from ppt_tpu.train.optim import build_schedule

    # 2 cycles of 5 epochs x 10 steps, warmup 1 epoch
    sched = build_schedule(
        "cosine_restarts", 0.1, 10, 10, warmup_epochs=1,
        warmup_start_lr=0.0, final_lr=0.001, milestones=(5,),
    )
    peak1 = float(sched(10))   # after warmup, at peak
    trough = float(sched(49))  # end of cycle 1
    peak2 = float(sched(60))   # warmed up again inside cycle 2
    assert peak1 > 0.09
    assert trough < 0.01
    assert peak2 > 0.09  # restarted


class TestNewOptimizers:
    @pytest.mark.parametrize("name", ["rmsprop_tf", "madgrad", "sgdp", "adamp"])
    def test_step_changes_params(self, name):
        import optax

        opt = build_optimizer(name, 1e-3)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        state = opt.init(params)
        grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones((4,)) * 0.1}
        updates, state = opt.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0
        # second step with the evolved state must also be finite
        updates, state = opt.update(grads, state, new)
        new2 = optax.apply_updates(new, updates)
        assert all(
            bool(jnp.all(jnp.isfinite(v))) for v in new2.values()
        )

    def test_madgrad_matches_reference_recurrence(self):
        """One transcribed step of the MADGRAD recurrence
        (openpoints/optim/madgrad.py): z = x0 - s/(cbrt(nu)+eps),
        x+ = (1-c) x + c z."""
        import optax
        from ppt_tpu.train.optim import madgrad

        lr, mom, eps = 0.01, 0.9, 1e-6
        opt = madgrad(lr, momentum=mom, eps=eps)
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        g = jnp.asarray([0.1, 0.2, -0.3])
        state = opt.init({"p": p0})
        updates, state = opt.update({"p": g}, state, {"p": p0})
        p1 = optax.apply_updates({"p": p0}, updates)["p"]
        lamb = lr * np.sqrt(1.0)
        s = lamb * np.asarray(g)
        nu = lamb * np.asarray(g) ** 2
        z = np.asarray(p0) - s / (np.cbrt(nu) + eps)
        want = (1 - (1 - mom)) * np.asarray(p0) + (1 - mom) * z
        np.testing.assert_allclose(np.asarray(p1), want, rtol=1e-5)

    def test_adamp_projection_on_scale_invariant_tensor(self):
        """For a gradient orthogonal to the parameter (channel-wise),
        AdamP's update must stay orthogonal to the parameter direction
        (the radial component is projected out)."""
        from ppt_tpu.train.optim import adamp

        p = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])  # 1 channel, dim 4
        g = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])  # orthogonal to p
        opt = adamp(0.1)
        state = opt.init({"w": p})
        updates, _ = opt.update({"w": g}, state, {"w": p})
        u = np.asarray(updates["w"])
        # radial component of the update along p-hat is ~0
        assert abs(float(u[0, 0])) < 1e-6
        assert abs(float(u[0, 1])) > 1e-3


def test_plateau_reduces_lr_on_stagnant_loss():
    """reduce_on_plateau stage: feed a constant loss; after patience
    epochs the update scale drops by the factor."""
    import optax

    opt = build_optimizer(
        "adamw", 1e-2, plateau_patience_epochs=2, steps_per_epoch=1,
        plateau_factor=0.1,
    )
    opt = optax.with_extra_args_support(opt)
    params = {"w": jnp.ones((2, 2))}
    state = opt.init(params)
    grads = {"w": jnp.full((2, 2), 0.5)}
    first = None
    for i in range(8):
        updates, state = opt.update(
            grads, state, params, value=jnp.asarray(1.0)
        )
        mag = float(jnp.abs(updates["w"]).mean())
        if first is None:
            first = mag
    assert mag < first * 0.5, (first, mag)


def test_plateau_schedule_name_accepted():
    sched = build_schedule("plateau", 1e-3, 10, 5)
    assert abs(float(sched(0)) - 1e-3) < 1e-9


class TestAdahessian:
    def test_recurrence_matches_reference_two_steps(self):
        """Two transcribed steps of the reference update math
        (openpoints/optim/adahessian.py:119-155): decoupled wd
        p *= 1-lr*wd; m = b1 m + (1-b1) g; v = b2 v + (1-b2) h^2;
        denom = (v/bc2)^(k/2) + eps; p -= (lr/bc1) m/denom."""
        import optax
        from ppt_tpu.train.optim import adahessian

        lr, wd, eps, k = 0.1, 0.01, 1e-8, 1.0
        b1, b2 = 0.9, 0.999
        opt = adahessian(lr, betas=(b1, b2), eps=eps, weight_decay=wd,
                         hessian_power=k)
        p = jnp.asarray([1.0, -2.0, 0.5])
        state = opt.init({"p": p})
        gs = [np.asarray([0.1, 0.2, -0.3]), np.asarray([-0.05, 0.4, 0.2])]
        hs = [np.asarray([2.0, 0.5, 1.5]), np.asarray([1.0, 3.0, 0.25])]

        # reference recurrence in numpy
        want = np.asarray(p, np.float64)
        m = np.zeros(3)
        v = np.zeros(3)
        for t, (g, h) in enumerate(zip(gs, hs), start=1):
            want *= 1.0 - lr * wd
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * h * h
            bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
            denom = (v / bc2) ** (k / 2) + eps
            want -= (lr / bc1) * m / denom

        got = {"p": p}
        for g, h in zip(gs, hs):
            updates, state = opt.update(
                {"p": jnp.asarray(g, jnp.float32)}, state, got,
                hess={"p": jnp.asarray(h, jnp.float32)},
            )
            got = optax.apply_updates(got, updates)
        np.testing.assert_allclose(np.asarray(got["p"]), want, rtol=1e-5)

    def test_hutchinson_diag_exact_for_diagonal_hessian(self):
        """For a separable loss the Hessian is diagonal and z*(Hz) is
        exact for every Rademacher probe (z_i^2 = 1)."""
        import jax
        from ppt_tpu.train.optim import hutchinson_diag

        def loss(params):
            return jnp.sum(params["w"] ** 4) + 2.0 * jnp.sum(params["b"] ** 2)

        params = {"w": jnp.asarray([1.0, -0.5]), "b": jnp.asarray([3.0])}
        d = hutchinson_diag(jax.grad(loss), params, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(d["w"]), 12.0 * np.asarray([1.0, 0.25]), rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(d["b"]), [4.0], rtol=1e-6)

    def test_build_optimizer_accepts_adahessian_and_trains(self):
        """End-to-end through the trainer plumbing: second_order=True
        computes the Hutchinson diagonal inside the jitted step and a
        quadratic objective decreases."""
        import jax
        import optax
        from ppt_tpu.train.optim import build_optimizer, hutchinson_diag

        opt = build_optimizer("adahessian", 0.05)
        opt = optax.with_extra_args_support(opt)
        params = {"w": jnp.asarray([2.0, -3.0, 1.0])}

        def loss_fn(p):
            return jnp.sum(p["w"] ** 2) + 0.1 * jnp.sum(p["w"] ** 4)

        state = opt.init(params)

        @jax.jit
        def step(params, state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            hess = hutchinson_diag(jax.grad(loss_fn), params, key)
            updates, state = opt.update(
                grads, state, params, value=loss, hess=hess
            )
            return optax.apply_updates(params, updates), state, loss

        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(60):
            key, k = jax.random.split(key)
            params, state, loss = step(params, state, k)
            losses.append(float(loss))
        # Adam-family step size is ~lr/step; 60 steps at lr=0.05 from
        # |w|~3 must cut the quadratic by well over 10x
        assert losses[-1] < 0.1 * losses[0], losses[::10]
        assert all(a >= b for a, b in zip(losses, losses[1:])), "not monotone"


def test_grad_norm_clip_bounds_update():
    """build_optimizer(grad_norm_clip=c) must clip the global L2 norm
    before the base transform (reference:
    PointNeXt/examples/classification/train.py:269-271)."""
    import jax.numpy as jnp
    import optax

    from ppt_tpu.train.optim import build_optimizer

    params = {"w": jnp.zeros((4,)), "b": jnp.zeros((2,))}
    huge = {"w": jnp.full((4,), 1e6), "b": jnp.full((2,), -1e6)}

    opt = build_optimizer("sgd", 1.0, weight_decay=0.0, momentum=0.0,
                          grad_norm_clip=1.0)
    state = opt.init(params)
    updates, _ = opt.update(huge, state, params)
    gnorm = optax.global_norm(updates)
    # sgd with lr 1.0: update = -clipped grad, so |update| == clip
    assert abs(float(gnorm) - 1.0) < 1e-5

    # small grads pass through unclipped
    small = {"w": jnp.full((4,), 0.1), "b": jnp.full((2,), 0.1)}
    updates, _ = opt.update(small, opt.init(params), params)
    assert abs(float(optax.global_norm(updates))
               - float(optax.global_norm(small))) < 1e-6
