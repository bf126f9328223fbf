"""Classification-loss unit tests (smoothed CE parity with torch,
soft-target CE, distillation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ppt_tpu.models.losses import (
    distillation_loss,
    pointbert_smoothed_ce,
    smoothed_cross_entropy,
    soft_target_cross_entropy,
)


class TestSmoothedCE:
    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.randn(8, 5).astype(np.float32)
        labels = rng.randint(0, 5, 8)
        for s in (0.0, 0.2, 0.3):
            want = torch.nn.CrossEntropyLoss(label_smoothing=s)(
                torch.tensor(logits), torch.tensor(labels)
            ).item()
            got = float(smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), s))
            assert abs(got - want) < 1e-5, (s, got, want)

    def test_pointbert_variant(self, rng):
        logits = jnp.asarray(rng.randn(4, 10).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 10, 4))
        loss = float(pointbert_smoothed_ce(logits, labels, eps=0.2))
        assert np.isfinite(loss) and loss > 0


class TestSoftTargetAndDistill:
    def test_soft_target_onehot_equals_ce(self, rng):
        logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 4, 6))
        onehot = jnp.eye(4)[labels]
        a = float(soft_target_cross_entropy(logits, onehot))
        b = float(smoothed_cross_entropy(logits, labels, 0.0))
        assert abs(a - b) < 1e-5

    def test_distill_zero_kd_when_identical(self, rng):
        logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 4, 6))
        full = float(distillation_loss(logits, logits, labels, alpha=1.0))
        assert abs(full) < 1e-4  # KL(teacher||student)=0 when identical

    def test_distill_alpha_blend(self, rng):
        s = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        t = jnp.asarray(rng.randn(6, 4).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 4, 6))
        ce_only = float(distillation_loss(s, t, labels, alpha=0.0))
        want = float(smoothed_cross_entropy(s, labels))
        assert abs(ce_only - want) < 1e-5
