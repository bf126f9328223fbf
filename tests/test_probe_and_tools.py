"""Linear-probe + interpret-prompt tests: the JAX logistic regression
matches sklearn; the probe protocol separates separable features; nearest
words recover planted vectors."""

import numpy as np
import pytest

from ppt_tpu.tasks.linear_probe import (
    _accuracy_jax,
    _accuracy_sklearn,
    probe_once,
    run_probe,
)
from ppt_tpu.tasks.interpret_prompt import nearest_words


def _separable(n_per=30, d=16, k=3, seed=0, spread=3.0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * spread
    X = np.concatenate([centers[c] + rng.randn(n_per, d) for c in range(k)])
    y = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(y))
    return X[perm].astype(np.float32), y[perm]


class TestLogReg:
    def test_jax_matches_sklearn(self):
        Xtr, ytr = _separable(seed=0)
        Xte, yte = _separable(seed=1)
        for C in (0.01, 1.0, 100.0):
            a_jax = _accuracy_jax(Xtr, ytr, Xte, yte, C, 3, steps=100)
            a_sk = _accuracy_sklearn(Xtr, ytr, Xte, yte, C, 3)
            assert abs(a_jax - a_sk) < 0.05, (C, a_jax, a_sk)

    def test_probe_once_high_acc(self):
        Xtr, ytr = _separable(seed=0)
        Xte, yte = _separable(seed=1)
        acc, best_c = probe_once(Xtr, ytr, Xte, yte, 3, num_step=3)
        assert acc > 0.9
        assert best_c > 0

    def test_run_probe_protocol(self, tmp_path):
        Xtr, ytr = _separable(n_per=40, seed=0)
        Xte, yte = _separable(n_per=20, seed=1)
        np.savez(tmp_path / "train.npz", feature_list=Xtr, label_list=ytr)
        np.savez(tmp_path / "test.npz", feature_list=Xte, label_list=yte)
        results = run_probe(
            str(tmp_path / "train.npz"), str(tmp_path / "test.npz"),
            num_run=2, num_step=2, shots=(1, 4),
        )
        assert set(results) == {1, 4}
        # separable data: both settings should be far above chance (33%)
        assert results[1][0] > 80.0
        assert results[4][0] > 80.0


class TestInterpretPrompt:
    def test_recovers_planted_tokens(self):
        rng = np.random.RandomState(0)
        table = rng.randn(200, 8).astype(np.float32)
        ctx = table[[5, 17, 60]] + rng.randn(3, 8).astype(np.float32) * 0.01

        from ppt_tpu.prompt import ClipTokenizer

        class FakeTok:
            decoder = {i: f"tok{i}</w>" for i in range(200)}

        out = nearest_words(ctx, table, topk=3, tokenizer=FakeTok())
        assert out[0][0][0] == "tok5"
        assert out[1][0][0] == "tok17"
        assert out[2][0][0] == "tok60"
        assert out[0][0][1] < out[0][1][1]  # sorted by distance
