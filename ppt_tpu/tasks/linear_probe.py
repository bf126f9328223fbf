"""Linear probe: few-shot logistic regression over frozen features.

Equivalent of ``linear_probe.py:8-122``: loads the train/test ``.npz``
dumps from the feature extractor, then for each shot count in
{1, 2, 4, 8, 16} x ``num_run`` seeds samples per-class subsets, runs a
7-decade grid search over the inverse-regularization C, refines it with
``num_step`` iterations of binary search on log10(C), and reports
mean±std test accuracy per shot count.

TPU-native twist: the classifier itself is a jitted multinomial logistic
regression (full-batch LBFGS via optax) instead of sklearn — the probe
runs on-device and vmaps over candidate C values. sklearn remains
available as a verification oracle (used in tests); ``backend='sklearn'``
switches to it for strict parity runs.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

log = logging.getLogger(__name__)

SHOTS = (1, 2, 4, 8, 16)


@functools.partial(jax.jit, static_argnames=("num_classes", "steps"))
def _fit_logreg(
    X: jax.Array, y: jax.Array, C: jax.Array, num_classes: int, steps: int = 100
) -> Tuple[jax.Array, jax.Array]:
    """Full-batch L2-regularized multinomial logistic regression.

    Objective matches sklearn's LogisticRegression: sum-CE + ||w||^2/(2C).
    Returns (W, b).
    """
    n, d = X.shape
    W0 = jnp.zeros((d, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)

    def objective(params):
        W, b = params
        logits = X @ W + b
        ce = -jnp.sum(
            jax.nn.log_softmax(logits)[jnp.arange(n), y]
        )
        return ce + jnp.sum(W**2) / (2.0 * C)

    solver = optax.lbfgs()
    opt_state = solver.init((W0, b0))
    value_and_grad = optax.value_and_grad_from_state(objective)

    def body(carry, _):
        params, opt_state = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad,
            value_fn=objective,
        )
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    (params, _), _ = jax.lax.scan(body, ((W0, b0), opt_state), None, length=steps)
    return params


def _accuracy_jax(
    Xtr, ytr, Xte, yte, C: float, num_classes: int, steps: int = 100
) -> float:
    W, b = _fit_logreg(
        jnp.asarray(Xtr), jnp.asarray(ytr), jnp.asarray(C, jnp.float32),
        num_classes, steps,
    )
    pred = np.argmax(np.asarray(jnp.asarray(Xte) @ W + b), axis=-1)
    return float(np.mean(pred == yte))


def _accuracy_sklearn(Xtr, ytr, Xte, yte, C: float, num_classes: int, **_) -> float:
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(C=C, max_iter=1000)
    clf.fit(Xtr, ytr)
    return float(clf.score(Xte, yte))


def probe_once(
    Xtr, ytr, Xte, yte, num_classes: int, num_step: int = 8,
    backend: str = "jax",
) -> Tuple[float, float]:
    """Grid search C over 7 decades then binary-search refine
    (``linear_probe.py:52-111``). Returns (best_acc, best_C)."""
    acc_fn = _accuracy_jax if backend == "jax" else _accuracy_sklearn

    search_list = [10.0**k for k in range(-4, 3)]  # 1e-4 .. 1e2
    accs = [acc_fn(Xtr, ytr, Xte, yte, C, num_classes) for C in search_list]
    peak = int(np.argmax(accs))
    # bracket in log10 space around the grid peak
    lo = np.log10(search_list[max(peak - 1, 0)])
    hi = np.log10(search_list[min(peak + 1, len(search_list) - 1)])
    best_acc, best_c = accs[peak], search_list[peak]
    for _ in range(num_step):
        mid_lo = lo + (hi - lo) / 3.0
        mid_hi = hi - (hi - lo) / 3.0
        a_lo = acc_fn(Xtr, ytr, Xte, yte, 10.0**mid_lo, num_classes)
        a_hi = acc_fn(Xtr, ytr, Xte, yte, 10.0**mid_hi, num_classes)
        if a_lo >= a_hi:
            hi = mid_hi
            if a_lo > best_acc:
                best_acc, best_c = a_lo, 10.0**mid_lo
        else:
            lo = mid_lo
            if a_hi > best_acc:
                best_acc, best_c = a_hi, 10.0**mid_hi
    return best_acc, best_c


def run_probe(
    train_npz: str,
    test_npz: str,
    num_run: int = 10,
    num_step: int = 8,
    shots=SHOTS,
    backend: str = "jax",
) -> Dict[int, Tuple[float, float]]:
    """Full probe protocol. Returns {shot: (mean_acc, std_acc)}."""
    tr = np.load(train_npz)
    te = np.load(test_npz)
    Xtr_all, ytr_all = tr["feature_list"], tr["label_list"]
    Xte, yte = te["feature_list"], te["label_list"]
    num_classes = int(max(ytr_all.max(), yte.max())) + 1

    results: Dict[int, Tuple[float, float]] = {}
    for shot in shots:
        accs = []
        for run in range(num_run):
            rng = np.random.RandomState(run)
            idx: List[int] = []
            for c in range(num_classes):
                pool = np.flatnonzero(ytr_all == c)
                if len(pool) == 0:
                    continue
                take = min(shot, len(pool))
                idx.extend(rng.choice(pool, take, replace=False))
            idx = np.asarray(idx)
            acc, _ = probe_once(
                Xtr_all[idx], ytr_all[idx], Xte, yte, num_classes,
                num_step=num_step, backend=backend,
            )
            accs.append(acc * 100.0)
        results[shot] = (float(np.mean(accs)), float(np.std(accs)))
        log.info("%d-shot: %.2f ± %.2f", shot, *results[shot])
    return results


def main(args):
    logging.basicConfig(level=logging.INFO)
    feat_dir = os.path.join(args.output_dir, args.exp_name or "lp_feats")
    results = run_probe(
        os.path.join(feat_dir, "train.npz"),
        os.path.join(feat_dir, "test.npz"),
        num_run=args.num_run,
        num_step=args.num_step,
    )
    out = os.path.join(feat_dir, "linear_probe_results.txt")
    with open(out, "w") as f:
        for shot, (mean, std) in results.items():
            f.write(f"{shot}-shot: {mean:.2f} +- {std:.2f}\n")
    log.info("wrote %s", out)
    return results


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
