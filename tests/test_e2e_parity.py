"""The one-command bring-up/parity harness must run end-to-end on its
synthetic stand-in (VERDICT r3 item 4): torch reference ULIP built from
/root/reference, weights converted, k identical eval batches + lockstep
SGD steps compared, exit 0 with PARITY OK.

Runs as a subprocess — the harness installs reference-dep stubs into
sys.modules (easydict, utils.tokenizer, ...) that must not leak into
other tests.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_parity(*extra_args, timeout=1200):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "ppt_tpu.tools.e2e_parity", "--tiny",
         *extra_args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=timeout,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "PARITY OK" in proc.stdout, out
    # every compared quantity must have been within tolerance, and the
    # two frameworks' trainable partitions must be the same size
    assert "DIVERGED" not in proc.stdout, out
    assert "PARTITION MISMATCH" not in proc.stdout, out


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference unavailable"
)
def test_e2e_parity_synthetic_standin():
    _run_parity("--steps", "1", "--sgd_steps", "2",
                "--batch_size", "4", "--npoints", "128")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference unavailable"
)
@pytest.mark.parametrize("head_type", [1, 2, 3])
def test_e2e_parity_head_types(head_type):
    """The PointAdapter partitions (ULIP_models.py:461-470): lockstep
    SGD must train exactly the reference's progressive unfreeze lists —
    a converter or trainable_mask bug diverges the loss trajectory or
    trips the scalar-count check (VERDICT r4 item 3)."""
    _run_parity("--steps", "1", "--sgd_steps", "3",
                "--head_type", str(head_type),
                "--batch_size", "4", "--npoints", "128")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference unavailable"
)
def test_e2e_parity_partseg():
    """Dense per-point lockstep: PointTransformer_partseg trunk,
    per-point CE (main_partseg.py:213), and the partseg freeze rule —
    prompt_learner + non-pretrained point_encoder params train
    (ULIP_models.py:550-566)."""
    _run_parity("--steps", "1", "--sgd_steps", "2",
                "--task", "partseg", "--batch_size", "2",
                timeout=1800)
