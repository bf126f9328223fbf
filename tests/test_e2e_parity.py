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


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference unavailable"
)
def test_e2e_parity_synthetic_standin():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable, "-m", "ppt_tpu.tools.e2e_parity",
            "--tiny", "--steps", "1", "--sgd_steps", "2",
            "--batch_size", "4", "--npoints", "128",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=1200,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert "PARITY OK" in proc.stdout, out
    # every compared quantity must have been within tolerance
    assert "DIVERGED" not in proc.stdout, out
