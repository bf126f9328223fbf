"""Experiment provenance + metric logging.

Reference behavior: copies driver/parser/model/dataset sources into
``outputs/<proj>/<exp>/copy/`` at startup and tees logs from the pueue
daemon (``utils/utils.py:104-116,279-299``); optional wandb with
self-hosted URL/key (``parser.py:76-84``).

Here provenance is recorded as metadata rather than file copies — the
git commit pins the exact sources — plus full args and environment; the
metric logger fans out to stdout, a JSONL file, and (when installed and
enabled) wandb.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import subprocess
import sys
import time
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)


def _git_rev() -> Optional[str]:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ).stdout.strip() or None
    except Exception:
        return None


class ExperimentLogger:
    """Provenance snapshot + metric fan-out (stdout / JSONL / wandb)."""

    def __init__(self, args, task_name: str = ""):
        self.args = args
        self.dir = os.path.join(
            args.output_dir, args.exp_name or task_name or "exp"
        )
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._wandb = None

        provenance = {
            "git_rev": _git_rev(),
            "argv": sys.argv,
            "start_time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "args": {
                k: v
                for k, v in (
                    dataclasses.asdict(args).items()
                    if dataclasses.is_dataclass(args)
                    else vars(args).items()
                )
                if isinstance(v, (int, float, str, bool, list, tuple, type(None)))
            },
        }
        with open(os.path.join(self.dir, "provenance.json"), "w") as f:
            json.dump(provenance, f, indent=2, default=str)

        if getattr(args, "wandb", False):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=getattr(args, "proj_name", "PPT_TPU"),
                    name=args.exp_name or task_name,
                    config=provenance["args"],
                )
            except ImportError:
                log.warning("--wandb requested but wandb is not installed")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        record = {"step": step, **{k: v for k, v in metrics.items()
                                   if isinstance(v, (int, float, str))}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
