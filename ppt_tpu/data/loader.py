"""Batch loader: shuffling, per-host sharding, fixed-shape batches.

Replaces the reference's torch DataLoader + DistributedSampler
(``main_cls.py:74-87``): datasets here are materialized numpy arrays, so
batching is pure slicing — no worker processes, no collate. Multi-host
data parallelism takes the ``DistributedSampler`` role via
``jax.process_index()`` striding; within a host the batch is later
sharded over the mesh's data axis by the trainer.

Fixed shapes: ``drop_last`` on train (stable jit signature); eval pads
the final batch and reports a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ppt_tpu.data.datasets import ArrayDataset


@dataclasses.dataclass
class Loader:
    dataset: ArrayDataset
    batch_size: int
    shuffle: bool = False
    drop_last: bool = False
    seed: int = 0
    num_processes: Optional[int] = None
    process_index: Optional[int] = None

    def __post_init__(self):
        self._epoch = 0
        self._n_proc = (
            self.num_processes
            if self.num_processes is not None
            else jax.process_count()
        )
        self._proc = (
            self.process_index
            if self.process_index is not None
            else jax.process_index()
        )

    def set_epoch(self, epoch: int):
        """Reshuffle seed per epoch (DistributedSampler.set_epoch parity)."""
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self._host_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _host_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed * 100003 + self._epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self._proc :: self._n_proc]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._host_indices()
        bs = self.batch_size
        n_full = len(idx) // bs
        for b in range(n_full):
            yield self._batch(idx[b * bs : (b + 1) * bs])
        rem = len(idx) - n_full * bs
        if rem and not self.drop_last:
            tail = idx[n_full * bs :]
            pad = np.concatenate([tail, np.full(bs - rem, tail[-1])])
            batch = self._batch(pad)
            batch["valid"] = np.arange(bs) < rem
            yield batch

    def _batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.dataset
        out = {
            "pc": ds.points[idx],
            "label": ds.labels[idx],
            "valid": np.ones(len(idx), dtype=bool),
        }
        if ds.seg_labels is not None:
            out["category"] = ds.labels[idx]
            out["label"] = ds.seg_labels[idx]
            out["cls_onehot"] = np.eye(ds.num_classes, dtype=np.float32)[
                ds.labels[idx]
            ]
        return out
