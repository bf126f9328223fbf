"""interpret_prompt CLI path: loads a saved prompt checkpoint + converted
SLIP embedding table and prints nearest vocabulary words."""

import os

import numpy as np
import pytest
from flax import serialization

from ppt_tpu.tasks.args import TaskArgs
from ppt_tpu.tasks.interpret_prompt import main


def test_interpret_prompt_main(tmp_path, rng, capsys):
    # fabricate a trained checkpoint: 4 prompt vectors near real token rows
    width = 16
    vocab = 512
    table = rng.randn(vocab, width).astype(np.float32)
    planted = [7, 42, 99, 400]
    learnable = table[planted] + rng.randn(4, width).astype(np.float32) * 1e-3

    ckpt = {"trainable": {"prompt_learner": {"learnable_tokens": learnable}}}
    ckpt_path = tmp_path / "checkpoint_best.msgpack"
    ckpt_path.write_bytes(serialization.msgpack_serialize(ckpt))

    slip = {"params": {"text": {"token_embedding": {"embedding": table}}}}
    pre_dir = tmp_path / "pretrained"
    pre_dir.mkdir()
    (pre_dir / "slip_text.msgpack").write_bytes(
        serialization.msgpack_serialize(slip)
    )

    args = TaskArgs(
        fpath=str(ckpt_path), pretrained_dir=str(pre_dir), topk=3
    )
    results = main(args)
    assert len(results) == 4
    out = capsys.readouterr().out
    assert "ctx[ 0]" in out
    # nearest word should decode from the planted token ids (ids < 512
    # decode to single printable byte-units in the CLIP vocab)
    for i in range(4):
        word, dist = results[i][0]
        assert dist < 0.1  # recovered the planted vector
