#!/usr/bin/env python
"""Entry point: test-set logits/features dump for visualization
(reference save_recog_feats.py equivalent)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.feature_extract import save_recog_feats

if __name__ == "__main__":
    save_recog_feats(parse_args())
