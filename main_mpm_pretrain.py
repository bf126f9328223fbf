#!/usr/bin/env python
"""Entry point: PointBERT masked-point-modeling pretraining (stage 2;
stage 1 is main_dvae_pretrain.py)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.mpm_pretrain import main

if __name__ == "__main__":
    main(parse_args())
