#!/usr/bin/env python
"""Entry point: delegates to ppt_tpu.tasks.linear_probe (stage 2 of the
linear-probe pipeline; stage 1 is lp_feat_extractor.py)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.linear_probe import main

if __name__ == "__main__":
    main(parse_args())
