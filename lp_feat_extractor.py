#!/usr/bin/env python
"""Entry point: delegates to ppt_tpu.tasks.feature_extract (reference-parity CLI)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.feature_extract import main

if __name__ == "__main__":
    main(parse_args())
