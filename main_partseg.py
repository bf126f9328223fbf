#!/usr/bin/env python
"""Entry point: delegates to ppt_tpu.tasks.partseg (reference-parity CLI)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.partseg import main

if __name__ == "__main__":
    main(parse_args())
