#!/usr/bin/env python
"""Entry point: ULIP contrastive pretraining on ShapeNet-55 triplets
(the capability the reference ships datasets+losses for but no driver)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.pretrain import main

if __name__ == "__main__":
    main(parse_args())
