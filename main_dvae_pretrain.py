#!/usr/bin/env python
"""Entry point: dVAE point-cloud tokenizer pretraining (the reference
vendors the dVAE without a trainer; this completes the capability)."""
from ppt_tpu.tasks.args import parse_args
from ppt_tpu.tasks.dvae_pretrain import main

if __name__ == "__main__":
    main(parse_args())
