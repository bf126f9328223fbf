"""Frozen-feature extraction (linear-probe stage 1 + recog feature dump).

Equivalents of ``lp_feat_extractor.py:12-75`` (run the frozen
point encoder over train/test splits, save features+labels to ``.npz``)
and ``save_recog_feats.py:15-79`` (save test-set logits/features for
visualization). One jitted forward, batched over the dataset.
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ppt_tpu.data import Loader, build_dataset
from ppt_tpu.models import PromptArrays, build_model
from ppt_tpu.prompt import build_prompt_spec
from ppt_tpu.tasks.args import TaskArgs

log = logging.getLogger(__name__)


def extract_features(
    args: TaskArgs, split: str, with_logits: bool = False
) -> Dict[str, np.ndarray]:
    """Run the frozen point encoder (optionally + prompt logits) over a
    split; returns feature_list/label_list arrays (lp_feat_extractor
    naming)."""
    ds = build_dataset(args.dataset_name, args, split)
    classnames = (
        ds.classnames if ds.name.startswith("synthetic") else args.load_classnames()
    )
    model_spec = build_model(args.model, args)
    model = model_spec.model

    spec = build_prompt_spec(
        classnames,
        n_ctx=args.num_learnable_prompt_tokens,
        class_name_position=args.class_name_position,
        template_init=args.template_init,
    )
    prompts = PromptArrays.from_spec(spec)

    sample = jnp.asarray(ds.points[:2])
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), sample, prompts)
    if args.pretrained_dir and os.path.isdir(args.pretrained_dir):
        from ppt_tpu.train.checkpoint import load_pretrained_backbones

        try:
            variables = load_pretrained_backbones(args, variables)
        except FileNotFoundError:
            log.warning("no converted checkpoints; using random init")
    if args.test_ckpt_addr:
        from ppt_tpu.train.checkpoint import load_params_file, merge_pretrained

        variables = merge_pretrained(
            variables, load_params_file(args.test_ckpt_addr)
        )

    # variables passed as an argument (closure capture would inline the
    # param tree as HLO constants and stall compilation)
    @jax.jit
    def encode(variables, pc):
        feats = model.apply(
            variables, pc, train=False,
            method=lambda m, pc, train: m.point_encoder(pc, train=train),
        )
        if with_logits:
            logits = model.apply(variables, pc, prompts, train=False)
            return feats, logits
        return feats

    loader = Loader(ds, batch_size=args.batch_size, shuffle=False)
    feats_out, logits_out, labels_out = [], [], []
    for batch in loader:
        valid = batch["valid"]
        out = encode(variables, jnp.asarray(batch["pc"]))
        if with_logits:
            feats, logits = out
            logits_out.append(np.asarray(logits)[valid])
        else:
            feats = out
        feats_out.append(np.asarray(feats)[valid])
        labels_out.append(batch["label"][valid])

    result = {
        "feature_list": np.concatenate(feats_out),
        "label_list": np.concatenate(labels_out),
    }
    if with_logits:
        result["logits"] = np.concatenate(logits_out)
    return result


def main(args: TaskArgs):
    """lp_feat_extractor equivalent: dump train/test features to npz."""
    logging.basicConfig(level=logging.INFO)
    out_dir = os.path.join(args.output_dir, args.exp_name or "lp_feats")
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "test"):
        data = extract_features(args, split)
        path = os.path.join(out_dir, f"{split}.npz")
        np.savez(path, **data)
        log.info(
            "%s: %s features -> %s", split, data["feature_list"].shape, path
        )
    return out_dir


def save_recog_feats(args: TaskArgs):
    """save_recog_feats.py equivalent: test-set logits + features dump."""
    logging.basicConfig(level=logging.INFO)
    out_dir = os.path.join(args.output_dir, args.exp_name or "recog_feats")
    os.makedirs(out_dir, exist_ok=True)
    data = extract_features(args, "test", with_logits=True)
    path = os.path.join(out_dir, "recog_feats.npz")
    np.savez(path, **data)
    log.info("saved logits %s features %s -> %s",
             data["logits"].shape, data["feature_list"].shape, path)
    return path


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
