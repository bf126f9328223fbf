"""Config system tests: _base_ inheritance, dotted overrides, CLI
precedence, catalog resolution."""

import os

import pytest

from ppt_tpu.tasks.args import parse_args
from ppt_tpu.utils.config import (
    apply_overrides,
    dataset_config,
    load_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestLoadConfig:
    def test_base_inheritance(self):
        cfg = load_config(os.path.join(REPO, "configs/experiments/ppt_base_mn40.yaml"))
        assert cfg["dataset_name"] == "modelnet40"  # from dataset base
        assert cfg["task"] == "cls"  # from _base_cls
        assert cfg["model"] == "ULIP_PointBERT"  # own
        assert cfg["batch_size"] == 30
        assert "_base_" not in cfg

    def test_child_overrides_base(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("a: 1\nb: {x: 1, y: 2}\n")
        child = tmp_path / "child.yaml"
        child.write_text("_base_: base.yaml\na: 9\nb: {y: 7}\n")
        cfg = load_config(str(child))
        assert cfg == {"a": 9, "b": {"x": 1, "y": 7}}

    def test_dataset_catalog(self):
        cfg = dataset_config("scanobjectnn")
        assert cfg["sonn_type"] == "hardest"
        with pytest.raises(FileNotFoundError):
            dataset_config("nope")


class TestOverrides:
    def test_dotted_and_typed(self):
        cfg = apply_overrides({"a": {"b": 1}}, ["a.b=5", "a.c=hello", "d=1.5"])
        assert cfg == {"a": {"b": 5, "c": "hello"}, "d": 1.5}

    def test_bad_override(self):
        with pytest.raises(ValueError):
            apply_overrides({}, ["noequals"])


class TestCliPrecedence:
    def test_config_then_cli(self):
        cfg_path = os.path.join(REPO, "configs/experiments/ppt_base_mn40.yaml")
        args = parse_args(["--config", cfg_path, "--batch_size", "64"])
        assert args.batch_size == 64  # CLI wins
        assert args.model == "ULIP_PointBERT"  # from config
        assert args.data_ratio == 0.4  # from config

    def test_set_overrides(self):
        cfg_path = os.path.join(REPO, "configs/experiments/ppt_base_mn40.yaml")
        args = parse_args(["--config", cfg_path, "--set", "lr=0.001", "head_type=3"])
        assert args.lr == 0.001
        assert args.head_type == 3

    def test_defaults_without_config(self):
        args = parse_args([])
        assert args.model == "ULIP_PointBERT"
        assert args.epochs == 250
