"""ClipTokenizer tests, incl. parity against the reference SimpleTokenizer
(loaded from /root/reference as a test oracle when its deps are present)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from ppt_tpu.prompt import ClipTokenizer, tokenize

REF_TOKENIZER = "/root/reference/utils/tokenizer.py"


def _load_reference_tokenizer():
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer()


class TestClipTokenizer:
    def test_vocab_size(self, tok):
        assert len(tok.encoder) == 49408
        assert tok.sot_token == 49406
        assert tok.eot_token == 49407

    def test_roundtrip(self, tok):
        # decode separates every BPE word with a space (</w> marker),
        # so punctuation comes back space-separated — same as reference.
        for text in ["airplane", "night stand", "a photo of a chair"]:
            ids = tok.encode(text)
            assert tok.decode(ids).strip() == text
        assert tok.decode(tok.encode("chair.")).strip() == "chair ."

    def test_call_shape_and_framing(self, tok):
        out = tok(["chair", "glass box"])
        assert out.shape == (2, 77)
        assert out.dtype == np.int32
        assert (out[:, 0] == tok.sot_token).all()
        # EOT is the max id in each row
        assert (out.max(axis=1) == tok.eot_token).all()

    def test_known_ids(self, tok):
        # "a photo of a" is the canonical CLIP prompt; its ids are stable
        # public knowledge: a=320, photo=1125, of=539
        ids = tok.encode("a photo of a")
        assert ids == [320, 1125, 539, 320]

    @pytest.mark.skipif(
        not os.path.exists(REF_TOKENIZER), reason="reference unavailable"
    )
    def test_parity_with_reference(self, tok):
        try:
            ref = _load_reference_tokenizer()
        except ImportError as e:
            pytest.skip(f"reference deps missing: {e}")
        texts = [
            "airplane",
            "night stand",
            "X X X X flower pot.",
            "a point cloud of a tv_stand",
            "range hood!",
            "Person 7 sitting",
        ]
        for t in texts:
            assert tok.encode(t) == ref.encode(t), t
        ours = tok(texts)
        theirs = ref(texts).numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_module_level_tokenize(self):
        out = tokenize("sofa")
        assert out.shape == (1, 77)
