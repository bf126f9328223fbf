"""Generate golden token-id fixtures from the REFERENCE tokenizer.

Runs ``/root/reference/utils/tokenizer.py::SimpleTokenizer`` over every
prompt string PPT can actually produce in this repo — classnames from all
label sets (``ppt_tpu/assets/labels.json``), the ``X*n_ctx {name}.``
prompt-learner strings at the flagship n_ctx, and every caption template
(``ppt_tpu/assets/templates.json``) formatted with every classname — and
writes the ids to ``tests/fixtures/tokenizer_goldens.json.gz``.

ftfy handling: the reference's ``basic_clean`` calls ``ftfy.fix_text``
(reference ``utils/tokenizer.py:50-54``); ftfy is absent in this
environment. For the strings generated here ftfy is PROVABLY the identity:
they are pure printable ASCII with no ``&`` (so ftfy's mojibake repair and
its optional HTML unescape have nothing to act on). This script asserts
that precondition for every string and injects an identity stub so the
reference module imports. Non-ASCII parity stays covered by the
ftfy-gated live test in ``tests/test_tokenizer.py``.

Usage: python tools/gen_tokenizer_goldens.py
"""

import gzip
import importlib.util
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TOKENIZER = "/root/reference/utils/tokenizer.py"
OUT = os.path.join(REPO, "tests", "fixtures", "tokenizer_goldens.json.gz")


def _ftfy_is_identity(text: str) -> bool:
    """True iff ftfy.fix_text provably cannot change `text`.

    Sufficient condition: printable ASCII (no mojibake, no curly quotes,
    no control chars beyond \\n which these strings don't contain) and no
    '&' (nothing for the auto HTML-unescape pass to rewrite).
    """
    return text.isascii() and text.isprintable() and "&" not in text


def _load_reference_tokenizer():
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401  — use the real one if present
        except ImportError:
            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda t, **kw: t
            stub.__ppt_stub__ = True
            sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(), getattr(sys.modules["ftfy"], "__ppt_stub__", False)


def corpus() -> list[str]:
    labels = json.load(open(os.path.join(REPO, "ppt_tpu", "assets", "labels.json")))
    templates = json.load(open(os.path.join(REPO, "ppt_tpu", "assets", "templates.json")))
    names: list[str] = []
    for classnames in labels.values():
        for name in classnames:
            if name not in names:
                names.append(name)
                spaced = name.replace("_", " ")
                if spaced not in names:
                    names.append(spaced)
    texts = list(names)
    # prompt-learner strings at the flagship context length (see
    # ppt_tpu/prompt/learner.py:build_prompt_spec)
    prefix = " ".join(["X"] * 32)
    for name in names:
        texts.append(f"{prefix} {name.replace('_', ' ')}.")
    for tset in templates.values():
        for t in tset:
            for name in names:
                s = t.format(name.replace("_", " "))
                if s not in texts:
                    texts.append(s)
    return texts


def main():
    ref, stubbed = _load_reference_tokenizer()
    texts = corpus()
    bad = [t for t in texts if not _ftfy_is_identity(t)]
    assert not bad, f"strings where ftfy may not be identity: {bad[:5]}"
    goldens = {t: ref.encode(t) for t in texts}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt") as f:
        json.dump(goldens, f)
    print(
        f"wrote {len(goldens)} goldens to {OUT} "
        f"({os.path.getsize(OUT)} bytes; ftfy {'STUBBED (identity, ASCII-proven)' if stubbed else 'real'})"
    )


if __name__ == "__main__":
    main()
