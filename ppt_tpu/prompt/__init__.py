from ppt_tpu.prompt.tokenizer import ClipTokenizer, tokenize
from ppt_tpu.prompt.learner import PromptLearner, PromptSpec, build_prompt_spec

__all__ = [
    "ClipTokenizer",
    "tokenize",
    "PromptLearner",
    "PromptSpec",
    "build_prompt_spec",
]
