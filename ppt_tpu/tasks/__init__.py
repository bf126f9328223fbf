from ppt_tpu.tasks.args import TaskArgs, build_argparser, parse_args

__all__ = ["TaskArgs", "build_argparser", "parse_args"]
