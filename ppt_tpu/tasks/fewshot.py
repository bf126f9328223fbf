"""Few-shot recognition driver.

Equivalent of ``main_fewshot.py:30-304`` — the loop is byte-for-byte the
recognition loop; the only difference is the ``*_fs`` dataset whose train
split subsamples ``nshots`` items per class (``data/dataset_3d.py:
210-254``). This driver therefore delegates to the cls loop after
normalizing the dataset name and task tag.
"""

from __future__ import annotations

from ppt_tpu.tasks import cls
from ppt_tpu.tasks.args import TaskArgs


def main(args: TaskArgs):
    args.task = "fewshot"
    if not args.dataset_name.endswith("_fs") and args.dataset_name != "synthetic":
        args.dataset_name = args.dataset_name + "_fs"
    return cls.main(args)


if __name__ == "__main__":
    from ppt_tpu.tasks.args import parse_args

    main(parse_args())
