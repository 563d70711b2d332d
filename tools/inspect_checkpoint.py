#!/usr/bin/env python
"""Checkpoint inspector CLI (reference
python/lib/utils/inspect_checkpoint.py:31-60 analog): list tensors (name,
shape, dtype) in a checkpoint, optionally filtering by name and printing
values."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="inspect a wide_deep_tpu checkpoint")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--tensor_name", default=None,
                   help="substring filter on tensor names")
    p.add_argument("--print_values", action="store_true")
    args = p.parse_args()

    from wide_deep_tpu.training.checkpoint import inspect_checkpoint
    inspect_checkpoint(args.model_dir, step=args.step,
                       tensor_name=args.tensor_name,
                       print_values=args.print_values)


if __name__ == "__main__":
    main()
