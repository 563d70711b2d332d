#!/usr/bin/env python
"""Evaluation CLI (reference python/eval.py analog): one-shot evaluate over
test data from the latest (or an explicit) checkpoint, printing the sorted
metric set."""

from common import base_parser, overrides_from, setup


def main():
    parser, _ = base_parser("wide_deep_tpu evaluation")
    args, unknown = parser.parse_known_args()
    if unknown:
        # lenient for forward-compat, but NEVER silent: a typo'd
        # flag otherwise trains for hours under config defaults
        print(f"WARNING: ignoring unrecognized arguments: "
              f"{unknown}", flush=True)
    config = setup(args)

    from wide_deep_tpu.training.loop import Trainer
    trainer = Trainer(config, model_type=args.model_type,
                      overrides=overrides_from(args))
    results = trainer.evaluate(args.test_data,
                               checkpoint_path=args.checkpoint_path)
    print("-" * 72)
    for key in sorted(results):
        print(f"{key}: {results[key]}")


if __name__ == "__main__":
    main()
