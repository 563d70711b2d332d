#!/usr/bin/env python
"""Prediction CLI (reference python/pred.py analog): stream per-row class id
and probability for unlabeled TSV data."""

from common import base_parser, overrides_from, setup


def main():
    parser, _ = base_parser("wide_deep_tpu prediction")
    parser.add_argument("--data_dir", default=None,
                        help="prediction data (defaults to test_data)")
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
    for i, pred in enumerate(trainer.predict(args.data_dir or args.test_data)):
        class_id = int(pred["class_ids"])
        prob = float(pred["probabilities"][class_id])
        print(f"{i}\tclass: {class_id}\tprobability: {prob:.6f}")


if __name__ == "__main__":
    main()
