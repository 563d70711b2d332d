#!/usr/bin/env python
"""Training CLI (reference python/train.py analog).

Modes (train.py:196-214 semantics):
  dynamic_train=1  -> rolling-window train/test over sorted files
  distributed      -> plain train loop (eval disabled, train.py:213-214)
  otherwise        -> train_and_eval
"""

from common import (base_parser, maybe_init_distributed, overrides_from,
                    setup, write_pid_file)


def main():
    parser, _ = base_parser("wide_deep_tpu training")
    parser.add_argument("--distributed", type=int, default=0,
                        help="force multi-host mode (launcher sets env vars)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of training here")
    args, unknown = parser.parse_known_args()
    if unknown:
        # lenient for forward-compat, but NEVER silent: a typo'd
        # flag otherwise trains for hours under config defaults
        print(f"WARNING: ignoring unrecognized arguments: "
              f"{unknown}", flush=True)
    config = setup(args)
    write_pid_file()
    dist = maybe_init_distributed(config, force=bool(args.distributed))

    from wide_deep_tpu.training.loop import Trainer
    from wide_deep_tpu.utils import profile_trace
    trainer = Trainer(config, model_type=args.model_type,
                      overrides=overrides_from(args))
    trainer.maybe_wipe_model_dir()
    try:
        with profile_trace(args.profile_dir):
            if dist.get("is_distribution"):
                # interleaved eval is disabled in distributed mode
                # (train.py:213-214)
                trainer.train()
            elif args.dynamic_train:
                trainer.dynamic_train()
            else:
                trainer.train_and_eval()
    except KeyboardInterrupt:
        # graceful stop (the reference tore down with kill -9,
        # kill_ps.sh:3): persist progress so keep_train resumes cleanly
        if trainer.params is not None and trainer.global_step > 0:
            print(f"interrupted at step {trainer.global_step}; "
                  "saving checkpoint...", flush=True)
            trainer.save()
        raise SystemExit(130)


if __name__ == "__main__":
    main()
