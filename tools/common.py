"""Shared CLI plumbing: conf-defaulted argparse (reference train.py:24-62
pattern — YAML supplies defaults, command line overrides YAML)."""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wide_deep_tpu.config import Config  # noqa: E402


def base_parser(description: str) -> tuple[argparse.ArgumentParser, Config]:
    # PRE-SCAN --conf_dir: argparse defaults come from the Config, and
    # overrides_from() feeds every default back into the Trainer — so the
    # defaults MUST be read from the conf dir the user named, or a custom
    # conf's train.yaml is silently clobbered by the builtin one
    # (review round 5: `--conf_dir /custom` trained with conf/'s
    # batch_size and data paths)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--conf_dir",
                     default=os.environ.get("WIDE_DEEP_CONF_DIR"))
    conf_dir = pre.parse_known_args()[0].conf_dir
    config = Config(conf_dir)
    t = config.train
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--conf_dir", default=conf_dir,
                   help="configuration directory (or WIDE_DEEP_CONF_DIR)")
    p.add_argument("--model_dir", default=t["model_dir"])
    p.add_argument("--model_type", default=t["model_type"],
                   choices=["wide", "deep", "wide_deep"])
    p.add_argument("--train_data", default=t["train_data"])
    p.add_argument("--eval_data", default=t["eval_data"])
    p.add_argument("--test_data", default=t["test_data"])
    p.add_argument("--image_train_data", default=t["image_train_data"])
    p.add_argument("--image_eval_data", default=t["image_eval_data"])
    p.add_argument("--image_test_data", default=t["image_test_data"])
    p.add_argument("--batch_size", type=int, default=t["batch_size"])
    p.add_argument("--train_epochs", type=int, default=t["train_epochs"])
    p.add_argument("--epochs_per_eval", type=int, default=t["epochs_per_eval"])
    p.add_argument("--keep_train", type=int, default=int(t["keep_train"]))
    p.add_argument("--dynamic_train", type=int,
                   default=int(t["dynamic_train"]))
    p.add_argument("--checkpoint_path", default=t["checkpoint_path"])
    p.add_argument("--pos_sample_loss_weight", type=float,
                   default=t["pos_sample_loss_weight"])
    p.add_argument("--neg_sample_loss_weight", type=float,
                   default=t["neg_sample_loss_weight"])
    p.add_argument("--eval_every_n_steps", type=int,
                   default=int(t.get("eval_every_n_steps") or 0),
                   help="interleave a full eval pass every N train steps "
                        "(0 = off; works under distribution)")
    return p, config


def setup(args) -> Config:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    config = Config(args.conf_dir) if args.conf_dir else Config()
    return config


def overrides_from(args) -> dict:
    return dict(
        model_dir=args.model_dir, model_type=args.model_type,
        train_data=args.train_data, eval_data=args.eval_data,
        test_data=args.test_data, batch_size=args.batch_size,
        train_epochs=args.train_epochs, epochs_per_eval=args.epochs_per_eval,
        keep_train=bool(args.keep_train),
        dynamic_train=bool(args.dynamic_train),
        checkpoint_path=args.checkpoint_path,
        pos_sample_loss_weight=args.pos_sample_loss_weight,
        neg_sample_loss_weight=args.neg_sample_loss_weight,
        image_train_data=args.image_train_data,
        image_eval_data=args.image_eval_data,
        image_test_data=args.image_test_data,
        eval_every_n_steps=args.eval_every_n_steps)


def maybe_init_distributed(config: Config, force: bool = False):
    """Multi-host SPMD bring-up (replaces TF_CONFIG/ClusterSpec,
    build_estimator.py:172-198).  Env vars WDT_COORDINATOR /
    WDT_NUM_PROCESSES / WDT_PROCESS_INDEX override the YAML (the launcher
    scripts/run_distributed.sh sets them per host)."""
    dist = dict(config.distribution)
    if os.environ.get("WDT_COORDINATOR"):
        dist["is_distribution"] = True
        dist["coordinator"] = os.environ["WDT_COORDINATOR"]
        # env overrides fall back to the YAML values when only SOME of
        # the vars are exported — defaulting to 1/0 here silently turned
        # a 4-process launch into independent single-process jobs when
        # an operator exported only WDT_COORDINATOR
        dist["num_processes"] = int(
            os.environ.get("WDT_NUM_PROCESSES")
            or dist.get("num_processes") or 1)
        dist["process_index"] = int(
            os.environ.get("WDT_PROCESS_INDEX")
            or dist.get("process_index") or 0)
    if force:
        dist["is_distribution"] = True
    if dist.get("is_distribution") and int(dist.get("num_processes") or 1) > 1:
        import jax
        jax.distributed.initialize(
            coordinator_address=dist["coordinator"],
            num_processes=dist["num_processes"],
            process_id=dist["process_index"])
    return dist


def write_pid_file():
    os.makedirs("logs", exist_ok=True)
    with open(os.path.join("logs", "train.pid"), "w") as f:
        f.write(str(os.getpid()))
