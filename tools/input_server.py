#!/usr/bin/env python
"""Multi-host input-service loader (features/input_service.py).

Runs on a loader host: iterates the training data at the GLOBAL batch
size, emits every per-batch kernel plan with the C++ loader, and serves
each jax.distributed training process its slice over framed TCP.  Point
the trainers at it via train.yaml ``distribution.input_service:
"loader:port"`` — the per-shard Pallas scatter/window/sparse-optimizer
plans then survive multi-process meshes (training/loop.py's gate).

The plan here MUST match the trainers' bit-for-bit: both sides build it
through training/loop.build_training_plan from the same conf directory;
--n_devices/--n_procs describe the TRAINING topology (the loader host
needs no accelerators — set JAX_PLATFORMS=cpu).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.config import Config
    config = Config(os.environ.get("WIDE_DEEP_CONF_DIR"))
    train_conf = dict(config.train)
    p = argparse.ArgumentParser(description="wide_deep_tpu input service")
    p.add_argument("--port", type=int, default=8600)
    p.add_argument("--n_devices", type=int, required=True,
                   help="TOTAL devices of the training mesh")
    p.add_argument("--n_procs", type=int, required=True,
                   help="jax.distributed process count of the trainers")
    p.add_argument("--proc_start", type=int, default=0,
                   help="first GLOBAL proc index this loader serves "
                        "(pod-scale sharded loaders: run one loader per "
                        "host group, same conf/seed on each)")
    p.add_argument("--proc_count", type=int, default=None,
                   help="how many procs this loader serves (default: all)")
    p.add_argument("--model_type", default=train_conf["model_type"])
    p.add_argument("--batch_size", type=int,
                   default=train_conf["batch_size"],
                   help="GLOBAL batch size (must match the trainers')")
    p.add_argument("--n_classes", type=int, default=2,
                   help="label cardinality (must match the trainers'; "
                        "multiclass labels encode differently)")
    p.add_argument("--train_data", default=train_conf.get("train_data"))
    p.add_argument("--image_train_data",
                   default=train_conf.get("image_train_data"),
                   help="image TFRecords for joint CNN training: the "
                        "loader composes them with the CSV stream "
                        "(features/image.ImageCsvDataset) and each "
                        "process gets its aligned [b, H, W, C] slice")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    train_conf["batch_size"] = args.batch_size
    if args.train_data:
        train_conf["train_data"] = args.train_data

    from wide_deep_tpu.features.input_service import InputServer
    from wide_deep_tpu.features.pipeline import (CsvDataset,
                                                 default_transformer)
    from wide_deep_tpu.training.loop import build_training_plan

    plan, _, _ = build_training_plan(
        config, train_conf, args.model_type, args.n_devices,
        n_procs=args.n_procs, global_batch_input=True)
    seed = int(config.runconfig["tf_random_seed"])
    transformer = default_transformer(
        plan, args.n_classes,
        pos_weight=train_conf.get("pos_sample_loss_weight"),
        neg_weight=train_conf.get("neg_sample_loss_weight"),
        num_parallel_calls=train_conf.get("num_parallel_calls"))

    with_cnn = bool(config.model.get("cnn_use_flag")) and args.image_train_data

    def dataset_factory(path, mode, epoch_seed):
        # mirrors Trainer._dataset with num_shards=1: the SERVICE is the
        # one host that sees the global batch
        kwargs = dict(
            n_classes=args.n_classes,
            pos_weight=train_conf.get("pos_sample_loss_weight"),
            neg_weight=train_conf.get("neg_sample_loss_weight"),
            shuffle_buffer=int(train_conf["num_examples"]),
            seed=seed + int(epoch_seed), transformer=transformer)
        if with_cnn:
            from wide_deep_tpu.features.image import ImageCsvDataset
            from wide_deep_tpu.models.cnn import CnnSpec
            cs = CnnSpec.from_model_conf(config.model)
            return ImageCsvDataset(
                plan, path, args.image_train_data, mode, args.batch_size,
                height=cs.height, width=cs.width, channels=cs.channels,
                **kwargs)
        return CsvDataset(plan, path, mode, args.batch_size, **kwargs)

    # stream-identity handshake: trainers send the same digest computed
    # from THEIR config; a loader started with a divergent seed/conf/batch
    # rejects at hello instead of corrupting the reassembled global batch
    from wide_deep_tpu.features.input_service import (data_digest,
                                                      stream_fingerprint)
    fingerprint = stream_fingerprint(
        seed, args.batch_size, args.n_classes, plan.scatter_shards,
        args.n_procs, pos_weight=train_conf.get("pos_sample_loss_weight"),
        neg_weight=train_conf.get("neg_sample_loss_weight"),
        model_type=args.model_type,
        shuffle_buffer=int(train_conf["num_examples"]))
    def digest_with_mode(path):
        """data_digest + the dataset's effective iteration path: the fast
        (byte-slurp, precomputed order) and streaming paths are both
        deterministic but produce DIFFERENT orders, so a loader fleet
        mixing them (e.g. one host's getsize failing over to streaming)
        must fail the stream-id cross-check, not serve divergent slices."""
        ds = dataset_factory(path, "train", 0)
        fast = getattr(ds, "_fast_path_ok", lambda: False)()
        return f"{data_digest(path)}-{'fast' if fast else 'stream'}"

    server = InputServer(dataset_factory, n_procs=args.n_procs,
                         scatter_shards=plan.scatter_shards, port=args.port,
                         proc_start=args.proc_start,
                         proc_count=args.proc_count,
                         fingerprint=fingerprint,
                         data_digest_fn=digest_with_mode)
    server.start()
    print(f"input service on :{server.port} "
          f"(procs [{server.proc_start}, "
          f"{server.proc_start + server.proc_count}) of {args.n_procs}, "
          f"{plan.scatter_shards} table shards)",
          flush=True)
    try:
        import threading
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
