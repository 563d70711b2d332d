#!/usr/bin/env python
"""Quality-breadth matrix: AUC of every model variant on a large synthetic
CTR set at realistic positive rate.

The reference never measured the quality of its DNN connectivity variants
(reference python/lib/dnn.py:92-224 defines them; no test or benchmark
trains them to a bar) — this tool does: it generates a >=1M-row CTR
dataset with a planted signal at a production-like positive rate
(default 8%), trains each variant on identical data, and reports
eval AUC (accuracy for the multiclass head) against the `simple`
wide_deep baseline.  Results are committed to PARITY.md.

Variants covered: wide-only, deep-only, wide_deep x connectivity
{simple, first_dense, last_dense, dense, resnet, explicit DAG},
multi-tower, FM on, and the multiclass (n_classes=3) head.

Quality is hardware-independent; this runs on CPU (JAX_PLATFORMS=cpu) so
the matrix is reproducible anywhere.  Usage:

    env WDT_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=1 \
        python tools/quality_matrix.py --rows 1000000
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(conf_dir: str, path: str, n: int, seed: int, pos_rate: float,
             n_classes: int = 2) -> float:
    """Vectorized schema-conformant TSV generator (planted signal,
    base-rate shifted to ``pos_rate``) — shared implementation in
    wide_deep_tpu.testing.generate_ctr_tsv."""
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.testing import generate_ctr_tsv
    t0 = time.time()
    achieved = generate_ctr_tsv(Config(conf_dir), path, n, seed,
                                pos_rate, n_classes)
    print(f"  wrote {n} rows -> {path} ({time.time()-t0:.0f}s, "
          f"pos/mid rate {achieved:.3f})", flush=True)
    return achieved


def conf_for(base_conf: str, dst: str, *, connected_mode=None,
             hidden_units=None, fm_factors=None) -> str:
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(base_conf, dst)
    path = os.path.join(dst, "model.yaml")
    with open(path) as f:
        text = f.read()
    if connected_mode is not None:
        text = text.replace("dnn_connected_mode: simple",
                            f"dnn_connected_mode: {connected_mode}")
    if hidden_units is not None:
        import re
        text = re.sub(r"dnn_hidden_units: .*",
                      f"dnn_hidden_units: {hidden_units}", text, count=1)
    if fm_factors is not None:
        text = text.replace("linear_fm_factors: 0",
                            f"linear_fm_factors: {fm_factors}")
    with open(path, "w") as f:
        f.write(text)
    return dst


def run_variant(name, conf_dir, model_type, train_path, eval_path, out_dir,
                batch_size, n_classes=2):
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.training.loop import Trainer
    t0 = time.time()
    tr = Trainer(Config(conf_dir), model_type=model_type,
                 model_dir=os.path.join(out_dir, name),
                 n_classes=n_classes,
                 overrides=dict(train_data=train_path, eval_data=eval_path,
                                test_data=eval_path, keep_train=False,
                                batch_size=batch_size,
                                num_examples=2_000_000))
    tr.ensure_initialized(restore=False)
    tr.train_file(train_path)
    res = tr.evaluate(eval_path)
    metric = res.get("auc", res.get("accuracy"))
    row = {"variant": name, "model_type": model_type,
           "n_classes": n_classes,
           "auc": round(float(res["auc"]), 4) if "auc" in res else None,
           "accuracy": round(float(res.get("accuracy", 0)), 4),
           "logloss": round(float(res["loss"]), 4),
           "train_s": round(time.time() - t0, 1)}
    print(f"  {name:24s} metric={metric:.4f} loss={res['loss']:.4f} "
          f"({row['train_s']}s)", flush=True)
    return row


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--eval_rows", type=int, default=100_000)
    p.add_argument("--pos_rate", type=float, default=0.08)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--work_dir", default="/tmp/wdt_quality_matrix")
    p.add_argument("--only", default="",
                   help="comma list of variant names to run (default all)")
    args = p.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    from wide_deep_tpu.testing import write_small_conf
    base = write_small_conf(os.path.join(args.work_dir, "conf_base"),
                            hidden_units="[64, 32]",
                            batch_size=args.batch_size)

    train2 = os.path.join(args.work_dir, "train2.tsv")
    eval2 = os.path.join(args.work_dir, "eval2.tsv")
    train3 = os.path.join(args.work_dir, "train3.tsv")
    eval3 = os.path.join(args.work_dir, "eval3.tsv")
    # marker written only after ALL four files are complete, keyed by the
    # generation params — an interrupted or re-parameterized run
    # regenerates instead of silently training/evaluating on truncated
    # or stale files
    marker = os.path.join(args.work_dir, "dataset.json")
    want = {"rows": args.rows, "eval_rows": args.eval_rows,
            "pos_rate": args.pos_rate, "seed": args.seed}
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f)
    print("generating data...", flush=True)
    if have != want:
        generate(base, train2, args.rows, args.seed, args.pos_rate)
        generate(base, eval2, args.eval_rows, args.seed + 1, args.pos_rate)
        generate(base, train3, args.rows // 4, args.seed + 2, args.pos_rate,
                 n_classes=3)
        generate(base, eval3, args.eval_rows, args.seed + 3, args.pos_rate,
                 n_classes=3)
        with open(marker, "w") as f:
            json.dump(want, f)

    cd = os.path.join(args.work_dir, "conf")
    variants = [
        ("wide", base, "wide", 2),
        ("deep_simple", base, "deep", 2),
        ("wide_deep_simple", base, "wide_deep", 2),
        ("wd_first_dense",
         conf_for(base, cd + "_fd", connected_mode="first_dense"),
         "wide_deep", 2),
        ("wd_last_dense",
         conf_for(base, cd + "_ld", connected_mode="last_dense"),
         "wide_deep", 2),
        ("wd_dense", conf_for(base, cd + "_d", connected_mode="dense"),
         "wide_deep", 2),
        ("wd_resnet", conf_for(base, cd + "_r", connected_mode="resnet"),
         "wide_deep", 2),
        ("wd_dag_0-1_0-2_1-2",
         conf_for(base, cd + "_dag", connected_mode="[0-1, 0-2, 1-2]"),
         "wide_deep", 2),
        ("wd_multitower",
         conf_for(base, cd + "_mt", hidden_units="[[64, 32], [32, 16]]"),
         "wide_deep", 2),
        ("wd_fm8", conf_for(base, cd + "_fm", fm_factors=8),
         "wide_deep", 2),
        ("wd_multiclass3", base, "wide_deep", 3),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    rows = []
    for name, conf_dir, model_type, n_classes in variants:
        tr_path, ev_path = (train2, eval2) if n_classes == 2 else (
            train3, eval3)
        rows.append(run_variant(name, conf_dir, model_type, tr_path,
                                ev_path, os.path.join(args.work_dir, "m"),
                                args.batch_size, n_classes))

    out = os.path.join(args.work_dir, "quality_matrix.json")
    with open(out, "w") as f:
        json.dump({"rows": args.rows, "pos_rate": args.pos_rate,
                   "batch_size": args.batch_size, "results": rows}, f,
                  indent=1)
    print(f"results -> {out}")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
