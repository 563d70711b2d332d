#!/usr/bin/env python
"""On-chip quality parity measurement (VERDICT r3 weak #7).

Re-runs PARITY.md's two measurements on the real TPU with the PRODUCTION
config (full 12.7M-row wide space, fused tables, sparse optimizer):

  A. reference-data convergence: wide_deep, 2 epochs over
     /root/reference/data/train, eval on /root/reference/data/eval after
     each epoch (logloss -> base-rate entropy, accuracy 1.0 — the bundled
     eval split has zero positives, PARITY.md "Data reality check").
  B. learnable-signal AUC: each model type, 5 epochs over the repo's
     synthetic data/train (planted CTR signal), eval AUC on data/eval.

Prints a markdown table per part.  ~15 min through the remote tunnel
(compiles dominate; batch 64 to match the recorded CPU tables).

  timeout 1700 python tools/quality_onchip.py [--part A|B|AB]
"""

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# optional reference-data parity runs: fall back to the vendored sample
# when the reference mount is absent (this tool's part A is a parity
# check against the reference's OWN bundled data when available)
REF = ("/root/reference/data" if os.path.isdir("/root/reference/data")
       else os.path.join(REPO, "data"))


def _release(tr):
    """Free the Trainer's device state (the fused d32 table is ~5 GB —
    two live Trainers OOM the chip; see .claude verify notes)."""
    tr.params = tr.mstate = tr.opt_state = None
    if tr._ckpt is not None:
        tr._ckpt.close()
    gc.collect()


def part_a():
    import jax

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.training.loop import Trainer
    print(f"# Part A: reference-data convergence "
          f"(device: {jax.devices()[0]})", flush=True)
    config = Config()
    import tempfile
    tr = Trainer(config, model_type="wide_deep",
                 model_dir=tempfile.mkdtemp(prefix="wdt_parity_"),
                 overrides=dict(train_data=f"{REF}/train",
                                eval_data=f"{REF}/eval",
                                test_data=f"{REF}/eval",
                                keep_train=True, batch_size=64))
    tr.ensure_initialized(restore=False)
    print("| epoch | eval logloss | accuracy | prediction/mean |")
    print("|---|---|---|---|")
    for epoch in range(2):
        for f in sorted(os.listdir(f"{REF}/train")):
            tr.train_file(os.path.join(REF, "train", f), epoch_seed=epoch)
        res = tr.evaluate(f"{REF}/eval")
        print(f"| {epoch} | {res['average_loss']:.4f} "
              f"| {res['accuracy']:.4f} | {res['prediction/mean']:.4f} |",
              flush=True)
    _release(tr)


def part_b():
    import tempfile

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.training.loop import Trainer
    train = os.path.join(REPO, "data", "train")
    ev = os.path.join(REPO, "data", "eval", "eval1")
    print("# Part B: learnable-signal AUC (production config, 5 epochs, "
          "batch 64)", flush=True)
    print("| model_type | eval AUC | logloss | prediction/mean |")
    print("|---|---|---|---|")
    for model_type in ("wide", "deep", "wide_deep"):
        t0 = time.time()
        config = Config()
        tr = Trainer(config, model_type=model_type,
                     model_dir=tempfile.mkdtemp(prefix="wdt_q_"),
                     overrides=dict(train_data=train, eval_data=ev,
                                    test_data=ev, keep_train=True,
                                    batch_size=64, num_examples=4000))
        tr.ensure_initialized(restore=False)
        for epoch in range(5):
            for f in sorted(os.listdir(train)):
                tr.train_file(os.path.join(train, f), epoch_seed=epoch)
        res = tr.evaluate(ev)
        print(f"| {model_type} | {res['auc']:.4f} "
              f"| {res['average_loss']:.4f} | {res['prediction/mean']:.4f} |"
              f"  <!-- {time.time()-t0:.0f}s -->", flush=True)
        _release(tr)
        del tr
        gc.collect()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="AB")
    args = ap.parse_args()
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    if "A" in args.part:
        part_a()
    if "B" in args.part:
        part_b()


if __name__ == "__main__":
    main()
