#!/usr/bin/env python
"""AUC-vs-pack_budget curve on the bundled sample data.

Quantifies the quality cost of the packed-pool capacity (the reference kept
every multivalue value, dataset.py:186-191; we cap per-slot entries at
pack_budget).  Results recorded in PARITY.md; train.yaml `pack_budget: auto`
picks the p95-occupancy point of this tradeoff automatically.

Usage: python tools/pack_budget_curve.py [--budgets 1,2,3,8] [--epochs 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budgets", default="1,2,3,8")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--seeds", default="123,321")
    p.add_argument("--model_type", default="wide_deep")
    args = p.parse_args()

    import tempfile

    from wide_deep_tpu.features.analyze import suggest_pack_budget
    from wide_deep_tpu.features.plan import FeaturePlan
    from wide_deep_tpu.testing import small_config
    from wide_deep_tpu.training.loop import Trainer

    train = os.path.join(REPO, "data", "train")
    evald = os.path.join(REPO, "data", "eval", "eval1")

    cfg = small_config(tempfile.mkdtemp(prefix="wdt_curve_conf_"))
    probe = FeaturePlan(cfg, fold=False, pack_budget=3)
    auto = suggest_pack_budget(probe, train)
    print(f"# p95-occupancy suggestion (pack_budget: auto): {auto}",
          file=sys.stderr)

    for budget in [int(b) for b in args.budgets.split(",")]:
        for seed in [int(s) for s in args.seeds.split(",")]:
            tr = Trainer(
                cfg, model_type=args.model_type,
                model_dir=tempfile.mkdtemp(prefix="wdt_curve_m_"),
                overrides=dict(train_data=train, eval_data=evald,
                               test_data=evald, keep_train=True,
                               batch_size=64, num_examples=4000,
                               pack_budget=budget))
            tr.seed = seed
            assert tr.plan.pack_budget == budget
            tr.ensure_initialized(restore=False)
            for epoch in range(args.epochs):
                for f in sorted(os.listdir(train)):
                    tr.train_file(os.path.join(train, f), epoch_seed=epoch)
            res = tr.evaluate(evald)
            print(json.dumps({
                "pack_budget": budget, "seed": seed,
                "wide_pool": tr.plan.wide_packed_len,
                "pools": {f"d{g.dim}": tr.plan.group_packed_len[g.dim]
                          for g in tr.plan.groups},
                "auc": round(res["auc"], 5),
                "logloss": round(res["average_loss"], 5)}), flush=True)


if __name__ == "__main__":
    main()
