#!/usr/bin/env python
"""Generate synthetic schema-conformant sample CTR data under data/.

The reference shipped 5k-row production log samples; this repo ships
synthetic data instead: same 61-column schema, realistic value shapes
(multivalue cells, '-' missing markers, hash/vocab/identity/continuous
columns), and a planted CTR signal (label depends on hour, site, age and a
few id buckets) so train/eval metrics — including AUC — are meaningful out
of the box.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wide_deep_tpu.config import Config  # noqa: E402


def make_rows(config: Config, n: int, rng: np.random.Generator,
              with_label: bool = True):
    schema = config.schema_columns()
    feature_conf = config.read_feature_conf()
    rows = []
    for _ in range(n):
        values = {}
        for name in schema[1:]:
            conf = feature_conf.get(name)
            if conf is None:
                values[name] = f"x{rng.integers(0, 1000)}"
                continue
            if conf["type"] == "continuous":
                a, b = conf["parameter"].get("normalization", [0, 1])
                if rng.random() < 0.05:
                    values[name] = "-"
                else:
                    values[name] = f"{rng.uniform(a, b):.4f}"
            elif conf["transform"] == "vocab":
                vocab = conf["parameter"]
                values[name] = str(vocab[rng.integers(0, len(vocab))])
            elif conf["transform"] == "identity":
                values[name] = str(rng.integers(0, conf["parameter"]))
            else:  # hash_bucket
                # skewed id distribution, occasional multivalue
                base = int(rng.zipf(1.3)) % 5000
                if conf.get("max_len", 1) > 1 and rng.random() < 0.5:
                    k = rng.integers(2, min(conf["max_len"], 5) + 1)
                    values[name] = ",".join(
                        f"{name[:2]}{(base + j) % 5000}" for j in range(k))
                else:
                    values[name] = f"{name[:2]}{base}"
        # planted signal: evening hours, certain sites, younger users click
        score = -2.8
        hour = int(values["hour"])
        score += 1.8 if 18 <= hour <= 23 else 0.0
        score += 1.5 if values["site"] in ("1", "2") else 0.0
        age = values["age"]
        if age not in ("-", "") and float(age) < 30:
            score += 1.2
        score += 1.0 if values["ugender"] == "male" else 0.0
        p = 1 / (1 + np.exp(-score))
        label = "1" if rng.random() < p else "0"
        row = [label if with_label else None] + [values[c] for c in schema[1:]]
        rows.append([c for c in row if c is not None])
    return rows


def write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write("\t".join(row) + "\n")
    print(f"wrote {len(rows)} rows -> {path}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", default="data")
    p.add_argument("--train_rows", type=int, default=2000)
    p.add_argument("--eval_rows", type=int, default=1000)
    p.add_argument("--seed", type=int, default=123)
    args = p.parse_args()

    config = Config()
    rng = np.random.default_rng(args.seed)
    write(os.path.join(args.out_dir, "train", "train1"),
          make_rows(config, args.train_rows, rng))
    write(os.path.join(args.out_dir, "train", "train2"),
          make_rows(config, args.train_rows, rng))
    write(os.path.join(args.out_dir, "eval", "eval1"),
          make_rows(config, args.eval_rows, rng))
    write(os.path.join(args.out_dir, "test", "test1"),
          make_rows(config, args.eval_rows, rng))
    write(os.path.join(args.out_dir, "pred", "pred1"),
          make_rows(config, 200, rng, with_label=False))
    # 10-row unit fixture (the reference shipped data/test/test2 for its
    # wide_deep_test.py:18 unit suite; this repo vendors a regenerated
    # analog so tests never depend on the reference mount — tests/paths.py)
    write(os.path.join(args.out_dir, "test", "test2"),
          make_rows(config, 10, rng))


if __name__ == "__main__":
    main()
