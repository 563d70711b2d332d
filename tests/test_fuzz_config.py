"""Config-level fuzz: randomized feature configurations through the whole
plan-compile -> transform chain, with Python/C++ parity.

The unit suite exercises the SHIPPED conf shapes; this generates small
random configs (random transform mix, dims, multivalue caps, crosses,
boundaries) and asserts the plan compiles, both transformers emit
identical batches on random rows, and the emitted shapes honor the plan's
batch_spec — catching plan-compiler edge cases no fixed conf reaches."""

import numpy as np
import pytest
import yaml


def _random_conf(tmp_path, rng, tag):
    """A tiny schema + feature/cross conf drawn at random."""
    n_feats = int(rng.integers(4, 9))
    names = [f"f{i}" for i in range(n_feats)]
    schema = ["clk"] + names
    features = {}
    continuous = []
    categorical = []
    for name in names:
        kind = rng.choice(["hash", "vocab", "identity", "continuous",
                           "unused"])
        if kind == "hash":
            features[name] = {
                "type": "category", "transform": "hash_bucket",
                "parameter": int(rng.integers(8, 400)),
                "max_len": int(rng.choice([1, 1, 3, 5]))}
            categorical.append(name)
        elif kind == "vocab":
            vocab = [f"v{j}" for j in range(int(rng.integers(2, 9)))]
            features[name] = {"type": "category", "transform": "vocab",
                              "parameter": vocab}
            categorical.append(name)
        elif kind == "identity":
            features[name] = {"type": "category", "transform": "identity",
                              "parameter": int(rng.integers(2, 30))}
            categorical.append(name)
        elif kind == "continuous":
            lo = float(rng.uniform(-10, 10))
            hi = lo + float(rng.uniform(1, 50))
            n_bounds = int(rng.integers(0, 5))
            param = {"normalization": [lo, hi]}
            if n_bounds:
                param["boundaries"] = sorted(
                    float(rng.uniform(lo, hi)) for _ in range(n_bounds))
            features[name] = {"type": "continuous",
                              "transform": str(rng.choice(
                                  ["min_max", "standard", "log"])),
                              "parameter": param}
            continuous.append(name)
        # "unused": present in schema, absent from feature conf
    crosses = {}
    pool = [n for n in categorical
            if features[n].get("max_len", 1) == 1] + [
            n for n in continuous
            if "boundaries" in features[n]["parameter"]]
    for k in range(int(rng.integers(0, 3))):
        if len(pool) < 2:
            break
        a, b = rng.choice(pool, size=2, replace=False)
        crosses[f"{a}&{b}"] = {
            "hash_bucket_size": float(rng.choice([0.1, 0.5, 1, 2])),
            "is_deep": int(rng.integers(0, 2))}

    conf = tmp_path / f"conf_{tag}"
    conf.mkdir()
    (conf / "schema.yaml").write_text(yaml.safe_dump(
        {i + 1: c for i, c in enumerate(schema)}))
    (conf / "feature.yaml").write_text(yaml.safe_dump(features))
    (conf / "cross_feature.yaml").write_text(yaml.safe_dump(crosses))
    # model/train/serving: reuse the shipped files (schema-independent)
    import os
    import shutil
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in ("model.yaml", "train.yaml", "serving.yaml",
              "data_process.yaml"):
        shutil.copy(os.path.join(repo, "conf", f), conf / f)
    return str(conf), schema, features


def _random_rows(rng, schema, features, n):
    rows = []
    for _ in range(n):
        row = [str(rng.integers(0, 2))]
        for name in schema[1:]:
            conf = features.get(name)
            if conf is None:
                row.append(f"x{rng.integers(0, 50)}")
            elif conf["type"] == "continuous":
                row.append("-" if rng.random() < 0.1
                           else f"{rng.uniform(-20, 60):.3f}")
            elif conf["transform"] == "vocab":
                vocab = conf["parameter"]
                row.append("oov" if rng.random() < 0.2
                           else str(vocab[rng.integers(0, len(vocab))]))
            elif conf["transform"] == "identity":
                row.append(str(rng.integers(-2, conf["parameter"] + 3)))
            else:
                k = (rng.integers(1, conf.get("max_len", 1) + 2)
                     if conf.get("max_len", 1) > 1 else 1)
                row.append(",".join(f"h{rng.integers(0, 1000)}"
                                    for _ in range(k)))
        rows.append(row)
    return rows


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_random_config_plan_and_parity(tmp_path, seed):
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.features import native
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    from wide_deep_tpu.features.plan import FeaturePlan
    rng = np.random.default_rng(seed)
    conf_dir, schema, features = _random_conf(tmp_path, rng, seed)
    config = Config(conf_dir)
    plan = FeaturePlan(config)
    rows = _random_rows(rng, schema, features, 24)
    py = FeatureTransformer(plan).transform(rows, 32)
    # shapes honor the plan's contract
    spec = plan.batch_spec(32)
    for key, (shape, dt) in spec.items():
        assert tuple(py[key].shape) == tuple(shape), key
        assert py[key].dtype == dt, key
    for k, v in py.items():
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            assert np.isfinite(a).all(), k
    if native.NativeTransformer.available():
        nat = native.NativeTransformer(plan).transform(rows, 32)
        assert set(py) == set(nat)
        for k in sorted(py):
            np.testing.assert_array_equal(
                np.asarray(py[k]), np.asarray(nat[k]),
                err_msg=f"seed {seed} key {k}")
