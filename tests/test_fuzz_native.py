"""Seeded fuzz parity: the C++ loader must stay bit-identical to the
Python transformer on ADVERSARIAL inputs, not just clean samples — the
production loader sees truncated logs, junk encodings, and out-of-range
numerics long before a human does.  (The reference never fuzzed its
dataset.py at all; its decode_csv simply errored the whole batch.)"""

import numpy as np
import pytest


def _adversarial_cell(rng, kind):
    junk = [
        "", "-", " ", "NaN", "nan", "inf", "-inf", "1e309", "-1e309",
        "0x1f", "9" * 40, "-" * 5, "null", "None", "\x00", "\xff\xfe",
        "值", "💥", "a,b,c,d,e,f,g,h,i,j,k,l,m,n,o,p",
        ",", ",,,", "a,,b", ",leading", "trailing,", "+5", "5.5.5",
        " 12 ", "1 2", "TRUE", "-0", "0.0", "1e-45", "3.402823e38",
    ]
    if rng.random() < 0.5:
        return junk[rng.integers(0, len(junk))]
    if kind == "num":
        return f"{rng.normal() * 10.0 ** int(rng.integers(-3, 6)):.6g}"
    return f"v{rng.integers(0, 10 ** rng.integers(1, 9))}"


def _fuzz_rows(plan, n, seed, arity_junk=False):
    """Cell-level junk always; arity junk (short/long rows) only for the
    raw-TEXT path — the row-level transform receives arity-validated rows
    by contract (CsvDataset._rows filters them; the C++ text path masks
    them itself)."""
    rng = np.random.default_rng(seed)
    n_cols = len(plan.columns)
    rows = []
    for _ in range(n):
        row = [_adversarial_cell(rng, "num" if rng.random() < 0.3
                                 else "cat") for _ in range(n_cols)]
        row[0] = str(rng.integers(0, 2))
        if arity_junk and rng.random() < 0.1:
            k = int(rng.integers(1, n_cols + 8))
            row = row[:k] + ["x"] * max(0, k - len(row))
        rows.append(row)
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_bit_identical(plan, seed):
    from wide_deep_tpu.features import native
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    if not native.NativeTransformer.available():
        pytest.skip("native lib not built")
    rows = _fuzz_rows(plan, 64, seed)
    py = FeatureTransformer(plan).transform(rows, 64)
    nat = native.NativeTransformer(plan).transform(rows, 64)
    assert set(py) == set(nat)
    for k in sorted(py):
        np.testing.assert_array_equal(np.asarray(py[k]), np.asarray(nat[k]),
                                      err_msg=f"seed {seed} key {k}")
    # every emitted value must be finite (junk numerics cannot poison
    # the device step with inf/nan)
    for k, v in py.items():
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            assert np.isfinite(a).all(), (seed, k)


def test_fuzz_text_path_no_crash(plan):
    """transform_text on raw adversarial BYTES (encoding junk, blank and
    truncated lines): parses what it can, masks the rest, never crashes."""
    from wide_deep_tpu.features import native
    if not native.NativeTransformer.available():
        pytest.skip("native lib not built")
    rows = _fuzz_rows(plan, 48, 9, arity_junk=True)
    lines = [("\t".join(r)).encode("utf-8", "replace") for r in rows]
    lines.insert(3, b"")
    lines.insert(7, b"\xff\xfe\x00broken")
    lines.insert(11, lines[0][: max(1, len(lines[0]) // 3)])
    blob = b"\n".join(lines) + b"\n"
    batch = native.NativeTransformer(plan).transform_text(blob, 64, 64)
    assert 0 <= int(batch["mask"].sum()) <= 64
    for k, v in batch.items():
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            assert np.isfinite(a).all(), k


def test_duplicate_vocab_entry_parity(small_config, tmp_path):
    """A DUPLICATE vocab value must resolve to its LAST index on both
    loaders (Python dict comprehension semantics) — the C++ map
    previously kept the FIRST (emplace), silently skewing indicator ids
    between the native trainer and Python-path consumers."""
    import shutil

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.features import native
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    from wide_deep_tpu.features.plan import FeaturePlan
    if not native.NativeTransformer.available():
        pytest.skip("native lib not built")
    conf2 = tmp_path / "conf"
    shutil.copytree(small_config.conf_dir, conf2)
    feat = (conf2 / "feature.yaml").read_text()
    assert "parameter: [0, 1, 2, 3, 4, 5]}" in feat  # the os vocab
    feat = feat.replace(
        "os:                 {type: category, transform: vocab, "
        "parameter: [0, 1, 2, 3, 4, 5]}",
        "os:                 {type: category, transform: vocab, "
        "parameter: [0, 1, 2, 0, 4, 5]}")  # '0' duplicated at index 3
    (conf2 / "feature.yaml").write_text(feat)
    plan = FeaturePlan(Config(str(conf2)))
    from paths import UNIT_FIXTURE
    with open(UNIT_FIXTURE) as f:
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    col = plan.column_index["os"]
    for r in rows:
        r[col] = "0"  # every row hits the duplicated value
    py = FeatureTransformer(plan).transform(rows, 16)
    nat = native.NativeTransformer(plan).transform(rows, 16)
    for k in py:
        np.testing.assert_array_equal(np.asarray(py[k]),
                                      np.asarray(nat[k]), err_msg=k)


def test_max_len_cap_rejected_at_config(small_config, tmp_path):
    """max_len > 64 overflows the native loader's fixed split buffer —
    must be rejected at config-parse time."""
    import shutil

    from wide_deep_tpu.config import Config, ConfigError
    conf2 = tmp_path / "conf"
    shutil.copytree(small_config.conf_dir, conf2)
    feat = (conf2 / "feature.yaml").read_text()
    assert "max_len" in feat
    import re
    feat = re.sub(r"max_len: \d+", "max_len: 100", feat, count=1)
    (conf2 / "feature.yaml").write_text(feat)
    with pytest.raises(ConfigError, match="max_len must be <= 64"):
        Config(str(conf2)).read_feature_conf()
