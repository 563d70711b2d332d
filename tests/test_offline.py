"""Offline preprocessing tests (reference data_process_local_test.py role)."""

import os

import pytest

from wide_deep_tpu.offline import ctr_features as cf
from wide_deep_tpu.offline.local_job import local_data_preprocess
from paths import TRAIN1


class TestCtrFeatures:
    def test_dates(self):
        assert cf.gen_dates("20180220", 3) == ["20180220", "20180219",
                                               "20180218"]
        assert cf.list_dates("20180228", "20180302") == [
            "20180228", "20180301", "20180302"]

    def test_rate_map(self):
        rows = [["0", "F"], ["0", "M"], ["1", "M"], ["0", "M"]]
        rates = cf.ctr_rate_map(rows, 2)
        assert rates["F"] == 0.0
        assert abs(rates["M"] - 1 / 3) < 1e-9

    def test_append_columns(self):
        row = ["0", "M"]
        out = cf.append_rate_columns(row, [(2, {"M": 0.25}), (2, {})])
        assert out == ["0", "M", "0.25", "0.0"]
        assert row == ["0", "M"]  # input untouched

    def test_downsampling_stratified(self):
        neg = [["0", str(i)] for i in range(4000)]
        pos = [["1", str(i)] for i in range(50)]
        kept = [r for r in neg + pos if cf.keep_row(r, 0.01)]
        kept_pos = [r for r in kept if r[0] == "1"]
        assert len(kept_pos) == 50  # all positives kept
        # about 1% of negatives
        assert 10 <= len(kept) - 50 <= 100
        # deterministic
        kept2 = [r for r in neg + pos if cf.keep_row(r, 0.01)]
        assert kept == kept2

    def test_process_day(self):
        day = [["0", "M"], ["1", "F"]]
        window = {1: day, 7: day + [["1", "M"]], 30: day + [["1", "M"],
                                                            ["0", "F"]]}
        out = list(cf.process_day(day, window, [2], keep_prob=1.0))
        # 3 windows x 1 feature = 3 new columns
        assert all(len(r) == 5 for r in out)
        # 1-day rate for M is 0; 7-day rate is 1/2
        assert out[0][2] == "0.0"
        assert out[0][3] == "0.5"


class TestLocalJob:
    def test_end_to_end(self, tmp_path):
        inroot = tmp_path / "in"
        (inroot / "20180112").mkdir(parents=True)
        with open(TRAIN1) as f:
            text = f.read()
        (inroot / "20180112" / "part-00000").write_text(text)
        in_rows = [l.split("\t") for l in text.splitlines() if l.strip()]
        in_pos = sum(1 for r in in_rows if r[0] == "1")
        in_neg = len(in_rows) - in_pos
        assert in_pos and in_neg, "fixture must carry both classes"
        n = local_data_preprocess(
            str(inroot), str(tmp_path / "out"), "20180112",
            feature_index_list=[9], keep_prob=0.05)
        out_dir = tmp_path / "out" / "20180112"
        parts = sorted(os.listdir(out_dir))
        assert parts == ["part-00000", "part-00001"]
        rows = []
        for part in parts:
            with open(out_dir / part) as f:
                rows += [line.rstrip("\n").split("\t") for line in f]
        assert len(rows) == n
        # every positive survives; negatives downsampled at keep_prob
        assert sum(1 for r in rows if r[0] == "1") == in_pos
        assert n - in_pos < in_neg * 0.15
        # one new column appended per window (3 windows x 1 feature)
        assert len(rows[0]) == 61 + 3
        for r in rows[:5]:
            for extra in r[61:]:
                assert 0.0 <= float(extra) <= 1.0

    def test_golden_fixture_regenerates_byte_identical(self, tmp_path):
        """data/spark/ is the committed output of this job on the bundled
        sample data (the reference ships data/spark/part-0000{0,1} the same
        way, produced by spark/data_process.py:116).  Deterministic
        row-seeded sampling makes regeneration byte-identical — any logic
        drift fails here."""
        import filecmp

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        golden = os.path.join(repo, "data", "spark", "20180112")
        inroot = tmp_path / "in"
        (inroot / "20180112").mkdir(parents=True)
        with open(os.path.join(repo, "data", "train", "train1")) as f:
            (inroot / "20180112" / "part-00000").write_text(f.read())
        local_data_preprocess(
            str(inroot), str(tmp_path / "out"), "20180112",
            feature_index_list=[9], keep_prob=0.05)
        out_dir = tmp_path / "out" / "20180112"
        assert sorted(os.listdir(out_dir)) == sorted(os.listdir(golden))
        for part in os.listdir(golden):
            assert filecmp.cmp(os.path.join(golden, part),
                               os.path.join(out_dir, part), shallow=False), \
                f"{part} diverged from the committed data/spark fixture"


class TestDataFrameFlavor:
    """The reference's SECOND validation path: join-shaped rate columns +
    stratified sampleBy (data_process_local_test.py:26-49) — must agree
    with the RDD math on the rates and sampling invariants."""

    def test_rates_match_rdd_math_and_join_semantics(self):
        from wide_deep_tpu.offline.local_job import dataframe_preprocess
        rows = [
            ["1", "a", "M"], ["0", "a", "F"], ["0", "b", "M"],
            ["1", "b", "M"], ["0", "b", "F"],
        ]
        header, out = dataframe_preprocess(
            rows, feature_index_list=[2, 3], keep_prob=1.0,
            schema=["clk", "site", "sex"])
        assert header == ["site_rate_1", "sex_rate_1"]
        # keep_prob 1.0: every row survives, two appended columns
        assert len(out) == 5 and all(len(r) == 5 for r in out)
        # join-shaped rates equal the RDD sum/count math per key
        site = cf.ctr_rate_map(rows, 2)
        sex = cf.ctr_rate_map(rows, 3)
        for r in out:
            assert float(r[3]) == site[r[1]]
            assert float(r[4]) == sex[r[2]]
        assert site == {"a": 0.5, "b": pytest.approx(1 / 3)}

    def test_stratified_sampling_and_null_join(self):
        from wide_deep_tpu.offline.local_job import dataframe_preprocess
        rows = ([["1", "x"]] * 7
                + [["0", f"y{i}"] for i in range(400)])
        header, out = dataframe_preprocess(rows, [2], keep_prob=0.05)
        # sampleBy semantics: every positive kept, ~5% of negatives
        pos = [r for r in out if r[0] == "1"]
        assert len(pos) == 7
        assert len(out) - 7 < 400 * 0.15
        assert header == ["col2_rate_1"]
        # left-outer join: an unseen key joins as null -> ''
        _, out2 = dataframe_preprocess([["0", "z"]], [2], keep_prob=1.0)
        assert out2[0][2] != ""  # z IS in its own rate table
        # simulate the null path directly: empty table -> ''
        from wide_deep_tpu.offline import local_job
        tbl = cf.ctr_rate_map([], 2)
        assert tbl == {}
