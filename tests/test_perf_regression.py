"""Per-op device-time regression tracking (tools/perf_regression.py +
tools/parse_xplane.py): bucket classification, budget comparison, and the
xplane.pb walker against a synthetically encoded XSpace."""

import json
import os
import subprocess
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num, wire, payload):
    tag = _varint(num << 3 | wire)
    if wire == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _xspace(plane_name, line_name, events, meta):
    """Encode a minimal XSpace matching tools/parse_xplane.py's walker:
    plane{name, lines, event_metadata}, line{name, events{metadata_id,
    duration}}."""
    meta_entries = b""
    for mid, name in meta.items():
        entry = (_field(1, 0, mid)
                 + _field(2, 2, _field(2, 2, name.encode())))
        meta_entries += _field(4, 2, entry)
    evs = b"".join(_field(4, 2, _field(1, 0, mid) + _field(3, 0, dur))
                   for mid, dur in events)
    line = _field(2, 2, line_name.encode()) + evs
    plane = (_field(2, 2, plane_name.encode()) + _field(3, 2, line)
             + meta_entries)
    return _field(1, 2, plane)


class TestBuckets:
    def test_classification(self):
        from perf_regression import bucket_of
        assert bucket_of("fusion.1234") == "fusion"
        assert bucket_of("all-reduce.7") == "collective"
        assert bucket_of("reduce-scatter.2") == "collective"
        assert bucket_of("tpu_custom_call.3") == "kernel"
        assert bucket_of("custom-call.9") == "kernel"
        assert bucket_of("dynamic-update-slice.5") == "update-slice"
        assert bucket_of("dynamic-slice.8") == "slice"
        assert bucket_of("gather.44") == "gather"
        assert bucket_of("scatter.1") == "scatter"
        assert bucket_of("convolution.2") == "conv"
        assert bucket_of("convert.9") == "data-movement"  # not "conv"
        assert bucket_of("dot.17") == "matmul"
        assert bucket_of("copy.3") == "data-movement"
        assert bucket_of("rsqrt.1") == "other"

    def test_profile_buckets_per_step(self):
        from perf_regression import profile_buckets
        # durations are PICOseconds (profiler convention)
        totals = {"fusion.1": 6_000_000_000, "fusion.2": 3_000_000_000,
                  "gather.1": 3_000_000_000}
        prof = profile_buckets(totals, steps=3)
        assert prof["fusion"] == 3.0   # (6+3) ms over 3 steps
        assert prof["gather"] == 1.0
        assert prof["total"] == 4.0


class TestCompare:
    def test_regression_and_improvement(self):
        from perf_regression import compare
        budget = {"fusion": 10.0, "gather": 5.0, "scatter": 1.0,
                  "total": 16.0}
        current = {"fusion": 12.0, "gather": 4.0, "scatter": 1.05,
                   "total": 17.05}
        ok, findings = compare(budget, current, tolerance=0.15)
        assert not ok
        kinds = {f["bucket"]: f["kind"] for f in findings}
        assert kinds["fusion"] == "regression"      # +20% and +2 ms
        assert kinds["gather"] == "improvement"     # -20% and -1 ms
        assert "scatter" not in kinds               # +5% within tolerance

    def test_absolute_floor_suppresses_jitter(self):
        from perf_regression import compare
        # +100% relative but only +0.1 ms: under the 0.2 ms floor
        ok, findings = compare({"other": 0.1}, {"other": 0.2}, 0.15)
        assert ok and not findings

    def test_new_bucket_is_regression(self):
        from perf_regression import compare
        ok, findings = compare({"total": 1.0}, {"total": 1.0,
                                                "collective": 3.0}, 0.15)
        assert not ok
        assert findings[0]["bucket"] == "collective"


class TestCommittedBudget:
    def test_budget_file_schema(self):
        """The committed perf_budget.json must stay loadable by `check`:
        known bucket names, positive totals, recorded capture params."""
        import perf_regression as pr
        path = os.path.join(os.path.dirname(TOOLS), "perf_budget.json")
        with open(path) as f:
            meta = json.load(f)
        assert meta["steps"] >= 1
        assert meta["line_filter"]
        buckets = meta["buckets_ms_per_step"]
        assert buckets["total"] > 0
        known = {name for name, _ in pr.BUCKET_RULES} | {"other", "total",
                                                         "async-dma"}
        assert set(buckets) <= known, set(buckets) - known
        # a self-check against itself must pass
        ok, findings = pr.compare(buckets, buckets, tolerance=0.15)
        assert ok and not findings


class TestXplaneWalker:
    def _write(self, tmp_path, plane="TPU:0 (chip)", line="XLA Ops"):
        blob = _xspace(plane, line,  # durations in ps: 2.0 / 1.0 / 0.5 ms
                       events=[(1, 2_000_000_000), (2, 1_000_000_000),
                               (1, 500_000_000)],
                       meta={1: "fusion.12", 2: "gather.3"})
        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        (d / "host.xplane.pb").write_bytes(blob)
        return str(tmp_path)

    def test_op_totals_sums_device_events(self, tmp_path):
        from parse_xplane import op_totals
        root = self._write(tmp_path)
        totals = op_totals(root, "XLA Ops")
        assert totals == {"fusion.12": 2_500_000_000,
                          "gather.3": 1_000_000_000}

    def test_line_filter_and_host_plane_skipped(self, tmp_path):
        from parse_xplane import op_totals
        root = self._write(tmp_path, plane="/host:CPU", line="XLA Ops")
        assert op_totals(root, "XLA Ops") == {}
        root2 = self._write(tmp_path / "b", line="Steps")
        assert op_totals(root2, "XLA Ops") == {}
        assert op_totals(root2, None) != {}

    def test_cli_capture_then_check(self, tmp_path):
        """End-to-end CLI: capture writes a budget; an identical re-check
        passes; a slowed re-check fails with a regression finding."""
        root = self._write(tmp_path)
        budget = tmp_path / "budget.json"
        env = dict(os.environ, PYTHONPATH=TOOLS)
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "perf_regression.py"),
             "capture", "--profile_dir", root, "--steps", "1",
             "--out", str(budget)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        assert json.loads(budget.read_text())["buckets_ms_per_step"][
            "fusion"] == 2.5
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "perf_regression.py"),
             "check", "--profile_dir", root, "--steps", "1",
             "--budget", str(budget)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stdout + r.stderr
        assert json.loads(r.stdout.strip().splitlines()[-1])["ok"]
        # slow the capture down 2x (steps=1 budget vs steps claims half)
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "perf_regression.py"),
             "check", "--profile_dir", root, "--steps", "1",
             "--budget", str(budget), "--tolerance", "0.15"],
            capture_output=True, text=True,
            env=dict(env, _IGNORED="1"))
        assert r.returncode == 0
        # regression: same events claimed to cover half a step each
        blob_root = self._write(tmp_path / "slow")
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "perf_regression.py"),
             "check", "--profile_dir", blob_root, "--steps", "1",
             "--budget", str(budget)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0  # identical profile: still ok
        # now a genuinely slower profile
        blob = _xspace("TPU:0 (chip)", "XLA Ops",
                       events=[(1, 4_000_000_000)], meta={1: "fusion.12"})
        d = tmp_path / "slow2" / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        (d / "host.xplane.pb").write_bytes(blob)
        r = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "perf_regression.py"),
             "check", "--profile_dir", str(tmp_path / "slow2"),
             "--steps", "1", "--budget", str(budget)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 1
        verdict = json.loads(r.stdout.strip().splitlines()[-1])
        assert not verdict["ok"]
        assert any(f["kind"] == "regression" for f in verdict["findings"])
