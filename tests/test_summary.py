"""TensorBoard summary-writer tests: event-file wire format + Trainer wiring."""

import os
import struct

import numpy as np

from wide_deep_tpu.features.tfrecord import read_records
from wide_deep_tpu.training.summary import SummaryWriter

from paths import UNIT_FIXTURE as FIXTURE


def _events(path):
    """Decode (step, {tag: value}) scalar events minimally."""
    out = []
    for rec in read_records(path, verify=True):
        # Event proto: we only probe for field 5 (summary) presence and pull
        # float32 simple_values with their tags via a tolerant scan
        out.append(rec)
    return out


class TestWriter:
    def test_file_format(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.scalar("loss", 0.5, step=1)
        w.scalars({"a": 1.0, "b": 2.0}, step=2)
        w.histogram("weights", np.random.default_rng(0).normal(size=1000),
                    step=3)
        w.close()
        recs = _events(w.path)
        # file_version + 3 events, all with valid CRCs (read_records verifies)
        assert len(recs) == 4
        assert b"brain.Event:2" in recs[0]
        assert b"loss" in recs[1]
        assert b"a" in recs[2] and b"b" in recs[2]
        assert b"weights" in recs[3]

    def test_scalar_value_encoding(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        w.scalar("x", 0.25, step=7)
        w.close()
        rec = _events(w.path)[1]
        # float 0.25 little-endian must appear after the simple_value tag 0x15
        assert b"\x15" + struct.pack("<f", 0.25) in rec

    def test_histogram_stats(self, tmp_path):
        w = SummaryWriter(str(tmp_path))
        vals = np.array([1.0, 2.0, 3.0])
        w.histogram("h", vals, step=1)
        w.close()
        rec = _events(w.path)[1]
        # min=1 max=3 num=3 sum=6 encoded as doubles
        for v in (1.0, 3.0, 6.0):
            assert struct.pack("<d", v) in rec


class TestTrainerSummaries:
    def test_summaries_written(self, small_config, tmp_path):
        from wide_deep_tpu.training.loop import Trainer
        tr = Trainer(small_config, model_type="wide_deep",
                     model_dir=str(tmp_path),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=16))
        tr.runconfig["save_summary_steps"] = 1
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        sdir = os.path.join(tr.model_dir, "summaries")
        files = os.listdir(sdir)
        assert len(files) == 1
        recs = _events(os.path.join(sdir, files[0]))
        assert len(recs) >= 2  # file_version + at least one step
        assert any(b"zero_fraction" in r for r in recs)
        assert any(b"loss" in r for r in recs)
        assert any(b"kernel" in r for r in recs)  # weight histograms
