"""Feature hashing / plan / pipeline tests (reference: wide_deep_test.py:40-54,
dataset.py inline tests)."""

import numpy as np
import pytest

from wide_deep_tpu.features import hashing
from wide_deep_tpu.features.plan import FeaturePlan, embedding_dim
from wide_deep_tpu.features.pipeline import CsvDataset, FeatureTransformer, list_files
from paths import UNIT_FIXTURE


class TestHashing:
    def test_xxh64_vectors(self):
        # published xxHash64 test vectors, seed 0
        assert hashing.fingerprint64(b"") == 0xEF46DB3751D8E999
        assert hashing.fingerprint64(b"a") == 0xD24EC4F1A98C6E5B
        assert hashing.fingerprint64(b"abc") == 0x44BC2CF5AD770999

    def test_xxh64_long_input(self):
        # exercise the >=32-byte main loop + all tail paths
        data = bytes(range(256)) * 3
        for cut in (0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 63, 100, 768):
            h = hashing.fingerprint64(data[:cut])
            assert 0 <= h < 2 ** 64
            assert h == hashing.fingerprint64(data[:cut])  # deterministic

    def test_bucket_range(self):
        for v in ("", "a", "hello", "10.2.3.4"):
            assert 0 <= hashing.hash_bucket(v, 1000) < 1000

    def test_combine64_matches_numpy(self):
        fps = [hashing.fingerprint64_str(s) for s in ("x", "y", "zw")]
        scalar = hashing.cross_fingerprint(fps)
        arr = hashing.cross_fingerprint_np(
            [np.array([f], dtype=np.uint64) for f in fps])
        assert int(arr[0]) == scalar

    def test_cross_order_sensitive(self):
        a, b = hashing.fingerprint64_str("a"), hashing.fingerprint64_str("b")
        assert hashing.cross_fingerprint([a, b]) != hashing.cross_fingerprint([b, a])


class TestPlan:
    def test_embedding_dim_rule(self):
        # reference empirical rule (build_estimator.py:57-59)
        assert embedding_dim(100) == 4
        assert embedding_dim(10000) == 8
        assert embedding_dim(500000) == 16
        assert embedding_dim(10000000) == 32

    def test_embedding_dim_override(self, tmp_path):
        from wide_deep_tpu.testing import write_small_conf
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.plan import FeaturePlan
        conf_dir = write_small_conf(str(tmp_path / "conf"))
        feat = open(f"{conf_dir}/feature.yaml").read()
        feat = feat.replace(
            "adplan_id:          {type: category, transform: hash_bucket, "
            "parameter: 1000}",
            "adplan_id:          {type: category, transform: hash_bucket, "
            "parameter: 1000, embedding_dim: 16}")
        open(f"{conf_dir}/feature.yaml", "w").write(feat)
        plan = FeaturePlan(Config(conf_dir))
        _, es = plan.embed_slot_by_name["adplan_id"]
        assert es.dim == 16

    def test_dims(self, plan):
        # wide space: sum of the unfolded slot sizes, disjoint offsets,
        # padded to the row-alignment multiple for even sharding (folded
        # slots live as trailing columns of their embedding tables instead)
        resident = [s for s in plan.wide_slots if not s.folded]
        used = sum(s.size for s in resident)
        assert used <= plan.wide_dim < used + 256
        assert plan.wide_dim % 256 == 0
        offs = sorted((s.offset, s.offset + s.size) for s in resident)
        for (a1, b1), (a2, b2) in zip(offs, offs[1:]):
            assert b1 == a2
        # folded slots: exactly the hash/deep-cross slots whose dim group
        # folds; they own no wide rows and no pool column
        for s in plan.wide_slots:
            if s.folded:
                assert s.offset == -1 and s.col_offset == -1
                g, _ = plan.embed_slot_by_name[s.name]
                assert g.folded
        assert plan.folded_names == {
            s.name for g in plan.groups if g.folded for s in g.slots}
        assert plan.deep_input_dim == (plan.deep_embed_dim + plan.indicator_dim
                                       + len(plan.continuous_slots))
        assert len(plan.crosses) == 31
        # group tables cover every embed consumer exactly once
        names = [s.name for g in plan.groups for s in g.slots]
        assert len(names) == len(set(names)) == 16 + 31

class TestPipeline:
    def test_fixture_batch(self, plan, fixture_rows):
        tr = FeatureTransformer(plan)
        batch = tr.transform(fixture_rows, batch_size=16)
        assert batch["mask"].sum() == len(fixture_rows)
        assert batch["label"].shape == (16,)
        assert set(np.unique(batch["label"][:10])) <= {0.0, 1.0}
        # wide ids stay inside the unified space
        assert batch["wide_ids"].max() < plan.wide_dim
        assert batch["wide_ids"].min() >= 0
        # embedding ids stay inside each fused table
        for g in plan.groups:
            ids = batch[f"emb_ids_d{g.dim}"]
            assert ids.max() < g.rows
        # padded rows are fully zero-weighted
        assert batch["wide_wts"][len(fixture_rows):].sum() == 0

    def test_vocab_and_identity_semantics(self, plan, fixture_rows):
        tr = FeatureTransformer(plan)
        row = list(fixture_rows[0])
        col = plan.column_index
        # OOV vocab value is dropped (default_value=-1 semantics)
        row[col["os"]] = "99"
        # out-of-range identity maps to bucket 0 (default_value=0)
        row[col["idea_type"]] = "9999"
        batch = tr.transform([row], batch_size=1)
        os_slot = next(s for s in plan.indicator_slots if s.name == "os")
        assert batch["ind_wts"][0, os_slot.col_offset] == 0.0
        it_slot = next(s for s in plan.indicator_slots if s.name == "idea_type")
        assert batch["ind_ids"][0, it_slot.col_offset] == it_slot.offset
        assert batch["ind_wts"][0, it_slot.col_offset] == 1.0

    def test_multivalue_mean_weights(self, plan, fixture_rows):
        tr = FeatureTransformer(plan)
        row = list(fixture_rows[0])
        row[plan.column_index["ucomp"]] = "YX1,YX2,YX3"
        batch = tr.transform([row], batch_size=1)
        _, es = plan.embed_slot_by_name["ucomp"]
        wts = batch[f"emb_wts_d{es.dim}"][0, es.col_offset:es.col_offset + es.max_len]
        np.testing.assert_allclose(wts[:3], 1 / 3, rtol=1e-6)
        assert wts[3:].sum() == 0

    def test_continuous_normalization(self, plan, fixture_rows):
        tr = FeatureTransformer(plan)
        row = list(fixture_rows[0])
        row[plan.column_index["age"]] = "30"
        batch = tr.transform([row], batch_size=1)
        slot = next(s for s in plan.continuous_slots if s.name == "age")
        np.testing.assert_allclose(batch["cont"][0, slot.index],
                                   (30 - 10) / (90 - 10), rtol=1e-6)
        # bucketized wide copy uses RAW value (documented fix of reference
        # normalize-then-bucketize bug); ties go to the upper bucket, so 30
        # against [15,20,25,30,...] lands in bucket 4 (packed pool: find it
        # anywhere in the row)
        ws = plan.wide_slot_by_name["age"]
        assert (ws.offset + 4) in batch["wide_ids"][0]

    def test_na_defaults(self, plan, fixture_rows):
        tr = FeatureTransformer(plan)
        row = list(fixture_rows[0])
        row[plan.column_index["age"]] = "-"
        row[plan.column_index["adplan_id"]] = "-"
        batch = tr.transform([row], batch_size=1)
        slot = next(s for s in plan.continuous_slots if s.name == "age")
        np.testing.assert_allclose(batch["cont"][0, slot.index],
                                   (0 - 10) / (90 - 10), rtol=1e-6)

    def test_determinism(self, plan, fixture_rows):
        t1 = FeatureTransformer(plan).transform(fixture_rows, 16)
        t2 = FeatureTransformer(plan).transform(fixture_rows, 16)
        for k in t1:
            np.testing.assert_array_equal(t1[k], t2[k])

    def test_dataset_sharding(self, plan):
        path = UNIT_FIXTURE
        full = [r for b in CsvDataset(plan, path, "eval", 4) for r in
                b["label"][b["mask"] > 0]]
        parts = []
        for i in range(2):
            ds = CsvDataset(plan, path, "eval", 4, num_shards=2, shard_index=i)
            parts += [r for b in ds for r in b["label"][b["mask"] > 0]]
        assert len(parts) == len(full) == 10

    def test_shuffle_deterministic(self, plan):
        path = UNIT_FIXTURE
        def labels(seed):
            ds = CsvDataset(plan, path, "train", 4, shuffle_buffer=10, seed=seed)
            return np.concatenate([b["label"] for b in ds])
        np.testing.assert_array_equal(labels(123), labels(123))

    def test_list_files(self, tmp_path):
        (tmp_path / "b").write_text("x")
        (tmp_path / "a").write_text("x")
        assert [f.split("/")[-1] for f in list_files(str(tmp_path))] == ["a", "b"]
        assert list_files(str(tmp_path / "a")) == [str(tmp_path / "a")]
        with pytest.raises(FileNotFoundError):
            list_files(str(tmp_path / "nope"))


class TestRemoteFilesystems:
    """hdfs://-style transparency (features/fs.py): a registered scheme
    serves list_files and the full CsvDataset read path, matching the
    reference's tf.gfile behavior (dataset.py:30-37)."""

    @pytest.fixture()
    def fakefs(self):
        import io

        from wide_deep_tpu.features import fs

        class MemFs:
            def __init__(self, files):
                self.files = files  # full path -> text

            def isdir(self, path):
                return (not self.isfile(path)
                        and any(p.startswith(path.rstrip("/") + "/")
                                for p in self.files))

            def isfile(self, path):
                return path in self.files

            def listdir(self, path):
                base = path.rstrip("/") + "/"
                return sorted(p for p in self.files if p.startswith(base))

            def open_text(self, path, errors="replace"):
                return io.StringIO(self.files[path])

        with open(UNIT_FIXTURE) as f:
            text = f.read()
        memfs = MemFs({"memfs://cluster/data/part-0": text,
                       "memfs://cluster/data/part-1": text})
        fs.register_filesystem("memfs", memfs)
        yield memfs
        fs._HANDLERS.pop("memfs", None)

    def test_list_files_remote(self, fakefs):
        got = list_files("memfs://cluster/data")
        assert got == ["memfs://cluster/data/part-0",
                       "memfs://cluster/data/part-1"]
        assert (list_files("memfs://cluster/data/part-0")
                == ["memfs://cluster/data/part-0"])
        with pytest.raises(FileNotFoundError):
            list_files("memfs://cluster/nope")

    def test_dataset_reads_remote(self, fakefs, plan):
        ds = CsvDataset(plan, "memfs://cluster/data", "eval", 8)
        total = sum(int(b["mask"].sum()) for b in ds)
        assert total == 20  # both part files, 10 rows each

    def test_unregistered_scheme_fails_loudly(self):
        with pytest.raises(ValueError, match="no filesystem registered"):
            list_files("unknownfs://x/y")


class TestHadoopFs:
    """HadoopFs against a fake ``hadoop`` CLI: one -ls call per directory
    scan (no per-entry -test -f JVMs), and -cat exit status surfaces as an
    IOError instead of a silently short file."""

    @pytest.fixture()
    def fake_hadoop(self, tmp_path, monkeypatch):
        log = tmp_path / "calls.log"
        script = tmp_path / "hadoop"
        script.write_text(
            '#!/bin/sh\n'
            'echo "$@" >> "$FAKE_LOG"\n'
            'shift\n'            # drop "fs"
            'cmd=$1; shift\n'
            'case "$cmd" in\n'
            '  -test)\n'
            '    flag=$1; path=$2\n'
            '    case "$path" in\n'
            '      *dir) [ "$flag" = "-d" ]; exit $? ;;\n'
            '      *)    [ "$flag" = "-f" ]; exit $? ;;\n'
            '    esac ;;\n'
            '  -ls)\n'
            '    path=$1\n'
            '    echo "Found 3 items"\n'
            '    echo "-rw-r--r--   3 u g   12 2026-08-19 12:00 '
            '$path/part-0"\n'
            '    echo "-rw-r--r--   3 u g   12 2026-08-19 12:00 '
            '$path/part-1"\n'
            '    echo "drwxr-xr-x   - u g    0 2026-08-19 12:00 '
            '$path/subdir"\n'
            '    ;;\n'
            '  -cat)\n'
            '    printf "r1\\nr2\\n"\n'
            '    exit "${FAKE_CAT_RC:-0}"\n'
            '    ;;\n'
            'esac\n')
        script.chmod(0o755)
        monkeypatch.setenv("FAKE_LOG", str(log))
        from wide_deep_tpu.features import fs
        hadoop_fs = fs.HadoopFs(hadoop=str(script))
        fs.register_filesystem("fakehdfs", hadoop_fs)
        yield hadoop_fs, log
        fs._HANDLERS.pop("fakehdfs", None)

    def test_listdir_entries_parses_ls(self, fake_hadoop):
        hfs, _ = fake_hadoop
        entries = hfs.listdir_entries("fakehdfs://nn/datadir")
        assert entries == [("fakehdfs://nn/datadir/part-0", True),
                           ("fakehdfs://nn/datadir/part-1", True),
                           ("fakehdfs://nn/datadir/subdir", False)]

    def test_list_files_one_ls_no_per_entry_test(self, fake_hadoop):
        hfs, log = fake_hadoop
        got = list_files("fakehdfs://nn/datadir")
        assert got == ["fakehdfs://nn/datadir/part-0",
                       "fakehdfs://nn/datadir/part-1"]
        calls = log.read_text().splitlines()
        assert sum("-ls" in c for c in calls) == 1
        assert not any("-test -f" in c for c in calls)

    def test_cat_failure_raises_not_short_file(self, fake_hadoop,
                                               monkeypatch):
        hfs, _ = fake_hadoop
        monkeypatch.setenv("FAKE_CAT_RC", "3")
        with pytest.raises(IOError, match="exited 3"):
            hfs.open_bytes("fakehdfs://nn/datadir/part-0").read()
        # and line iteration through open_text fails too, after the
        # successfully streamed prefix
        f = hfs.open_text("fakehdfs://nn/datadir/part-0")
        with pytest.raises(IOError):
            list(f)

    def test_cat_success_reads_and_reaps(self, fake_hadoop, monkeypatch):
        hfs, _ = fake_hadoop
        monkeypatch.setenv("FAKE_CAT_RC", "0")
        stream = hfs.open_bytes("fakehdfs://nn/datadir/part-0")
        assert stream.read() == b"r1\nr2\n"
        stream.close()


class TestDevicePrefetch:
    def test_order_and_mapping(self):
        from wide_deep_tpu.features.pipeline import DevicePrefetchIterator
        got = list(DevicePrefetchIterator(range(50), lambda x: x * 2))
        assert got == [x * 2 for x in range(50)]

    def test_error_propagates(self):
        from wide_deep_tpu.features.pipeline import DevicePrefetchIterator

        def gen():
            yield 1
            raise RuntimeError("loader died")

        it = iter(DevicePrefetchIterator(gen(), lambda x: x + 1))
        assert next(it) == 2
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="loader died"):
            while True:
                next(it)

    def test_transfer_fn_error_propagates(self):
        from wide_deep_tpu.features.pipeline import DevicePrefetchIterator

        def bad(x):
            raise ValueError("device gone")

        with pytest.raises(ValueError, match="device gone"):
            list(DevicePrefetchIterator([1, 2], bad))


class TestFastNativePath:
    """CsvDataset._iter_native_fast: same batches as the streaming path
    modulo shuffle order; deterministic in (seed, epoch); sharding
    equivalent."""

    def test_eval_order_matches_streaming(self, plan):
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import CsvDataset
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        from paths import UNIT_FIXTURE
        fast = CsvDataset(plan, UNIT_FIXTURE, "eval", 4)
        assert fast._fast_path_ok()
        slow = CsvDataset(plan, UNIT_FIXTURE, "eval", 4)
        slow.FAST_SLURP_MAX_BYTES = 0  # force the streaming path
        assert not slow._fast_path_ok()
        a, b = list(fast), list(slow)
        assert len(a) == len(b)
        for ba, bb in zip(a, b):
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)

    def test_train_shuffle_deterministic_and_complete(self, plan):
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import CsvDataset
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        from paths import UNIT_FIXTURE

        def epochs(seed):
            ds = CsvDataset(plan, UNIT_FIXTURE, "train", 4, seed=seed)
            return [list(ds), list(ds)]  # two epochs

        e0a, e0b = epochs(5)
        e1a, e1b = epochs(5)
        # deterministic in (seed, epoch)
        for x, y in zip(e0a + e0b, e1a + e1b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)
        # epochs differ (epoch-seeded shuffle) but cover the same rows
        assert any((e0a[i]["label"] != e0b[i]["label"]).any()
                   or (e0a[i]["wide_ids"] != e0b[i]["wide_ids"]).any()
                   for i in range(len(e0a)))
        assert sum(int(b["mask"].sum()) for b in e0a) == 10

    def test_buffer_shuffle_covers_all_rows(self, plan):
        """shuffle_buffer < n rows takes the streaming-buffer order
        branch; every row must still appear exactly once."""
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import CsvDataset
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        from paths import TRAIN1
        ds = CsvDataset(plan, TRAIN1, "train", 50, seed=3,
                        shuffle_buffer=64, drop_remainder=False)
        assert ds._fast_path_ok()
        total = sum(int(b["mask"].sum()) for b in ds)
        with open(TRAIN1) as f:
            n_rows = sum(1 for l in f if l.strip())
        assert total == n_rows
