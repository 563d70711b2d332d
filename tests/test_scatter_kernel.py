"""Pallas range-scatter kernel (ops/scatter.py): exactness vs XLA scatter.

Interpret-mode on the CPU mesh; the TPU win is measured separately
(ARCHITECTURE.md round-2 log).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from paths import TRAIN1, UNIT_FIXTURE


def _run(ids, g, rows, dtype=np.float32):
    from wide_deep_tpu.ops.scatter import (build_scatter_tiles,
                                           range_scatter_add)
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order].astype(np.int32)
    g_sorted = g[order].astype(dtype)
    starts, offs, counts, row_los = build_scatter_tiles(ids_sorted, rows)
    out = range_scatter_add(
        jnp.asarray(ids_sorted), jnp.asarray(g_sorted),
        jnp.asarray(starts), jnp.asarray(offs), jnp.asarray(counts),
        jnp.asarray(row_los), rows, interpret=True)
    ref = np.zeros((rows, g.shape[1]), np.float64)
    np.add.at(ref, ids, g.astype(np.float64))
    return np.asarray(out, np.float64), ref


class TestTiles:
    def test_tiling_contract(self):
        from wide_deep_tpu.ops.scatter import (ALIGN_IDS, ALIGN_ROWS, MAXR,
                                               T_IDS, build_scatter_tiles)
        rng = np.random.default_rng(0)
        rows = 50176  # multiple of 256 (plan ROW_ALIGN)
        ids = np.sort(rng.integers(0, rows, 20000)).astype(np.int32)
        starts, offs, counts, row_los = build_scatter_tiles(ids, rows)
        covered = 0
        prev_end = 0
        for s, o, c, lo in zip(starts, offs, counts, row_los):
            if c == 0:
                continue
            assert s % ALIGN_IDS == 0 and 0 <= o < ALIGN_IDS
            assert s + o == prev_end
            chunk = ids[s + o:s + o + c]
            assert c <= T_IDS
            assert lo % ALIGN_ROWS == 0
            assert lo <= chunk.min()
            assert chunk.max() - lo < MAXR
            assert lo + MAXR <= max(rows, MAXR)
            covered += c
            prev_end = s + o + c
        assert covered == len(ids)

    def test_skewed_ids_split_across_tiles(self):
        """1000 duplicates of one id + a sparse tail must still tile."""
        from wide_deep_tpu.ops.scatter import T_IDS, build_scatter_tiles
        rows = 100000
        ids = np.sort(np.concatenate([
            np.full(3 * T_IDS, 7, np.int32),
            np.array([50, 99999, 99999], np.int32)])).astype(np.int32)
        starts, offs, counts, row_los = build_scatter_tiles(ids, rows)
        assert counts.sum() == len(ids)


class TestKernel:
    @pytest.mark.parametrize("rows,n,d", [(8192, 2000, 8), (50000, 6000, 4),
                                          (4096, 700, 16)])
    def test_matches_xla_scatter(self, rows, n, d):
        rng = np.random.default_rng(1)
        ids = rng.integers(0, rows, n).astype(np.int32)
        g = rng.normal(size=(n, d)).astype(np.float32)
        out, ref = _run(ids, g, rows)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_duplicates_and_hot_rows(self):
        rng = np.random.default_rng(2)
        rows, d = 8192, 8
        # heavy duplication: 4000 ids over 50 distinct rows
        ids = rng.integers(0, 50, 4000).astype(np.int32)
        g = rng.normal(size=(4000, d)).astype(np.float32)
        out, ref = _run(ids, g, rows)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_bf16_stream(self):
        rng = np.random.default_rng(3)
        rows, n, d = 8192, 3000, 8
        ids = rng.integers(0, rows, n).astype(np.int32)
        g = rng.normal(size=(n, d)).astype(np.float32)
        from wide_deep_tpu.ops.scatter import (build_scatter_tiles,
                                               range_scatter_add)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order].astype(np.int32)
        g_sorted = jnp.asarray(g[order]).astype(jnp.bfloat16)
        starts, offs, counts, row_los = build_scatter_tiles(ids_sorted, rows)
        out = range_scatter_add(
            jnp.asarray(ids_sorted), g_sorted, jnp.asarray(starts),
            jnp.asarray(offs), jnp.asarray(counts),
            jnp.asarray(row_los), rows, interpret=True)
        ref = np.zeros((rows, d), np.float32)
        np.add.at(ref, ids, np.asarray(g_sorted[np.argsort(order)],
                                       np.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=3e-2, atol=3e-2)

    def test_rows_smaller_than_slab(self):
        rng = np.random.default_rng(4)
        rows, n, d = 1000, 500, 8  # rows < MAXR
        ids = rng.integers(0, rows, n).astype(np.int32)
        g = rng.normal(size=(n, d)).astype(np.float32)
        out, ref = _run(ids, g, rows)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestLiveCapCompaction:
    """Weight-0 padding remapped to the sentinel tail: the compact branch
    of apply_scatter_plan gathers/streams only live_cap(n) entries and must
    equal the XLA scatter of the LIVE entries exactly; over-cap batches
    take the full branch."""

    def _plan_and_ref(self, rows, n, d, pad_frac, seed=5):
        from wide_deep_tpu.ops.scatter import make_scatter_plan
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, rows, n).astype(np.int32)
        wts = np.ones(n, np.float32)
        wts[rng.random(n) < pad_frac] = 0.0  # pool padding
        g = rng.normal(size=(n, d)).astype(np.float32)
        g[wts == 0] = 0.0  # padding grads are exactly zero (w multiplies)
        sp = make_scatter_plan(ids, rows, wts)
        ref = np.zeros((rows, d), np.float64)
        np.add.at(ref, ids[wts != 0], g[wts != 0].astype(np.float64))
        return sp, g, ref

    def test_plan_layout(self):
        from wide_deep_tpu.ops.scatter import _rows_pad
        rows, n = 8192, 4000
        sp, _, _ = self._plan_and_ref(rows, n, 8, pad_frac=0.3)
        live = int(sp["live"][0])
        assert 0 < live < n
        assert (sp["ids"][:live] < rows).all()          # live prefix
        assert (sp["ids"][live:] == _rows_pad(rows)).all()  # sentinel tail
        assert int(sp["tiles"][2].sum()) == live        # tiles cover live

    @pytest.mark.parametrize("pad_frac", [0.3, 0.0])
    def test_compact_and_full_branches_match_xla(self, pad_frac):
        """pad 30% -> live < cap (compact branch); pad 0% -> live == n > cap
        (full branch).  Both must equal the XLA reference."""
        from wide_deep_tpu.ops.scatter import apply_scatter_plan, live_cap
        rows, n, d = 8192, 4096, 8
        sp, g, ref = self._plan_and_ref(rows, n, d, pad_frac)
        cap = live_cap(n)
        assert (int(sp["live"][0]) <= cap) == (pad_frac > 0)
        out = apply_scatter_plan(
            {k: jnp.asarray(v) for k, v in sp.items()},
            jnp.asarray(g), rows, interpret=True)
        np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                                   rtol=1e-5, atol=1e-5)


class TestWindowKernel:
    """Window-mode kernel (write-only fixed row windows) for sparse
    streams: exactness vs the XLA scatter, overflow fallback, empty
    windows."""

    def _run_window(self, ids, g, rows):
        from wide_deep_tpu.ops.scatter import (apply_window_plan,
                                               make_window_plan)
        wp = make_window_plan(ids, rows)
        out = jax.jit(
            lambda p, gf: apply_window_plan(p, gf, rows, interpret=True)
        )({k: jnp.asarray(v) for k, v in wp.items()}, jnp.asarray(g))
        ref = np.zeros((rows, g.shape[1]), np.float64)
        np.add.at(ref, ids, g.astype(np.float64))
        return np.asarray(out, np.float64), ref, wp

    def test_sparse_stream_matches_xla(self):
        rng = np.random.default_rng(5)
        rows, n, d = 1 << 15, 2100, 16  # sparse: ~131 ids / 2048-row window
        ids = rng.integers(0, rows, n).astype(np.int32)
        g = rng.normal(size=(n, d)).astype(np.float32)
        out, ref, wp = self._run_window(ids, g, rows)
        assert wp["ok"][0] == 1
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_duplicates_and_empty_windows(self):
        rng = np.random.default_rng(6)
        rows, d = 4 * 2048, 8
        # everything in windows 0 and 3; windows 1-2 empty (must be zeros)
        ids = np.concatenate([
            np.full(200, 17, np.int32),
            rng.integers(3 * 2048, 4 * 2048, 300).astype(np.int32)])
        g = rng.normal(size=(ids.shape[0], d)).astype(np.float32)
        out, ref, wp = self._run_window(ids, g, rows)
        assert wp["ok"][0] == 1
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        assert np.all(out[2048:3 * 2048] == 0)

    def test_overflow_falls_back(self):
        from wide_deep_tpu.ops.scatter import window_cap
        rng = np.random.default_rng(7)
        rows, d = 1 << 15, 4
        n = 3000
        cap = window_cap(n, rows)
        # hot window 0: more ids than the cap -> ok=0 -> XLA path, exact
        ids = np.concatenate([
            rng.integers(0, 2048, cap + 64).astype(np.int32),
            rng.integers(0, rows, n - cap - 64).astype(np.int32)])
        g = rng.normal(size=(n, d)).astype(np.float32)
        out, ref, wp = self._run_window(ids, g, rows)
        assert wp["ok"][0] == 0
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pool_padding_does_not_overflow(self):
        """Packed-pool padding (id 0, weight 0) floods window 0 in raw id
        space; the weight mask must route it out so ok stays 1 and the
        (zero) padding grads never land."""
        from wide_deep_tpu.ops.scatter import (apply_window_plan,
                                               make_window_plan)
        rng = np.random.default_rng(9)
        rows, d = 1 << 15, 8
        real = rng.integers(0, rows, 2000).astype(np.int32)
        ids = np.concatenate([real, np.zeros(30000, np.int32)])
        wts = np.concatenate([np.ones(2000, np.float32),
                              np.zeros(30000, np.float32)])
        g = rng.normal(size=(ids.shape[0], d)).astype(np.float32)
        g[2000:] = 0.0  # padding grads are exactly zero in the real model
        wp = make_window_plan(ids, rows, wts)
        assert wp["ok"][0] == 1
        out = jax.jit(
            lambda p, gf: apply_window_plan(p, gf, rows, interpret=True)
        )({k: jnp.asarray(v) for k, v in wp.items()}, jnp.asarray(g))
        ref = np.zeros((rows, d), np.float64)
        np.add.at(ref, real, g[:2000].astype(np.float64))
        np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                                   rtol=1e-5, atol=1e-5)

    def test_rows_not_window_aligned(self):
        rng = np.random.default_rng(8)
        rows, n, d = 5000, 400, 8  # rows % MAXR != 0 (padded internally)
        ids = rng.integers(0, rows, n).astype(np.int32)
        g = rng.normal(size=(n, d)).astype(np.float32)
        out, ref, wp = self._run_window(ids, g, rows)
        assert wp["ok"][0] == 1
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


class TestScatterPlanPlumbing:
    def test_python_cpp_plan_parity(self, small_config, fixture_rows,
                                    monkeypatch):
        """The C++ loader's radix-argsort + tiling must be bit-identical to
        the numpy reference for every batch array."""
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        import wide_deep_tpu.ops.scatter as sc
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        monkeypatch.setattr(sc, "PALLAS_SCATTER_MIN_IDS", 1)
        plan = FeaturePlan(small_config, pallas_scatter=True)
        # density gate: force every group eligible for the parity check
        monkeypatch.setattr(
            type(plan), "scatter_group", lambda self, g, b: True)
        py = FeatureTransformer(plan).transform(fixture_rows, 16,
                                                mode="train")
        cc = NativeTransformer(plan).transform(fixture_rows, 16,
                                               mode="train")
        scat_keys = [k for k in py if k.startswith("scat_")]
        assert scat_keys, "no scatter plans emitted"
        assert set(py) == set(cc)
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)

    def test_training_matches_xla_path(self, small_config, tmp_path,
                                       monkeypatch):
        """End-to-end: pallas scatter backward == XLA scatter backward
        (losses + eval) on a single-device mesh."""
        import shutil

        import wide_deep_tpu.ops.scatter as sc
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.parallel import mesh as mesh_lib
        from wide_deep_tpu.training.loop import Trainer

        monkeypatch.setattr(sc, "PALLAS_SCATTER_MIN_IDS", 1)
        monkeypatch.setattr(FeaturePlan, "scatter_group",
                            lambda self, g, b: self.pallas_scatter)
        FIXTURE = UNIT_FIXTURE
        mesh1 = mesh_lib.make_mesh(1, 1, jax.devices()[:1])
        losses = {}
        for tag in ("pallas", "xla"):
            conf2 = tmp_path / f"conf_{tag}"
            shutil.copytree(small_config.conf_dir, conf2)
            with open(conf2 / "train.yaml") as f:
                text = f.read()
            text = text.replace("scatter_mode: pallas",
                                f"scatter_mode: {tag}")
            with open(conf2 / "train.yaml", "w") as f:
                f.write(text)
            tr = Trainer(Config(str(conf2)), model_type="wide_deep",
                         model_dir=str(tmp_path / tag), mesh=mesh1,
                         overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                        test_data=FIXTURE, keep_train=True,
                                        batch_size=16))
            assert tr.plan.pallas_scatter == (tag == "pallas")
            tr.ensure_initialized(restore=False)
            traj = [tr.train_file(FIXTURE) for _ in range(3)]
            traj.append(tr.evaluate(FIXTURE)["loss"])
            losses[tag] = traj
        np.testing.assert_allclose(losses["pallas"], losses["xla"],
                                   rtol=5e-4)

    def test_sharded_plan_invariants(self):
        """make_sharded_scatter_plan: per-shard streams are localized,
        sorted, perm-consistent with the global flat stream, and every id
        is either covered by an ok shard or owned by an overflowed one."""
        from wide_deep_tpu.ops.scatter import (make_sharded_scatter_plan,
                                               shard_cap)
        rng = np.random.default_rng(7)
        rows, n_shards, n = 2048, 8, 4096
        shard_rows = rows // n_shards
        # skew shard 3 hot so it overflows the 2x-even-split cap
        ids = np.concatenate([
            rng.integers(0, rows, n - 2000).astype(np.int32),
            rng.integers(3 * shard_rows, 4 * shard_rows, 2000)
               .astype(np.int32)])
        sp = make_sharded_scatter_plan(ids, rows, n_shards)
        cap = shard_cap(n, n_shards)
        assert sp["ids"].shape == (n_shards, cap)
        counts = np.bincount(ids // shard_rows, minlength=n_shards)
        covered = 0
        for s in range(n_shards):
            cnt = int(counts[s])
            if cnt > cap:
                assert sp["ok"][s] == 0
                assert (sp["tiles"][s, 2] == 0).all()  # all-empty tiles
                continue
            assert sp["ok"][s] == 1
            live = sp["ids"][s, :cnt]
            assert (np.diff(live) >= 0).all()          # sorted
            assert live.min(initial=0) >= 0
            assert live.max(initial=0) < shard_rows    # localized
            # perm maps sorted position -> global flat position
            np.testing.assert_array_equal(
                ids[sp["perm"][s, :cnt]] - s * shard_rows, live)
            assert int(sp["tiles"][s, 2].sum()) == cnt  # tiles cover all
            covered += cnt
        assert covered == n - int(counts[3])

    def test_sharded_padding_sentinel_saves_shard0(self):
        """Weight-0 pool padding (id 0) must NOT count against shard 0's
        cap: at ~20% padding and 8 shards the raw stream overflows shard 0
        every batch (cnt ~ n*(1/8 + 0.2) > the 2x-even-split cap), silently
        demoting it to the XLA fallback."""
        from wide_deep_tpu.ops.scatter import make_sharded_scatter_plan
        rng = np.random.default_rng(9)
        rows, n, n_shards = 8 * 4096, 40960, 8
        ids = rng.integers(0, rows, n).astype(np.int32)
        wts = np.ones(n, np.float32)
        pad = rng.random(n) < 0.2
        ids[pad], wts[pad] = 0, 0.0          # pool padding: id 0, weight 0
        raw = make_sharded_scatter_plan(ids, rows, n_shards)
        assert raw["ok"][0] == 0             # the failure mode being fixed
        sp = make_sharded_scatter_plan(ids, rows, n_shards, wts)
        assert sp["ok"].all()
        # padding is in NO shard; live entries all covered exactly once
        covered = sum(int(sp["tiles"][s, 2].sum()) for s in range(n_shards))
        assert covered == int((~pad).sum())

    def test_python_cpp_sharded_plan_parity(self, small_config, monkeypatch):
        """The C++ per-shard emission (sort once, split at shard bounds,
        localize + tile) must be bit-identical to
        make_sharded_scatter_plan for every array including ok flags."""
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        import wide_deep_tpu.ops.scatter as sc
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        monkeypatch.setattr(sc, "PALLAS_SCATTER_MIN_IDS", 1)
        plan = FeaturePlan(small_config, pallas_scatter=True,
                           scatter_shards=8, shard_threshold=1)
        with open(TRAIN1) as f:
            rows = [l.rstrip("\n").split("\t") for l in f][:300]
        py = FeatureTransformer(plan).transform(rows, 512, mode="train")
        cc = NativeTransformer(plan).transform(rows, 512, mode="train")
        ok_keys = [k for k in py if k.startswith("scat_ok_")]
        assert ok_keys, "no sharded scatter plans emitted"
        assert set(py) == set(cc)
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)
        for k in ok_keys:  # real data, 8 shards: every shard within cap
            dim = k.rsplit("_d", 1)[1]
            assert py[k].shape == (8,)
            assert py[f"scat_ids_d{dim}"].ndim == 2

    def test_python_cpp_window_plan_parity(self, small_config, monkeypatch):
        """The C++ window-plan emission (weight-0 padding remapped to the
        out-of-window sentinel, stable sort, fixed-row-window tiles) must be
        bit-identical to make_window_plan for every array incl. ok flags."""
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        monkeypatch.setattr(FeaturePlan, "scatter_group",
                            lambda self, g, b: False)
        monkeypatch.setattr(FeaturePlan, "window_group",
                            lambda self, g, b: self.pallas_scatter)
        plan = FeaturePlan(small_config, pallas_scatter=True)
        with open(TRAIN1) as f:
            rows = [l.rstrip("\n").split("\t") for l in f][:300]
        # B=512 floods the tiny tables' single window past the 4x-mean cap
        # (overflow path, ok=0 + zero tiles); B=16 fits (tile emission).
        oks = set()
        for B in (512, 16):
            sub = rows[:B]
            py = FeatureTransformer(plan).transform(sub, B, mode="train")
            cc = NativeTransformer(plan).transform(sub, B, mode="train")
            ok_keys = [k for k in py if k.startswith("wscat_ok_")]
            assert ok_keys, "no window plans emitted"
            assert set(py) == set(cc)
            for k in sorted(py):
                np.testing.assert_array_equal(py[k], cc[k], err_msg=k)
            oks |= {int(py[k][0]) for k in ok_keys}
        assert oks == {0, 1}, f"both cap regimes must be exercised: {oks}"

    def test_python_cpp_compact_and_sharded_window_parity(
            self, small_config, monkeypatch):
        """Native (v9) emission of compact/sopt plans (single + sharded)
        and SHARDED window plans must be bit-identical to the Python
        builders for every array including uids sentinels and ok flags."""
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        import wide_deep_tpu.optim.sparse as sparse_lib
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)
        with open(TRAIN1) as f:
            rows = [l.rstrip("\n").split("\t") for l in f][:300]
        # single-device: compact plans for every group (fold off so all
        # groups are sparse-eligible)
        plan1 = FeaturePlan(small_config, fold=False, sparse_opt=True)
        py = FeatureTransformer(plan1).transform(rows, 512, mode="train")
        cc = NativeTransformer(plan1).transform(rows, 512, mode="train")
        assert any(k.startswith("sopt_uids_") for k in py)
        assert set(py) == set(cc)
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)
        # 8-shard mesh plans: sharded compact + sharded window together
        monkeypatch.setattr(FeaturePlan, "window_group",
                            lambda self, g, b: self.pallas_scatter
                            and g.rows % 8 == 0)
        plan8 = FeaturePlan(small_config, fold=False, sparse_opt=True,
                            pallas_scatter=True, scatter_shards=8,
                            shard_threshold=1)
        py = FeatureTransformer(plan8).transform(rows, 512, mode="train")
        cc = NativeTransformer(plan8).transform(rows, 512, mode="train")
        assert any(k.startswith("sopt_ok_") for k in py)
        assert any(k.startswith("wscat_ok_") for k in py)
        assert set(py) == set(cc)
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)
        # dedup-exchange plans (shard_kind=dedup): uids + slots parity
        pland = FeaturePlan(small_config, fold=False, scatter_shards=8,
                            shard_threshold=1, shard_kind="dedup")
        py = FeatureTransformer(pland).transform(rows, 512, mode="train")
        cc = NativeTransformer(pland).transform(rows, 512, mode="train")
        assert any(k.startswith("dscat_uids_") for k in py)
        assert set(py) == set(cc)
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)

    def test_window_training_matches_xla_path(self, small_config, tmp_path,
                                              monkeypatch):
        """End-to-end: window-mode scatter backward == XLA scatter backward
        (losses + eval) when every group is routed through window plans."""
        import shutil

        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.parallel import mesh as mesh_lib
        from wide_deep_tpu.training.loop import Trainer

        monkeypatch.setattr(FeaturePlan, "scatter_group",
                            lambda self, g, b: False)
        monkeypatch.setattr(FeaturePlan, "window_group",
                            lambda self, g, b: self.pallas_scatter)
        FIXTURE = UNIT_FIXTURE
        mesh1 = mesh_lib.make_mesh(1, 1, jax.devices()[:1])
        losses = {}
        for tag in ("pallas", "xla"):
            conf2 = tmp_path / f"conf_w_{tag}"
            shutil.copytree(small_config.conf_dir, conf2)
            with open(conf2 / "train.yaml") as f:
                text = f.read()
            text = text.replace("scatter_mode: pallas",
                                f"scatter_mode: {tag}")
            with open(conf2 / "train.yaml", "w") as f:
                f.write(text)
            tr = Trainer(Config(str(conf2)), model_type="wide_deep",
                         model_dir=str(tmp_path / f"w_{tag}"), mesh=mesh1,
                         overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                        test_data=FIXTURE, keep_train=True,
                                        batch_size=16))
            if tag == "pallas":
                spec = tr.plan.batch_spec(16)
                assert any(k.startswith("wscat_ok_") for k in spec), \
                    "window plans not emitted"
            tr.ensure_initialized(restore=False)
            traj = [tr.train_file(FIXTURE) for _ in range(3)]
            traj.append(tr.evaluate(FIXTURE)["loss"])
            losses[tag] = traj
        np.testing.assert_allclose(losses["pallas"], losses["xla"],
                                   rtol=5e-4)

    def test_python_cpp_parity_small_rows(self, tmp_path, fixture_rows,
                                          monkeypatch):
        """Regression: tables with rows < MAXR (slab padding) must still
        produce identically-sized and identically-laid-out tile arrays in
        C++ and Python (a raw-vs-padded rows mismatch in n_tiles_for once
        silently misaligned the [4, n_tiles] buffer)."""
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.testing import write_small_conf
        import wide_deep_tpu.ops.scatter as sc
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        conf = write_small_conf(str(tmp_path / "conf"), hash_cap=50,
                                cross_cap_k=1)
        monkeypatch.setattr(sc, "PALLAS_SCATTER_MIN_IDS", 1)
        plan = FeaturePlan(Config(conf), pallas_scatter=True)
        monkeypatch.setattr(
            type(plan), "scatter_group", lambda self, g, b: True)
        assert any(g.rows < sc.MAXR for g in plan.groups), \
            "fixture must include a small-rows group"
        py = FeatureTransformer(plan).transform(fixture_rows, 16,
                                                mode="train")
        cc = NativeTransformer(plan).transform(fixture_rows, 16,
                                               mode="train")
        for k in sorted(py):
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)
