"""Host-side data pipeline: TSV CTR logs -> packed fixed-shape numpy batches.

Replaces the reference's ``tf.data`` input pipeline
(/root/reference/python/lib/dataset.py:23-195) *and* the runtime
``tf.feature_column`` transforms: all parsing, hashing, vocab lookup,
bucketization, crossing and combiner-weight computation happens on the host,
so the device sees only dense, statically shaped int32/float32 tensors.

Parsing semantics kept from the reference:
* schema-ordered TSV, tab delimiter, first column = click label
  (``label = (col == '1')``), na value ``-`` -> per-type default
  ('' category / 0 identity / 0.0 continuous) — dataset.py:86-165.
* ``multivalue`` mode splits string cells on ``,`` (dataset.py:148-154); here
  values beyond a feature's static ``max_len`` are truncated (the reference
  padded dynamically per batch; XLA wants static shapes).
* per-example loss weight = pos/neg sample weight by label
  (dataset.py:159-163).
* vocab out-of-vocabulary values are dropped (default_value=-1 semantics,
  build_estimator.py:105-109); identity out-of-range maps to bucket 0
  (default_value=0, build_estimator.py:113-117).
* deterministic shuffle with a seeded buffer (dataset.py:182, seed 123) and
  worker sharding by round-robin file/row interleave (dataset.py:173-174).

Every batch is padded to exactly ``batch_size`` rows; ``mask`` marks real
rows so one compiled XLA step serves uneven final batches.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from wide_deep_tpu.features import hashing
from wide_deep_tpu.features.plan import FeaturePlan

Batch = Dict[str, np.ndarray]


def list_files(path: str) -> List[str]:
    """File path -> [path]; directory -> sorted shard files (util.py:36-45).

    Remote schemes (hdfs:// etc.) resolve through features/fs.py — the
    reference's tf.gfile transparency (dataset.py:30-37)."""
    from wide_deep_tpu.features import fs
    if fs.scheme_of(path) is None and not os.path.exists(path):
        raise FileNotFoundError(f"no data at {path}")
    if fs.isdir(path):
        # listdir_entries: one remote call for the file/dir bit instead of
        # a per-entry isfile round-trip (one JVM launch each on hdfs://)
        return sorted(
            p for p, is_file in fs.listdir_entries(path)
            if not os.path.basename(p).startswith(".") and is_file)
    if fs.isfile(path):
        return [path]
    raise FileNotFoundError(f"no data at {path}")


class FeatureTransformer:
    """Compiles rows of raw TSV strings into a packed Batch.

    Pure-numpy/Python reference implementation; cpp/fastdata.cc provides a
    bit-identical native fast path (selected automatically when built).
    """

    def __init__(self, plan: FeaturePlan, n_classes: int = 2,
                 pos_weight: Optional[float] = None,
                 neg_weight: Optional[float] = None):
        self.plan = plan
        self.n_classes = n_classes
        self.pos_weight = pos_weight
        self.neg_weight = neg_weight
        self.weighted = pos_weight is not None and neg_weight is not None
        # per-feature value caches: raw string -> (bucket id | fingerprint)
        self._hash_cache: Dict[str, Dict[str, int]] = {}
        self._fp_cache: Dict[str, int] = {}
        self._vocab_maps = {
            s.name: {v: i for i, v in enumerate(s.vocab)}
            for s in plan.indicator_slots if s.kind == "vocab"}
        # feature name -> schema column index
        self._col = plan.column_index
        self._conf = plan.feature_conf

    # ------------------------------------------------------------ value logic
    def _split(self, cell: str, max_len: int) -> List[str]:
        if cell == "-" or cell == "":
            return [""]
        if self.plan.multivalue and "," in cell:
            vals = cell.split(",")
            return vals[:max_len]
        return [cell]

    def _hash_ids(self, feature: str, values: List[str], size: int) -> List[int]:
        cache = self._hash_cache.setdefault(feature, {})
        out = []
        for v in values:
            h = cache.get(v)
            if h is None:
                h = hashing.fingerprint64_str(v) % size
                if len(cache) < 1_000_000:
                    cache[v] = h
            out.append(h)
        return out

    def _fingerprints(self, values: List[str]) -> List[int]:
        out = []
        for v in values:
            h = self._fp_cache.get(v)
            if h is None:
                h = hashing.fingerprint64_str(v)
                if len(self._fp_cache) < 2_000_000:
                    self._fp_cache[v] = h
            out.append(h)
        return out

    @staticmethod
    def _to_int(cell: str) -> int:
        """Junk-tolerant int parse; non-finite ("1e309") and beyond-int64
        magnitudes map to the 0 default — the C++ loader's to_int clamps
        identically (an unclamped static_cast<int64_t>(inf) is UB), and
        the fuzz parity suite (tests/test_fuzz_native.py) pins them
        together."""
        f = FeatureTransformer._to_float(cell)
        if abs(f) > 2.0 ** 62:  # int64-safe (C++ casts; UB beyond)
            return 0
        return int(f)

    @staticmethod
    def _to_float(cell: str) -> float:
        """Junk-tolerant float parse; inf/nan cells ("1e309", "nan") map
        to the 0.0 default instead of poisoning the batch (an inf
        continuous feature NaNs the loss several steps later with no
        pointer back to the bad row)."""
        if cell in ("-", ""):
            return 0.0
        # pin to the C-locale grammar the C++ loader parses (fuzz-parity
        # contract): >63 chars, Python-only forms (underscores, unicode
        # digits) and non-finite results are all junk -> 0.0 default
        if len(cell) > 63 or "_" in cell or not cell.isascii():
            return 0.0
        try:
            f = float(cell)
        except ValueError:
            return 0.0
        return f if math.isfinite(f) else 0.0

    # -------------------------------------------------------------- transform
    def transform(self, rows: Sequence[Sequence[str]], batch_size: int,
                  mode: str = "train") -> Batch:
        """Pack parsed rows (lists of cells) into a fixed-shape Batch.

        ``len(rows) <= batch_size``; the tail is zero-padded with mask 0.
        """
        plan = self.plan
        B, n = batch_size, len(rows)
        assert n <= B
        has_label = mode != "pred"
        out: Batch = {}
        if has_label:
            out["label"] = np.zeros((B,), np.float32)
            out["weight"] = np.zeros((B,), np.float32)
        out["mask"] = np.zeros((B,), np.float32)
        out["mask"][:n] = 1.0
        Pw = plan.wide_packed_len
        wide_ids = np.zeros((B, Pw), np.int32)
        wide_wts = np.zeros((B, Pw), np.float32)
        Pg = plan.group_packed_len
        g_ids = {g.dim: np.zeros((B, Pg[g.dim]), np.int32) for g in plan.groups}
        g_wts = {g.dim: np.zeros((B, Pg[g.dim]), np.float32) for g in plan.groups}
        g_seg = {g.dim: np.zeros((B, Pg[g.dim]), np.int32) for g in plan.groups}
        ind_ids = np.zeros((B, plan.indicator_total_len), np.int32)
        ind_wts = np.zeros((B, plan.indicator_total_len), np.float32)
        cont = np.zeros((B, len(plan.continuous_slots)), np.float32)

        embed_by_name = plan.embed_slot_by_name
        wide_by_name = plan.wide_slot_by_name

        for b, cells in enumerate(rows):
            # packed-pool cursors: entries appended in slot order; overflow
            # beyond the static pool capacity is dropped (plan.PACK_BUDGET)
            wcur = 0
            gcur = {g.dim: 0 for g in plan.groups}

            budget = plan.pack_budget

            def wide_put_slot(ws, ids_list):
                # per-slot cap = pack_budget for multivalue slots, so pools
                # fit exactly and no slot can starve later slots.  Folded
                # slots have no pool column: their wide weight rides the
                # fused embedding table (plan "wide fold").
                nonlocal wcur
                if ws.folded:
                    return
                cap = 1 if ws.max_len == 1 else budget
                for i in ids_list[:cap]:
                    if wcur >= Pw:
                        break
                    wide_ids[b, wcur] = ws.offset + i
                    wide_wts[b, wcur] = 1.0
                    wcur += 1

            def emb_put(es, local_ids):
                cap_slot = 1 if es.max_len == 1 else budget
                kept = local_ids[:cap_slot]
                k = len(kept)
                if k == 0:
                    return
                w = 1.0 / k
                dim = es.dim
                cap = Pg[dim]
                c = gcur[dim]
                for i in kept:
                    if c >= cap:
                        break
                    g_ids[dim][b, c] = es.row_offset + i
                    g_wts[dim][b, c] = w
                    g_seg[dim][b, c] = es.index
                    c += 1
                gcur[dim] = c
            if has_label:
                if self.n_classes == 2:
                    lab = 1.0 if cells[0] == "1" else 0.0
                else:  # multiclass: integer class id in the label column
                    lab = float(self._to_int(cells[0]))
                out["label"][b] = lab
                if self.weighted:
                    out["weight"][b] = self.pos_weight if lab else self.neg_weight
                else:
                    out["weight"][b] = 1.0
            # cross member raw values, collected as we walk features
            member_vals: Dict[str, List[int]] = {}

            for name in plan.feature_order:
                conf = self._conf[name]
                cell = cells[self._col[name]]
                ftype, tran = conf["type"], conf["transform"]
                if ftype == "continuous":
                    slot = next(s for s in plan.continuous_slots if s.name == name)
                    raw = self._to_float(cell)
                    cont[b, slot.index] = slot.normalize(raw)
                    if slot.boundaries:
                        ws = wide_by_name[name]
                        bucket = int(np.searchsorted(slot.boundaries, raw,
                                                     side="right"))
                        wide_put_slot(ws, [bucket])
                        member_vals[name] = [bucket]
                    continue

                ws = wide_by_name[name]
                values = self._split(cell, ws.max_len)
                if tran == "hash_bucket":
                    ids = self._hash_ids(name, values, ws.size)
                    wide_put_slot(ws, ids)
                    _, es = embed_by_name[name]
                    emb_put(es, ids)
                    member_vals[name] = self._fingerprints(values)
                elif tran == "vocab":
                    # wide contribution rides the indicator block
                    # (models/linear.py dense path) — no pool entry
                    vm = self._vocab_maps[name]
                    ids = [vm[v] for v in values if v in vm]
                    islot = next(s for s in plan.indicator_slots if s.name == name)
                    for j, i in enumerate(ids):
                        ind_ids[b, islot.col_offset + j] = islot.offset + i
                        ind_wts[b, islot.col_offset + j] = 1.0
                    member_vals[name] = self._fingerprints(values)
                else:  # identity (wide via indicator block, like vocab)
                    ids = []
                    for v in values:
                        i = self._to_int(v)
                        ids.append(i if 0 <= i < ws.size else 0)
                    islot = next(s for s in plan.indicator_slots if s.name == name)
                    for j, i in enumerate(ids):
                        ind_ids[b, islot.col_offset + j] = islot.offset + i
                        ind_wts[b, islot.col_offset + j] = 1.0
                    member_vals[name] = ids

            # crosses: chained fingerprints over the cartesian product
            for cs in plan.crosses:
                vals = [member_vals.get(m.name, [0]) or [0] for m in cs.members]
                ws = wide_by_name[cs.name]
                combos: List[int] = [hashing._P5]
                for col in vals:
                    combos = [hashing.combine64(acc, v)
                              for acc in combos for v in col]
                    if len(combos) > cs.max_len:
                        combos = combos[:cs.max_len]
                cids = [acc % cs.bucket_size for acc in combos]
                wide_put_slot(ws, cids)
                es = embed_by_name.get(cs.name)
                if es is not None:
                    _, s = es
                    emb_put(s, cids)

        out["wide_ids"], out["wide_wts"] = wide_ids, wide_wts
        for g in plan.groups:
            out[f"emb_ids_d{g.dim}"] = g_ids[g.dim]
            out[f"emb_wts_d{g.dim}"] = g_wts[g.dim]
            out[f"emb_seg_d{g.dim}"] = g_seg[g.dim]
            if mode == "train" and plan.scatter_group(g, B):
                # host-built scatter plan for the Pallas backward
                # (ops/scatter.py): sorted ids + perm + range tiles;
                # per table shard when the mesh row-shards this group
                from wide_deep_tpu.ops.scatter import (
                    make_scatter_plan, make_sharded_scatter_plan)
                if plan.scatter_shards > 1:
                    # weights route zero-grad pool padding out of shard 0
                    sp = make_sharded_scatter_plan(
                        g_ids[g.dim].reshape(-1), g.rows,
                        plan.scatter_shards, g_wts[g.dim].reshape(-1))
                    out[f"scat_ok_d{g.dim}"] = sp["ok"]
                    out[f"scat_live_d{g.dim}"] = sp["live"]
                else:
                    # weights route zero-grad pool padding to the stream
                    # tail (live-cap compaction in apply_scatter_plan)
                    sp = make_scatter_plan(g_ids[g.dim].reshape(-1), g.rows,
                                           g_wts[g.dim].reshape(-1))
                    out[f"scat_live_d{g.dim}"] = sp["live"]
                out[f"scat_ids_d{g.dim}"] = sp["ids"]
                out[f"scat_perm_d{g.dim}"] = sp["perm"]
                out[f"scat_tiles_d{g.dim}"] = sp["tiles"]
            if mode == "train" and plan.window_group(g, B):
                # window-mode plan for sparse streams (ops/scatter.py);
                # weights route zero-grad pool padding out of the windows;
                # per table shard on multi-device meshes
                from wide_deep_tpu.ops.scatter import (
                    make_sharded_window_plan, make_window_plan)
                if plan.scatter_shards > 1:
                    wp = make_sharded_window_plan(
                        g_ids[g.dim].reshape(-1), g.rows,
                        plan.scatter_shards, g_wts[g.dim].reshape(-1))
                else:
                    wp = make_window_plan(g_ids[g.dim].reshape(-1), g.rows,
                                          g_wts[g.dim].reshape(-1))
                for key, arr in wp.items():
                    out[f"wscat_{key}_d{g.dim}"] = arr
            if mode == "train" and plan.dedup_group(g, B):
                # unique-id + slot plan for the dedup exchange
                from wide_deep_tpu.ops.scatter import make_dedup_plan
                dp = make_dedup_plan(g_ids[g.dim], g.rows,
                                     plan.scatter_shards)
                for key, arr in dp.items():
                    out[f"dscat_{key}_d{g.dim}"] = arr
            if mode == "train" and plan.sparse_opt_group(g, B):
                # compact (dedup) plan for the fused touched-rows optimizer
                # (optim/sparse.apply_fused_update); per table shard on
                # multi-device meshes (apply_fused_sharded_update)
                from wide_deep_tpu.ops.scatter import (
                    make_compact_plan, make_sharded_compact_plan)
                if plan.scatter_shards > 1:
                    cp = make_sharded_compact_plan(
                        g_ids[g.dim].reshape(-1), g.rows,
                        plan.scatter_shards)
                else:
                    cp = make_compact_plan(g_ids[g.dim].reshape(-1), g.rows)
                for key, arr in cp.items():
                    out[f"sopt_{key}_d{g.dim}"] = arr
        if plan.indicator_total_len:
            out["ind_ids"], out["ind_wts"] = ind_ids, ind_wts
        if plan.continuous_slots:
            out["cont"] = cont
        return out


class CsvDataset:
    """Schema-ordered TSV dataset with shuffle/shard/batch (dataset.py analog)."""

    def __init__(self, plan: FeaturePlan, data_path: str, mode: str,
                 batch_size: int, n_classes: int = 2,
                 pos_weight: Optional[float] = None,
                 neg_weight: Optional[float] = None,
                 shuffle_buffer: int = 10000, seed: int = 123,
                 num_shards: int = 1, shard_index: int = 0,
                 transformer: Optional[FeatureTransformer] = None,
                 drop_remainder: bool = False):
        if mode not in ("train", "eval", "pred"):
            raise ValueError(f"bad mode {mode}")
        self.plan = plan
        self.files = list_files(data_path)
        self.mode = mode
        self.batch_size = batch_size
        self.shuffle_buffer = shuffle_buffer if mode == "train" else 0
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_remainder = drop_remainder
        if transformer is None:
            transformer = default_transformer(plan, n_classes, pos_weight,
                                              neg_weight)
        self.transformer = transformer
        # native transformer consumes raw line text (validates + splits in
        # C++); the Python one wants pre-split cells
        self._native = hasattr(transformer, "transform_text")
        self._n_cols = len(plan.columns)
        self._epoch = 0

    def _raw_lines_indexed(self) -> Iterator[tuple]:
        """(original_row_index, line): the index counts non-empty lines
        across the file list BEFORE sharding — the coordinate that pairs
        csv row k with image record k (features/image.ImageCsvDataset)."""
        from wide_deep_tpu.features import fs
        idx = 0
        for path in self.files:
            with fs.open_text(path, errors="replace") as f:
                for line in f:
                    line = line.rstrip("\n").rstrip("\r")
                    if not line:
                        continue
                    if idx % self.num_shards == self.shard_index:
                        yield idx, line
                    idx += 1

    def _raw_lines(self) -> Iterator[str]:
        for _, line in self._raw_lines_indexed():
            yield line

    def _rows_indexed(self) -> Iterator[tuple]:
        expect = self._n_cols
        has_label = self.mode != "pred"
        expect_nolabel = expect - 1
        for idx, line in self._raw_lines_indexed():
            cells = line.split("\t")
            if has_label:
                if len(cells) != expect:
                    continue  # malformed row, skip (decode_csv errored)
            else:
                # pred data may or may not carry the label column
                if len(cells) == expect_nolabel:
                    cells = [""] + cells
                elif len(cells) != expect:
                    continue
            yield idx, cells

    def _rows(self) -> Iterator[List[str]]:
        for _, cells in self._rows_indexed():
            yield cells

    # files whose total size fits this slurp into memory for the
    # vectorized fast path; larger inputs stream line-by-line (production
    # CTR logs arrive as bounded per-day part files, so the fast path is
    # the common case)
    FAST_SLURP_MAX_BYTES = 2 << 30

    def _fast_path_ok(self) -> bool:
        if not self._native:
            return False
        try:
            total = sum(os.path.getsize(p) for p in self.files)
        except OSError:
            return False  # remote filesystems: stream
        return total <= self.FAST_SLURP_MAX_BYTES

    def _iter_native_fast(self) -> Iterator[Batch]:
        """Vectorized batch emission for the native C++ parser.

        The streaming path costs ~9 us/row of pure Python (text-mode line
        iteration + one rng call and list churn per shuffled row), which
        HALVES the native parser's ~220k rows/s — measured in bench.py's
        e2e stage (loader-only 113k vs parser 220k).  This path reads the
        files as raw bytes, finds line boundaries with one vectorized
        scan (NO per-line objects: 35M rows cost three int arrays, not
        35M bytes objects — memory stays ~file bytes + 20 B/row, BELOW
        the streaming path's whole-file python-string shuffle buffer at
        production ``num_examples``), computes the whole shuffle order up
        front, and joins each batch directly for transform_text.

        Deterministic in (seed, epoch).  Divergences from the streaming
        path, both deliberate: the ORDER differs (both are valid
        shuffles), and invalid-UTF-8 bytes reach the byte-oriented C++
        parser RAW instead of U+FFFD-replaced.  Parties that must share a
        bit-identical stream (input-service loader groups) therefore fold
        the effective path mode into their stream digest
        (tools/input_server.py) so a mixed fast/streaming fleet fails the
        handshake instead of serving divergent slices."""
        from wide_deep_tpu.features import fs
        blobs: List[bytes] = []
        fids: List[np.ndarray] = []
        sts: List[np.ndarray] = []
        ens: List[np.ndarray] = []
        for fi, path in enumerate(self.files):
            with fs.open_bytes(path) as f:
                data = f.read()
            if not data:
                continue
            if not data.endswith(b"\n"):
                data += b"\n"
            arr = np.frombuffer(data, np.uint8)
            nl = np.flatnonzero(arr == 10)
            starts = np.empty(nl.size, np.int64)
            starts[0] = 0
            starts[1:] = nl[:-1] + 1
            ends = nl - (arr[np.maximum(nl - 1, 0)] == 13)  # strip \r
            keep = ends > starts
            starts, ends = starts[keep], ends[keep]
            blobs.append(data)
            fids.append(np.full(starts.size, len(blobs) - 1, np.int32))
            sts.append(starts)
            ens.append(ends)
        if not blobs:
            return
        fid = np.concatenate(fids)
        st = np.concatenate(sts)
        en = np.concatenate(ens)
        # original row index (pre-shard, file order) — the image-pairing
        # coordinate; definition matches _raw_lines_indexed
        orig = np.arange(fid.size, dtype=np.int64)
        if self.num_shards > 1:
            fid = fid[self.shard_index::self.num_shards]
            st = st[self.shard_index::self.num_shards]
            en = en[self.shard_index::self.num_shards]
            orig = orig[self.shard_index::self.num_shards]
        n = fid.size
        if self.shuffle_buffer > 1 and n:
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            S = min(self.shuffle_buffer, n)
            if S >= n:
                order = rng.permutation(n)
            else:
                # streaming buffer shuffle, order computed up front:
                # buffer holds S indices; each draw evicts slot j to the
                # output and refills it with the next incoming index
                order = np.empty(n, np.int64)
                buf = np.arange(S)
                js = rng.integers(0, S, n - S)
                for k in range(n - S):
                    j = js[k]
                    order[k] = buf[j]
                    buf[j] = S + k
                order[n - S:] = buf[rng.permutation(S)]
        else:
            order = np.arange(n)
        B = self.batch_size
        for lo in range(0, n, B):
            idx = order[lo:lo + B]
            if idx.size < B and self.drop_remainder:
                return
            text = b"\n".join(
                blobs[fid[i]][st[i]:en[i]] for i in idx)
            batch = self.transformer.transform_text(
                text, int(idx.size), B, self.mode)
            orig_idx = np.full(B, -1, np.int64)
            orig_idx[:idx.size] = orig[idx]
            yield batch, orig_idx

    def __iter__(self) -> Iterator[Batch]:
        for batch, _ in self._iter_impl():
            yield batch

    def iter_with_indices(self) -> Iterator[tuple]:
        """(batch, original_row_indices[int64 batch_size]) — indices count
        non-empty lines across the file list before sharding (-1 for the
        padding rows of a partial final batch).  The deterministic
        coordinate features/image.ImageCsvDataset uses to pair each row
        with ITS image record, immune to shuffle-order, sharding,
        epoch-seed and fast-vs-streaming-path differences."""
        yield from self._iter_impl()

    def _iter_impl(self) -> Iterator[tuple]:
        if self._fast_path_ok():
            yield from self._iter_native_fast()
            return
        pairs = (self._raw_lines_indexed() if self._native
                 else self._rows_indexed())
        if self.shuffle_buffer > 1:
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            buf: List = []
            def shuffled():
                for r in pairs:
                    buf.append(r)
                    if len(buf) >= self.shuffle_buffer:
                        j = rng.integers(len(buf))
                        buf[j], buf[-1] = buf[-1], buf[j]
                        yield buf.pop()
                for j in rng.permutation(len(buf)):
                    yield buf[j]
            source = shuffled()
        else:
            source = pairs
        chunk: List = []
        idxs: List[int] = []
        for idx, r in source:
            chunk.append(r)
            idxs.append(idx)
            if len(chunk) == self.batch_size:
                yield self._emit(chunk), self._pad_idxs(idxs)
                chunk, idxs = [], []
        if chunk and not self.drop_remainder:
            yield self._emit(chunk), self._pad_idxs(idxs)

    def _pad_idxs(self, idxs: List[int]) -> np.ndarray:
        out = np.full(self.batch_size, -1, np.int64)
        out[:len(idxs)] = idxs
        return out

    def _emit(self, chunk: List) -> Batch:
        if self._native:
            text = "\n".join(chunk).encode("utf-8", errors="replace")
            return self.transformer.transform_text(
                text, len(chunk), self.batch_size, self.mode)
        return self.transformer.transform(chunk, self.batch_size, self.mode)


def default_transformer(plan: FeaturePlan, n_classes: int = 2,
                        pos_weight: Optional[float] = None,
                        neg_weight: Optional[float] = None,
                        num_parallel_calls: Optional[int] = None):
    """Native C++ transformer when the library is built, Python otherwise.

    ``num_parallel_calls`` (train.yaml) sets the native parser's thread
    count (reference dataset.py map parallelism analog)."""
    try:
        from wide_deep_tpu.features.native import NativeTransformer
        if NativeTransformer.available():
            return NativeTransformer(plan, n_classes, pos_weight, neg_weight,
                                     n_threads=num_parallel_calls or 0)
    except Exception:
        pass
    return FeatureTransformer(plan, n_classes, pos_weight, neg_weight)


class PrefetchIterator:
    """Background-thread prefetch over a batch iterable (the tf.data
    ``prefetch`` analog): host-side parsing/packing overlaps the device
    step instead of serializing with it."""

    def __init__(self, iterable, depth: int = 2):
        import queue
        import threading
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._done = object()
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                self._error = e
            finally:
                self._queue.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            # re-arm the sentinel so further next() calls keep raising
            # StopIteration instead of blocking on the drained queue
            self._queue.put(self._done)
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


class DevicePrefetchIterator:
    """Pipeline host->device transfers behind device compute.

    ``PrefetchIterator`` overlaps the PARSE with the step, but the
    ``device_put`` of each ~25 MB production batch still ran inline in
    the train loop — on remote-device tunnels that copy is the largest
    e2e stage (~380 ms/batch, bench.py round 5) and it serialized with
    everything else.  This wrapper runs ``to_device`` in a background
    thread up to ``depth`` batches ahead, so sustained e2e throughput
    becomes max(parse, transfer, step) instead of their sum.  JAX
    dispatch is thread-safe; transfers enqueue on the device stream and
    complete before the step that consumes them."""

    def __init__(self, iterable, to_device, depth: int = 2):
        self._inner = PrefetchIterator(
            (to_device(b) for b in iterable), depth=depth)

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._inner)


def input_fn(csv_data_file: str, img_data_file: Optional[str], mode: str,
             batch_size: int, plan: Optional[FeaturePlan] = None,
             **kwargs) -> CsvDataset:
    """Module-level convenience mirroring reference dataset.py:293-310."""
    from wide_deep_tpu.config import Config
    if plan is None:
        plan = FeaturePlan(Config())
    if img_data_file:
        from wide_deep_tpu.features.image import ImageCsvDataset
        return ImageCsvDataset(plan, csv_data_file, img_data_file, mode,
                               batch_size, **kwargs)
    return CsvDataset(plan, csv_data_file, mode, batch_size, **kwargs)
