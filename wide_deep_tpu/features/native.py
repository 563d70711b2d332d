"""Native (C++) fast path for the feature pipeline.

Serializes the FeaturePlan into a compact binary blob consumed by
cpp/fastdata.cc (built as libwdtfastdata.so, loaded via ctypes), and exposes
``NativeTransformer`` — a drop-in replacement for
pipeline.FeatureTransformer.transform that is bit-identical (same xxHash64,
same cross chain, same packing) but parses/hashes/packs in multithreaded C++.

The reference's only native component was a serving client (client.cc); here
native code carries the host hot path: at production batch sizes the Python
parser is the bottleneck (≈2.5k rows/s vs ≳1M rows/s native), far below the
TPU step throughput.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

from wide_deep_tpu.features.plan import FeaturePlan

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "cpp", "libwdtfastdata.so")

_KIND = {"hash_bucket": 0, "vocab": 1, "identity": 2, "continuous": 3}
_TRAN = {None: 0, "min_max": 1, "standard": 2, "log": 3}


def serialize_plan(plan: FeaturePlan) -> bytes:
    """FeaturePlan -> binary blob for wdt_plan_create (format v6, packed
    pools: per-group/wide shared id pools with slot indices for the segment
    column; per-slot entry caps = pack_budget).  Version history: v4 added
    per-slot wide-fold flags (folded slots emit no wide-pool entries); v5
    added per-group table row counts so the loader can emit Pallas scatter
    plans (ops/scatter.py) with each batch; v6 added scatter_shards so the
    loader emits PER-TABLE-SHARD plans (localized sorted streams + tiles +
    ok flags) for multi-device meshes; v7 added window-plan emission
    (wdt_transform gained the window_mask argument); v8 added live-cap
    compaction to single-stream range plans (weight-0 padding remapped to
    an out-of-range sentinel + a trailing live-count array per group); v9
    added native sharded-window and compact/sopt plan emission
    (wdt_transform gained the sopt_mask argument); v10 added native
    dedup-exchange plans (wdt_transform gained the dedup_mask argument) —
    every per-batch plan kind now emits inside the C++ loader; v11/v12
    added per-shard live counts to the sharded range/window (v11) and
    compact/sopt (v12) plans (a trailing [n_shards] int32 array each —
    the consumers' live-cap compaction).

    All ints int64 LE, floats f64 LE, strings length-prefixed.  Must stay in
    lockstep with cpp/fastdata.cc::parse_plan.
    """
    out = bytearray()
    w = out.extend

    def i64(*vals):
        w(struct.pack("<" + "q" * len(vals), *vals))

    def f64(*vals):
        w(struct.pack("<" + "d" * len(vals), *vals))

    def s(text: str):
        b = text.encode("utf-8")
        i64(len(b))
        w(b)

    w(b"WDTP")
    i64(12)  # version (v12: live counts in ALL sharded plan layouts)
    group_index = {g.dim: gi for gi, g in enumerate(plan.groups)}
    i64(int(getattr(plan, "scatter_shards", 1)))
    i64(len(plan.columns), int(plan.multivalue), int(plan.pack_budget),
        plan.wide_packed_len,
        plan.indicator_total_len, len(plan.continuous_slots),
        len(plan.groups))
    for g in plan.groups:
        i64(g.dim, plan.group_packed_len[g.dim], g.rows)

    feats = plan.feature_order
    feat_index = {name: i for i, name in enumerate(feats)}
    i64(len(feats))
    for name in feats:
        conf = plan.feature_conf[name]
        kind = _KIND[conf["transform"] or "continuous"] \
            if conf["type"] == "category" else 3
        s(name)
        i64(plan.column_index[name], kind)
        if kind == 0:  # hash
            ws = plan.wide_slot_by_name[name]
            _, es = plan.embed_slot_by_name[name]
            i64(ws.max_len, ws.size, ws.offset,
                group_index[es.dim], es.row_offset, es.index,
                int(ws.folded))
        elif kind in (1, 2):  # vocab / identity
            ws = plan.wide_slot_by_name[name]
            isl = next(x for x in plan.indicator_slots if x.name == name)
            i64(ws.max_len, ws.size, ws.offset,
                isl.offset, isl.col_offset)
            if kind == 1:
                for v in isl.vocab:
                    s(v)
        else:  # continuous
            slot = next(x for x in plan.continuous_slots if x.name == name)
            i64(1, _TRAN[slot.transform])
            f64(slot.a, slot.b)
            i64(slot.index, len(slot.boundaries))
            if slot.boundaries:
                f64(*slot.boundaries)
            if slot.boundaries:
                ws = plan.wide_slot_by_name[name]
                i64(1, ws.offset)
            else:
                i64(0, 0)

    i64(len(plan.crosses))
    for cs in plan.crosses:
        i64(len(cs.members))
        for m in cs.members:
            i64(feat_index[m.name])
        ws = plan.wide_slot_by_name[cs.name]
        es = plan.embed_slot_by_name.get(cs.name)
        if es is not None:
            g, slot = es
            i64(cs.bucket_size, cs.max_len, ws.offset, 1,
                group_index[slot.dim], slot.row_offset, slot.index,
                int(ws.folded))
        else:
            i64(cs.bucket_size, cs.max_len, ws.offset, 0, 0, 0, 0, 0)
    return bytes(out)


class NativeTransformer:
    """ctypes wrapper over libwdtfastdata.so; API-compatible with
    FeatureTransformer.transform."""

    def __init__(self, plan: FeaturePlan, n_classes: int = 2,
                 pos_weight: Optional[float] = None,
                 neg_weight: Optional[float] = None,
                 n_threads: int = 0, lib_path: Optional[str] = None):
        self.plan = plan
        self.n_classes = n_classes
        self.pos_weight = pos_weight
        self.neg_weight = neg_weight
        self.weighted = pos_weight is not None and neg_weight is not None
        self.n_threads = n_threads or min(os.cpu_count() or 1, 16)
        path = lib_path or _LIB_PATH
        self._lib = ctypes.CDLL(path)
        self._lib.wdt_plan_create.restype = ctypes.c_void_p
        self._lib.wdt_plan_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        self._lib.wdt_transform.restype = ctypes.c_int64
        self._lib.wdt_transform.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p)]
        blob = serialize_plan(plan)
        self._plan_handle = self._lib.wdt_plan_create(blob, len(blob))
        if not self._plan_handle:
            raise RuntimeError("wdt_plan_create failed (plan blob rejected)")

    @staticmethod
    def available(lib_path: Optional[str] = None) -> bool:
        return os.path.exists(lib_path or _LIB_PATH)

    def transform_text(self, text: bytes, n_rows_hint: int, batch_size: int,
                       mode: str = "train") -> Dict[str, np.ndarray]:
        """Pack a buffer of raw TSV lines into a Batch (fixed batch_size).

        ``n_rows_hint`` is accepted for call-site symmetry but unused:
        the C++ pass-1 line splitter sizes everything itself and rows
        beyond ``batch_size`` are an error it reports."""
        plan = self.plan
        B = batch_size
        out: Dict[str, np.ndarray] = {
            "label": np.zeros(B, np.float32),
            "weight": np.zeros(B, np.float32),
            "mask": np.zeros(B, np.float32),
            "wide_ids": np.zeros((B, plan.wide_packed_len), np.int32),
            "wide_wts": np.zeros((B, plan.wide_packed_len), np.float32),
        }
        ptr_order: List[np.ndarray] = [
            out["label"], out["weight"], out["mask"],
            out["wide_ids"], out["wide_wts"]]
        for g in plan.groups:
            P = plan.group_packed_len[g.dim]
            ids = np.zeros((B, P), np.int32)
            wts = np.zeros((B, P), np.float32)
            seg = np.zeros((B, P), np.int32)
            out[f"emb_ids_d{g.dim}"], out[f"emb_wts_d{g.dim}"] = ids, wts
            out[f"emb_seg_d{g.dim}"] = seg
            ptr_order += [ids, wts, seg]
        ind_ids = np.zeros((B, max(plan.indicator_total_len, 1)), np.int32)
        ind_wts = np.zeros((B, max(plan.indicator_total_len, 1)), np.float32)
        ptr_order += [ind_ids, ind_wts]
        cont = np.zeros((B, max(len(plan.continuous_slots), 1)), np.float32)
        ptr_order.append(cont)
        if plan.indicator_total_len:
            out["ind_ids"], out["ind_wts"] = ind_ids, ind_wts
        if plan.continuous_slots:
            out["cont"] = cont

        # Pallas scatter plans (ops/scatter.py) for big groups, train mode;
        # per table shard (ids/perm/tiles/ok with leading n_shards axis)
        # when the plan was compiled for a multi-device mesh; window plans
        # (fixed row windows) for sparse streams
        scat_mask = 0
        window_mask = 0
        sopt_mask = 0
        dedup_mask = 0
        dedup_caps = [0] * len(plan.groups)
        if mode == "train":
            from wide_deep_tpu.ops.scatter import (
                compact_plan_spec, dedup_batch_spec, scatter_batch_spec,
                sharded_compact_plan_spec, sharded_scatter_batch_spec,
                sharded_window_batch_spec, window_batch_spec)
            for gi, g in enumerate(plan.groups):
                if not plan.scatter_group(g, B):
                    continue
                scat_mask |= 1 << gi
                n_ids = B * plan.group_packed_len[g.dim]
                if plan.scatter_shards > 1:
                    spec = sharded_scatter_batch_spec(
                        n_ids, g.rows, plan.scatter_shards)
                else:
                    spec = scatter_batch_spec(n_ids, g.rows)
                for key in ("ids", "perm", "tiles", "ok", "live"):
                    if key not in spec:
                        continue
                    shape, dt = spec[key]
                    arr = np.zeros(shape, dt)
                    out[f"scat_{key}_d{g.dim}"] = arr
                    ptr_order.append(arr)
            for gi, g in enumerate(plan.groups):
                if not plan.window_group(g, B):
                    continue
                window_mask |= 1 << gi
                n_ids = B * plan.group_packed_len[g.dim]
                spec = (sharded_window_batch_spec(
                            n_ids, g.rows, plan.scatter_shards)
                        if plan.scatter_shards > 1
                        else window_batch_spec(n_ids, g.rows))
                for key in ("ids", "perm", "tiles", "ok", "live"):
                    if key not in spec:
                        continue
                    shape, dt = spec[key]
                    arr = np.zeros(shape, dt)
                    out[f"wscat_{key}_d{g.dim}"] = arr
                    ptr_order.append(arr)
            for gi, g in enumerate(plan.groups):
                if not plan.sparse_opt_group(g, B):
                    continue
                sopt_mask |= 1 << gi
                n_ids = B * plan.group_packed_len[g.dim]
                spec = (sharded_compact_plan_spec(
                            n_ids, plan.scatter_shards)
                        if plan.scatter_shards > 1
                        else compact_plan_spec(n_ids))
                for key in ("uids", "ids", "perm", "tiles", "ok", "live"):
                    if key not in spec:
                        continue
                    shape, dt = spec[key]
                    arr = np.zeros(shape, dt)
                    out[f"sopt_{key}_d{g.dim}"] = arr
                    ptr_order.append(arr)
            for gi, g in enumerate(plan.groups):
                if not plan.dedup_group(g, B):
                    continue
                dedup_mask |= 1 << gi
                P = plan.group_packed_len[g.dim]
                spec = dedup_batch_spec(B * P, g.rows,
                                        plan.scatter_shards, (B, P))
                # the uids buffer's trailing dim IS the dedup cap; C++
                # receives it via dedup_caps instead of recomputing the
                # transcendental (np.exp vs std::exp could differ by an
                # ulp at a ceil boundary and mis-size the indexing)
                dedup_caps[gi] = spec["uids"][0][1]
                for key in ("uids", "slots"):
                    shape, dt = spec[key]
                    arr = np.zeros(shape, dt)
                    out[f"dscat_{key}_d{g.dim}"] = arr
                    ptr_order.append(arr)

        ptrs = (ctypes.c_void_p * len(ptr_order))(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in ptr_order])
        has_label = 0 if mode == "pred" else 1
        caps_arr = (ctypes.c_int64 * len(plan.groups))(*dedup_caps)
        n = self._lib.wdt_transform(
            self._plan_handle, text, len(text), B, has_label,
            1 if self.n_classes > 2 else 0,
            # explicit None check, not `or`: pos_sample_loss_weight: 0 is
            # a legal "zero this class out" config and must not coerce to
            # 1.0 (the Python path writes 0.0 — bit-identical contract)
            float(1.0 if self.pos_weight is None else self.pos_weight),
            float(1.0 if self.neg_weight is None else self.neg_weight),
            1 if self.weighted else 0, self.n_threads, scat_mask,
            window_mask, sopt_mask, dedup_mask, caps_arr, ptrs)
        if n == -4:
            raise ValueError(
                "dedup exchange: a table shard's unique-id count exceeded "
                "its static cap — unusually spread ids; raise DEDUP_SLACK "
                "or use sharded_lookup: explicit")
        if n < 0:
            raise RuntimeError(f"wdt_transform failed: {n}")
        if mode == "pred":
            out.pop("label"); out.pop("weight")
        return out

    def transform(self, rows: Sequence[Sequence[str]], batch_size: int,
                  mode: str = "train") -> Dict[str, np.ndarray]:
        """Row-list API matching FeatureTransformer (joins back to text)."""
        text = "\n".join("\t".join(cells) for cells in rows).encode("utf-8")
        return self.transform_text(text, len(rows), batch_size, mode)
