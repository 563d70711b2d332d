#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb capture and print per-op total device time.

Minimal XSpace/XPlane/XLine/XEvent protobuf walker (no TF/TSL dependency)
over the profiler output directory (plugins/profile/<run>/*.xplane.pb).
Usage: python tools/parse_xplane.py /tmp/jaxtrace [top_n]
"""

import glob
import os
import sys
from collections import defaultdict


def read_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field, wire, value, raw_bytes_for_len_delimited)."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = read_varint(buf, pos)
            yield field, wire, v, None
        elif wire == 1:
            yield field, wire, None, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            yield field, wire, None, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, None, buf[pos:pos + 4]
            pos += 4
        else:
            raise IOError(f"wire {wire}")


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for f, w, v, raw in fields(buf):
        if f == 2 and w == 2:
            name = raw.decode("utf-8", "replace")
        elif f == 3 and w == 2:
            lines.append(raw)
        elif f == 4 and w == 2:  # map<int64, XEventMetadata>
            key, val = None, None
            for mf, mw, mv, mraw in fields(raw):
                if mf == 1 and mw == 0:
                    key = mv
                elif mf == 2 and mw == 2:
                    val = mraw
            if key is not None and val is not None:
                mname = ""
                for ef, ew, ev, eraw in fields(val):
                    if ef == 2 and ew == 2:
                        mname = eraw.decode("utf-8", "replace")
                meta[key] = mname
    return name, lines, meta


def parse_line(buf):
    events = []
    lname = ""
    for f, w, v, raw in fields(buf):
        if f == 2 and w == 2:
            lname = raw.decode("utf-8", "replace")
        elif f == 4 and w == 2:
            mid = dur = 0
            for ef, ew, ev, eraw in fields(raw):
                if ef == 1 and ew == 0:
                    mid = ev
                elif ef == 3 and ew == 0:
                    dur = ev
            events.append((mid, dur))
    return lname, events


def is_device_plane(pname: str) -> bool:
    return ("TPU" in pname or "Device" in pname
            or "/device" in pname.lower())


def op_totals(root: str, line_filter: str = None):
    """Walk every xplane.pb under ``root`` -> {op name: total ps} over the
    device planes (XEvent durations are picoseconds).  ``line_filter``:
    keep only XLines named EXACTLY that (e.g. "XLA Ops" — the op-level
    line on TPU device planes; a substring match would also sweep in
    "Async XLA Ops", the overlapping DMA spans, and double-count)."""
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                      recursive=True)
    totals = defaultdict(int)
    for path in paths:
        with open(path, "rb") as f:
            space = f.read()
        for f_, w, v, raw in fields(space):
            if f_ == 1 and w == 2:  # plane
                pname, lines, meta = parse_plane(raw)
                if not is_device_plane(pname):
                    continue
                for line in lines:
                    lname, events = parse_line(line)
                    if line_filter is not None and lname != line_filter:
                        continue
                    for mid, dur in events:
                        totals[meta.get(mid, f"#{mid}")] += dur
    return dict(totals)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    totals = op_totals(root)
    if not totals:
        print(f"no xplane.pb under {root}")
        return
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    total_all = sum(totals.values())
    print(f"total device event time: {total_all/1e9:.2f} ms "
          f"(all lines, may double-count nesting)")
    for name, dur in ranked:
        print(f"{dur/1e9:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
