#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb trace without TensorBoard.

Minimal raw-wire protobuf reader for the XSpace schema (the subset needed
to aggregate device-op time): prints per-plane, per-line op-duration
totals grouped by event name.  Usage:

    python tools/xplane_summary.py /tmp/vpc_trace [top_n]

Reference analog: the reference ships a layerwise profiler
(vllm/profiler/layerwise_profile.py) for the same "where do the
milliseconds go" question.
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) for one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _parse_event(buf: bytes) -> tuple[int, int]:
    meta_id = dur_ps = 0
    for fno, _, v in _fields(buf):
        if fno == 1:
            meta_id = v
        elif fno == 3:
            dur_ps = v
    return meta_id, dur_ps


def _parse_line(buf: bytes):
    """XLine: id=1, name=2, timestamp_ns=3, events=4, display_name=11."""
    name = ""
    events = []
    for fno, wt, v in _fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode(errors="replace")
        elif fno == 11 and wt == 2 and not name:
            name = v.decode(errors="replace")
        elif fno == 4 and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf: bytes) -> tuple[int, str]:
    """map<int64, XEventMetadata> entry: key=1, value=2 (XEventMetadata:
    id=1, name=2, display_name=3)."""
    key = 0
    name = ""
    for fno, _, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode(errors="replace")
    return key, name


def parse_plane(buf: bytes):
    name = ""
    lines = []
    meta = {}
    for fno, _, v in _fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 3:
            lines.append(_parse_line(v))
        elif fno == 4:
            k, n = _parse_meta_entry(v)
            meta[k] = n
    return name, lines, meta


def summarize(path: str, top_n: int = 20) -> None:
    files = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not files:
        sys.exit(f"no xplane.pb under {path}")
    data = open(files[-1], "rb").read()
    for fno, _, v in _fields(data):
        if fno != 1:
            continue
        pname, lines, meta = parse_plane(v)
        dur_by_op = defaultdict(int)
        count_by_op = defaultdict(int)
        for lname, events in lines:
            for meta_id, dur_ps in events:
                op = meta[meta_id] if meta_id in meta else f"#{meta_id}"
                dur_by_op[(lname, op)] += dur_ps
                count_by_op[(lname, op)] += 1
        if not dur_by_op:
            continue
        total = sum(dur_by_op.values())
        print(f"\n=== plane: {pname}  (total {total / 1e12 * 1e3:.3f} ms "
              f"across lines) ===")
        rows = sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:top_n]
        for (lname, op), ps in rows:
            print(f"  {ps / 1e9:10.3f}ms  x{count_by_op[(lname, op)]:<6d} "
                  f"[{lname[:18]:18s}] {op[:80]}")


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vpc_trace",
              int(sys.argv[2]) if len(sys.argv) > 2 else 20)
