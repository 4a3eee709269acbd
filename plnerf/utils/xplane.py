"""Minimal XSpace (jax/tsl profiler ``*.xplane.pb``) reader.

The image's tensorboard profile plugin cannot convert xplane files (its
pywrap bridge is incompatible), so this implements just enough of the
protobuf wire format to aggregate device-op durations — the "op profile"
view needed to find where a TPU step spends its time.

Field numbers from tsl/profiler/protobuf/xplane.proto:
  XSpace.planes = 1 (XPlane)
  XPlane: id=1, name=2, lines=3 (XLine), event_metadata=4 (map),
          stat_metadata=5 (map)
  XLine:  id=1, name=2, timestamp_ns=3, events=4 (XEvent)
  XEvent: metadata_id=1, offset_ps=2, duration_ps=3
  XEventMetadata: id=1, name=2, display_name=3
  map entries: key=1, value=2
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer.
    Varints are returned as their int value encoded back via payload=None
    convention: we return (fn, 0, int) for varints."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
            yield fn, 0, val
        elif wt == 1:
            yield fn, 1, buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            yield fn, 2, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fn, 5, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def op_durations(path: str, per_line: bool = False):
    """Aggregate event durations: {plane_name: {op_name: total_ps}}, or with
    ``per_line`` {(plane_name, line_name): {...}} (async-copy lines overlap
    real execution, so per-line separation matters for attribution)."""
    with open(path, "rb") as f:
        space = f.read()

    out: Dict[str, Dict[str, float]] = {}
    for fn, wt, plane in _fields(space):
        if fn != 1 or wt != 2:
            continue
        plane_name = ""
        meta: Dict[int, str] = {}
        lines: List[bytes] = []
        for pfn, pwt, pval in _fields(plane):
            if pfn == 2 and pwt == 2:
                plane_name = pval.decode("utf-8", "replace")
            elif pfn == 3 and pwt == 2:
                lines.append(pval)
            elif pfn == 4 and pwt == 2:  # event_metadata map entry
                mid, mname = None, ""
                for efn, ewt, eval_ in _fields(pval):
                    if efn == 1 and ewt == 0:
                        mid = eval_
                    elif efn == 2 and ewt == 2:  # XEventMetadata
                        for mfn, mwt, mval in _fields(eval_):
                            if mfn == 2 and mwt == 2:
                                mname = mval.decode("utf-8", "replace")
                if mid is not None:
                    meta[mid] = mname
        for line in lines:
            line_name = next(
                (v.decode("utf-8", "replace") for f, w, v in _fields(line)
                 if f == 2 and w == 2), "")
            agg = out.setdefault(
                (plane_name, line_name) if per_line else plane_name,
                defaultdict(float))
            for lfn, lwt, lval in _fields(line):
                if lfn == 4 and lwt == 2:  # XEvent
                    mid, dur = None, 0
                    for efn, ewt, ev in _fields(lval):
                        if efn == 1 and ewt == 0:
                            mid = ev
                        elif efn == 3 and ewt == 0:
                            dur = ev
                    agg[meta.get(mid, f"#{mid}")] += dur
    return {k: dict(v) for k, v in out.items() if v}


def top_device_ops(path: str, k: int = 25) -> List[Tuple[str, float]]:
    """Top-k (op_name, total_ms) on TPU device planes."""
    planes = op_durations(path)
    agg: Dict[str, float] = defaultdict(float)
    for pname, ops in planes.items():
        if "TPU" in pname or "/device" in pname.lower():
            for name, ps in ops.items():
                agg[name] += ps
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:k]
    return [(name, ps / 1e9) for name, ps in items]
