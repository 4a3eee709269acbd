"""utils/xplane: wire-format reader round-trip against a hand-encoded
XSpace buffer (plane -> metadata map + line -> events)."""
import struct

import numpy as np

from plnerf.utils.xplane import op_durations, top_device_ops


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fn: int, wt: int, payload) -> bytes:
    tag = _varint((fn << 3) | wt)
    if wt == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _make_xspace(tmp_path):
    # XEventMetadata {id=1, name=2}
    def ev_meta(mid, name):
        inner = _field(1, 0, mid) + _field(2, 2, name.encode())
        return _field(4, 2, _field(1, 0, mid) + _field(2, 2, inner))

    # XEvent {metadata_id=1, duration_ps=3} inside XLine.events=4
    def event(mid, dur_ps):
        return _field(4, 2, _field(1, 0, mid) + _field(3, 0, dur_ps))

    line = _field(2, 2, b"XLA Ops") + event(7, 1_000_000) \
        + event(7, 2_000_000) + event(9, 500_000)
    plane = (_field(2, 2, b"/device:TPU:0")
             + ev_meta(7, "%fusion.1") + ev_meta(9, "%copy.2")
             + _field(3, 2, line))
    space = _field(1, 2, plane)
    path = str(tmp_path / "t.xplane.pb")
    with open(path, "wb") as f:
        f.write(space)
    return path


def test_op_durations_roundtrip(tmp_path):
    path = _make_xspace(tmp_path)
    planes = op_durations(path, per_line=True)
    ops = planes[("/device:TPU:0", "XLA Ops")]
    assert ops["%fusion.1"] == 3_000_000   # summed across events
    assert ops["%copy.2"] == 500_000

    top = top_device_ops(path, k=2)
    assert top[0] == ("%fusion.1", 3_000_000 / 1e9)
    assert top[1][0] == "%copy.2"
