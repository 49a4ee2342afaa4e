"""Standalone XPlane trace summarizer (no tensorflow needed).

Parses a jax.profiler .xplane.pb with the hand-rolled protobuf wire reader from
micro_diffusion_tpu.utils.spm and prints, per plane, total event time grouped by
event name - enough to attribute device time to HLO ops/fusions.

Usage: python scripts/xplane_summary.py <trace_dir_or_pb> [top_n] [name_filter]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micro_diffusion_tpu.utils.spm import _iter_fields, _read_varint  # noqa: E402


def _zigzag(v):  # not used by xplane (no sint fields) but kept for completeness
    return (v >> 1) ^ -(v & 1)


def parse_xspace(data: bytes):
    planes = []
    for f, w, v in _iter_fields(data):
        if f == 1 and w == 2:
            planes.append(parse_xplane(v))
    return planes


def parse_xplane(buf: bytes):
    name = ""
    lines = []
    event_meta = {}
    for f, w, v in _iter_fields(buf):
        if f == 2 and w == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3 and w == 2:
            lines.append(v)
        elif f == 4 and w == 2:  # map<int64, XEventMetadata>
            key, meta_name = None, ""
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 2 and w3 == 2:
                            meta_name = v3.decode("utf-8", "replace")
            if key is not None:
                event_meta[key] = meta_name
    parsed_lines = []
    for lv in lines:
        line_name = ""
        events = []
        for f, w, v in _iter_fields(lv):
            if f == 2 and w == 2:
                line_name = v.decode("utf-8", "replace")
            elif f == 4 and w == 2:
                mid, dur = None, 0
                for f2, w2, v2 in _iter_fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                events.append((mid, dur))
        parsed_lines.append((line_name, events))
    return {"name": name, "lines": parsed_lines, "event_meta": event_meta}


def summarize(path: str, top_n: int = 30, name_filter: str = ""):
    if os.path.isdir(path):
        pbs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                               recursive=True))
        assert pbs, f"no .xplane.pb under {path}"
        path = pbs[-1]
    with open(path, "rb") as f:
        planes = parse_xspace(f.read())
    for plane in planes:
        totals = {}
        n_events = 0
        for line_name, events in plane["lines"]:
            for mid, dur in events:
                n_events += 1
                nm = plane["event_meta"].get(mid, f"#{mid}")
                if name_filter and name_filter not in nm:
                    continue
                totals[nm] = totals.get(nm, 0) + dur
        total_ms = sum(totals.values()) / 1e9
        print(f"\n=== plane: {plane['name']}  ({n_events} events, "
              f"{total_ms:.1f} ms total) ===")
        for nm, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {ps / 1e9:9.3f} ms  {nm[:110]}")


if __name__ == "__main__":
    summarize(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        sys.argv[3] if len(sys.argv) > 3 else "",
    )
