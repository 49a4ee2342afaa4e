"""Categorize device time in an xplane trace by op class.

Aggregates the XLA-Ops line (core-serial HLO events) of the TPU device plane
into readable buckets - converts, AdamW-ish fusions, Pallas kernels (flash /
MoE), copies, dots, etc. - to attribute step time to levers. Same wire parser
as scripts/xplane_summary.py.

Usage: python scripts/xplane_categories.py <trace_dir_or_pb> [n_steps]

n_steps: number of train steps captured in the trace (divides totals to
ms/step; default 1 = print raw totals).
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.xplane_summary import parse_xspace  # noqa: E402


CATEGORIES = [
    # (bucket, regex on the op NAME - the %token left of " = ")
    ("moe kernel (pallas)", r"onehot_path|moe_ffn|expert_ffn|^%mlp\."),
    ("attn kernel/fusion", r"^%attn|flash|^%cross_attn"),
    ("convert", r"^%convert"),
    ("copy", r"^%copy"),
    ("slice/dyn-slice", r"^%slice|^%dynamic-slice|^%dynamic_update"),
    ("collective", r"^%all-reduce|^%collective"),
    ("dot/conv", r"^%dot|^%conv|^%cudnn"),
    ("reduce", r"^%reduce"),
    ("fusion (unnamed)", r"^%(loop_)?fusion|^%input_fusion|^%output_fusion|^%wide"),
    ("bitcast/reshape/pad", r"^%bitcast|^%reshape|^%transpose|^%pad"),
]


def classify(name: str) -> str:
    head = name.split(" = ", 1)[0]
    for bucket, pat in CATEGORIES:
        if re.search(pat, head):
            return bucket
    # named fusions carry the jax scope, e.g. %adamw_update_fusion.3
    return "named fusion: " + re.sub(r"[.\d]+$", "", head.lstrip("%"))[:40]


def main():
    path = sys.argv[1]
    n_steps = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    if os.path.isdir(path):
        pbs = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                               recursive=True))
        assert pbs, f"no .xplane.pb under {path}"
        path = pbs[-1]
    with open(path, "rb") as f:
        planes = parse_xspace(f.read())
    for plane in planes:
        if "TPU" not in plane["name"]:
            continue
        meta = plane["event_meta"]
        for line_name, events in plane["lines"]:
            if line_name != "XLA Ops":  # skip the overlapping async DMA line
                continue
            buckets = {}
            samples = {}
            total = 0
            for mid, dur in events:
                name = meta.get(mid, "?")
                if name.startswith("jit_"):  # whole-module envelope event
                    continue
                b = classify(name)
                buckets[b] = buckets.get(b, 0) + dur
                total += dur
                s = samples.setdefault(b, {})
                key = name[:90]
                s[key] = s.get(key, 0) + dur
            print(f"plane {plane['name']!r} line {line_name!r}: "
                  f"total {total/1e9/n_steps:.1f} ms/step over {n_steps:g} steps")
            for b, ns in sorted(buckets.items(), key=lambda kv: -kv[1]):
                print(f"  {b:40s} {ns/1e9/n_steps:8.1f} ms/step")
                top = sorted(samples[b].items(), key=lambda kv: -kv[1])[:3]
                for k, v in top:
                    print(f"      {v/1e9/n_steps:7.2f}  {k}")


if __name__ == "__main__":
    main()
