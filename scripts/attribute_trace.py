"""Attribute device-trace time to model components.

Joins a jax.profiler xplane trace (event names = HLO instruction names, parsed
by the first-party reader in xplane_summary.py) against the OPTIMIZED HLO text
of the same executable (tune.py --dump-hlo), whose per-instruction metadata
carries op_name="jit(train_step)/..." and source_file=... - then buckets total
device time by component (attention / MoE / dense-FFN / optimizer / ...).

This is how the round-3 "attention ms/step" numbers in PERF.md are produced
(VERDICT round-2 ask #3: measure attention in-step, not in isolation).

Usage:
  python scripts/tune.py --stage res512_mask0 --remat dots_attn_moe --mb 8 \
      --nu bf16 --moe hybrid --dump-hlo          # writes hlo_<cfg>.txt
  python scripts/tune.py ... --profile           # writes profile_trace/<cfg>/
  python scripts/attribute_trace.py profile_trace/<cfg> hlo_<cfg>.txt [n_steps]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xplane_summary import parse_xspace  # noqa: E402

# (bucket, regex over "op_name | source_file") - first match wins
BUCKETS = [
    ("attention", r"/attn/|/cross_attn/|flash_|attention|attn_out"),
    ("moe", r"/moe|moe_ffn|moe_dispatch|expert|/gate/|moe_out"),
    ("dense_ffn", r"/mlp/|/w1/|/w2/|/w3/|/fc1/|/fc2/"),
    ("adaln_mod", r"adaLN|modulate|adaln"),
    ("optimizer", r"optax|adam|ema_|global_norm|clip|/optim"),
    ("norms", r"norm|LayerNorm"),
    ("embed_patch", r"x_embedder|pos_embed|patchify|unpatchify|final_layer"
                    r"|t_embedder|y_embedder|pooled|timestep"),
    ("masking", r"/mask|take_along|gather_tokens|unmask"),
    ("loss_edm", r"edm|sigma|loss|avg_pool"),
]


def load_hlo_metadata(hlo_path: str):
    """instruction name -> 'op_name | source_file' from optimized HLO text.

    Async DMA wrappers (slice-start / copy-start / all-reduce-start, the
    biggest single movers in the stage traces) carry no metadata of their own;
    they inherit it from the first metadata-bearing operand on their defining
    line (one indirection level is enough in practice)."""
    meta, lines_by_name = {}, {}
    name_pat = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=")
    op_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)"')
    with open(hlo_path) as f:
        for line in f:
            m = name_pat.match(line)
            if not m:
                continue
            name = m.group(1)
            lines_by_name[name] = line
            if "metadata={" in line:
                op = op_pat.search(line)
                src = src_pat.search(line)
                meta[name] = (
                    f"{op.group(1) if op else ''} | {src.group(1) if src else ''}"
                )
    operand_pat = re.compile(r"%([\w.-]+)")
    # up to two inheritance passes (slice-start of a copy of a fusion)
    for _ in range(2):
        for name, line in lines_by_name.items():
            if name in meta:
                continue
            for ref in operand_pat.findall(line):
                if ref != name and ref in meta:
                    meta[name] = "(via operand) " + meta[ref].replace(
                        "(via operand) ", ""
                    )
                    break
    return meta


def classify(tag: str) -> str:
    for bucket, rx in BUCKETS:
        if re.search(rx, tag, re.I):
            return bucket
    return "other"


def main(trace_dir: str, hlo_path: str, n_steps: int = 3):
    import glob

    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    assert pbs, f"no xplane.pb under {trace_dir}"
    with open(pbs[-1], "rb") as f:
        planes = parse_xspace(f.read())
    meta = load_hlo_metadata(hlo_path)
    print(f"{len(meta)} HLO instructions with metadata", file=sys.stderr)

    dev = next(p for p in planes if "TPU" in p["name"] or "device" in p["name"])
    totals, examples, unmatched_ms = {}, {}, 0.0
    # Core-serial view by default: the 'XLA Ops' line is the TensorCore's own
    # execution timeline (sums to wall-clock step time); 'Async XLA Ops' is
    # DMA-in-flight occupancy, which overlaps compute and would double-count.
    line_filter = os.environ.get("MDT_TRACE_LINES", "XLA Ops").split(",")
    for line_name, events in dev["lines"]:
        if line_filter != ["all"] and line_name not in line_filter:
            continue
        for mid, dur in events:
            nm = dev["event_meta"].get(mid, "")
            if not nm.startswith("%"):
                continue  # step markers / jit totals
            instr = nm.split(" = ")[0].lstrip("%").strip()
            tag = meta.get(instr)
            ms = dur / 1e9
            if tag is None:
                unmatched_ms += ms
                kind = instr.split(".")[0]
                bucket = (f"dma_{kind}" if kind in
                          ("slice-start", "slice-done", "copy-start",
                           "copy-done", "copy") else "unmatched")
            else:
                bucket = classify(tag)
            totals[bucket] = totals.get(bucket, 0.0) + ms
            if bucket not in examples or ms > examples[bucket][0]:
                examples[bucket] = (ms, instr, (tag or "")[:90])

    per_step = {k: v / n_steps for k, v in totals.items()}
    total = sum(per_step.values())
    print(f"\nper-step device OP-OCCUPANCY over {n_steps} steps "
          f"(total {total:.1f} ms; async DMA overlaps compute, so the sum "
          f"EXCEEDS wall-clock step time - compare buckets, not absolutes):")
    for k, v in sorted(per_step.items(), key=lambda kv: -kv[1]):
        ex = examples.get(k, (0, "", ""))
        print(f"  {v:8.2f} ms  {k:<12} (largest: {ex[0]/n_steps:6.2f} ms "
              f"{ex[1][:40]}  {ex[2][:60]})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
