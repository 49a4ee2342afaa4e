"""Summarize tune_results.jsonl: best config per stage + schedule-weighted img/s."""

import json
import os
import sys

STEPS = {"res256_mask75": 250_000, "res256_mask0": 30_000,
         "res512_mask75": 50_000, "res512_mask0": 55_000}
FWD_GFLOPS = {"res256_mask75": 96.07, "res256_mask0": 241.44,
              "res512_mask75": 340.19, "res512_mask0": 883.03}
PEAK_TFLOPS = 197.0


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tune_results.jsonl")
    best = {}
    rows = []
    for line in open(path):
        r = json.loads(line)
        rows.append(r)
        if r.get("kind") in ("train_step", "inner") and "img_per_sec" in r:
            s = r["stage"]
            if s not in best or r["img_per_sec"] > best[s]["img_per_sec"]:
                best[s] = r
    print(f"{'stage':<16} {'best img/s':>10} {'MFU':>6}  config")
    for s in STEPS:
        r = best.get(s)
        if not r:
            print(f"{s:<16} {'—':>10}")
            continue
        mfu = 3 * FWD_GFLOPS[s] * r["img_per_sec"] / (PEAK_TFLOPS * 1e3)
        cfg = (f"remat={r['remat']} mb={r['mb']} accum={r.get('accum',1)} "
               f"nu={r.get('nu','?')} moe={r.get('moe','?')}"
               f"{' ema' if r.get('ema') else ''}"
               f"{' acc=' + r['accum_dtype'] if r.get('accum_dtype') else ''}"
               f"{' flow=' + r['flow'] if r.get('flow') else ''}")
        print(f"{s:<16} {r['img_per_sec']:>10.1f} {mfu:>6.1%}  {cfg}")
    if all(s in best for s in STEPS):
        imgs = sum(STEPS[s] * 2048 for s in STEPS)
        t = sum(STEPS[s] * 2048 / best[s]["img_per_sec"] for s in STEPS)
        print(f"\nschedule-weighted: {imgs / t:.2f} img/s/chip "
              f"(vs round-1 64.71, baseline 439/H100)")
    errs = [r for r in rows if r.get("kind") == "error"]
    print(f"\n{len(errs)} failed configs (remote-compile 500s / OOM)")


if __name__ == "__main__":
    main()
