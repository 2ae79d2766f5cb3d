#!/usr/bin/env python
"""Summarize BENCH/scaling_r4 standalone samples: min-of-K per leg,
matched-heap efficiency, all raw samples listed (the VERDICT r3 item-1
protocol: nothing hidden, min over interleaved repeats)."""
from __future__ import annotations

import glob
import json
import os
import sys

D = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_r4"


def leg(cores: int) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(D, f"standalone80_8g_c{cores}_s*.json"))):
        with open(p) as f:
            r = json.load(f)
        r["_file"] = os.path.basename(p)
        out.append(r)
    return out


n, f4 = leg(8), leg(32)
if not n or not f4:
    print(json.dumps({"error": "samples missing", "c8": len(n), "c32": len(f4)}))
    sys.exit(1)
best_n = min(n, key=lambda r: r["seconds"])
best_4n = min(f4, key=lambda r: r["seconds"])
eff = (best_n["seconds"] / best_4n["seconds"]) / 4
print(
    json.dumps(
        {
            "mode": "standalone 1-vs-4 executors, matched 8g heaps, interleaved min-of-K",
            "round_pops": best_n["urls_scheduled_fetched"],
            "N_samples_s": [r["seconds"] for r in n],
            "4N_samples_s": [r["seconds"] for r in f4],
            "N_min_s": best_n["seconds"],
            "4N_min_s": best_4n["seconds"],
            "4N_urls_per_sec": best_4n["urls_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "met": eff >= 0.8,
        },
        indent=2,
    )
)
