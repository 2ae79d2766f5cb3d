#!/usr/bin/env python
"""Summarize BENCH/scaling_r4 standalone samples: min-of-K per leg,
matched-heap efficiency, all raw samples listed (the VERDICT r3 item-1
protocol: nothing hidden, min over interleaved repeats). The headline
is the PINNED protocol (each worker on a disjoint 8-core set — the
one-box analogue of separate nodes); the unpinned pair and the
img_scale=1 control pair are reported alongside."""
from __future__ import annotations

import glob
import json
import os
import sys

D = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_r4"


def load(pattern: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(D, pattern))):
        with open(p) as f:
            r = json.load(f)
        r["_file"] = os.path.basename(p)
        out.append(r)
    return out


def leg_summary(n: list[dict], f4: list[dict]) -> dict | None:
    if not n or not f4:
        return None
    bn = min(n, key=lambda r: r["seconds"])
    b4 = min(f4, key=lambda r: r["seconds"])
    eff = (bn["seconds"] / b4["seconds"]) / 4
    return {
        "round_pops": bn["urls_scheduled_fetched"],
        "N_samples_s": [r["seconds"] for r in n],
        "4N_samples_s": [r["seconds"] for r in f4],
        "N_min_s": bn["seconds"],
        "4N_min_s": b4["seconds"],
        "4N_urls_per_sec": b4["urls_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


out = {
    "headline_pinned_minof3": leg_summary(
        load("standalone80_8g_pin_c8_s*.json"),
        load("standalone80_8g_pin_c32_s*.json"),
    ),
    "unpinned_pair": leg_summary(
        load("standalone80_8g_c8_s*.json"), load("standalone80_8g_c32_s*.json")
    ),
    "ctrl_scale1_pair": leg_summary(
        load("ctrl_scale1_pin_c8.json"), load("ctrl_scale1_pin_c32.json")
    ),
    "target": 0.8,
}
h = out["headline_pinned_minof3"]
out["met"] = bool(h and h["scaling_efficiency"] >= 0.8)
print(json.dumps(out, indent=2))
