#!/usr/bin/env python3
"""Settle the noisy rows of a bench artifact before it becomes a pin.

A noisy-flagged row inside a COMMITTED pin is a contradiction (round-15
verdict item 3): the flag says "this warm time is contaminated, the
retry is the believable probe", so the pin must carry the settled
number, not the contaminated one next to its own correction. For every
row with "noisy": true this substitutes warm := min(warm, retry) — the
same effectiveWarm rule Bench and every gate already apply at read
time — and drops the retry/noisy markers; `value` is recomputed from
the settled warms. Idempotent; exits 0 either way.

Usage: python3 scripts/settle_noisy.py BENCH_FULL.json [...]
"""
import json
import sys


def settle(path: str) -> None:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", {})
    n = 0
    for k, v in q.items():
        if isinstance(v, dict) and v.get("noisy"):
            r = v.get("retry")
            if not (isinstance(r, (int, float)) and r >= 0):
                # failed retry probe (retry < 0 / missing): the warm
                # is still the contaminated sample — leave the row
                # UNSETTLED so ChainHygieneSpec's zero-noisy gate
                # rejects the artifact instead of laundering it
                continue
            v["warm"] = round(min(v["warm"], r), 3)
            v.pop("retry", None)
            v.pop("noisy", None)
            n += 1
    if n:
        d["value"] = round(sum(v["warm"] for v in q.values()
                               if isinstance(v, dict)
                               and v.get("warm", -1) >= 0), 3)
        with open(path, "w") as f:
            json.dump(d, f, separators=(",", ":"))
            f.write("\n")
    print(f"{path}: settled {n} noisy row(s)")


if __name__ == "__main__":
    for p in sys.argv[1:] or ["BENCH_FULL.json"]:
        settle(p)
