#!/usr/bin/env python3
"""Cold-total growth audit (round-15 verdict ask #6).

Splits the full-board COLD total's round-over-round growth into its
three causes — board growth (new rows), relocated cost (work moved
into a different query's cold, e.g. the write-once clusters-table
build landing in d6's first run), and host noise — by comparing
per-query cold times across committed full-board artifacts.

Usage: python3 scripts/cold_audit.py OLD.json NEW.json [top_n]
Reads each artifact's queries{name: {cold, warm}} map.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    return {k: v for k, v in d["queries"].items()
            if isinstance(v, dict) and "cold" in v}


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old, new = load(old_p), load(new_p)
    new_rows = sorted(set(new) - set(old))
    gone_rows = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))
    old_total = sum(v["cold"] for v in old.values())
    new_total = sum(v["cold"] for v in new.values())
    new_row_cost = sum(new[q]["cold"] for q in new_rows)
    shared_delta = sum(new[q]["cold"] - old[q]["cold"] for q in shared)
    print(f"cold totals: {old_p} {old_total:.1f}s ({len(old)} q) -> "
          f"{new_p} {new_total:.1f}s ({len(new)} q)")
    print(f"  board growth (new rows {new_rows}): +{new_row_cost:.1f}s")
    if gone_rows:
        gone_cost = sum(old[q]["cold"] for q in gone_rows)
        print(f"  removed rows {gone_rows}: -{gone_cost:.1f}s")
    print(f"  shared-row delta: {shared_delta:+.1f}s")
    movers = sorted(shared, key=lambda q: abs(new[q]["cold"] - old[q]["cold"]),
                    reverse=True)[:top_n]
    print(f"  top {top_n} shared-row movers (cold old -> new, delta):")
    for q in movers:
        o, n = old[q]["cold"], new[q]["cold"]
        print(f"    {q:32s} {o:7.2f} -> {n:7.2f}  {n - o:+7.2f}")
    print(f"  top {top_n} cold queries in {new_p}:")
    for q in sorted(new, key=lambda q: new[q]["cold"], reverse=True)[:top_n]:
        print(f"    {q:32s} {new[q]['cold']:7.2f} "
              f"(warm {new[q].get('warm', float('nan')):6.2f})")


if __name__ == "__main__":
    main()
