#!/usr/bin/env python3
"""Redact LEAKCHECK.json in place before committing it.

The scanner's own committed artifact is the echo chain: every round
commits LEAKCHECK.json verbatim, its recorded hit strings re-enter
`git log -p`, and next round's scan re-finds them — n_hits grew
230 -> 270 across rounds with ZERO live hits (every entry is a
`GITLOG:` echo of an earlier artifact). The chain can only decay if
the committed file contains no quotable token strings.

This script replaces each hit string with a stable fingerprint record:
  {"sha256_12": <12-hex digest>, "gitlog_echo": true/false}
and adds per-category counts plus an adjudication pointer. Digests
let rounds correlate hits across artifacts without re-quoting the
text that the scanner would re-find. Run after the driver writes
LEAKCHECK.json, before committing:

    python3 scripts/redact_leakcheck.py [LEAKCHECK.json]
"""
import hashlib
import json
import sys


def redact(path: str) -> None:
    with open(path) as f:
        d = json.load(f)
    if d.get("redacted"):
        print(f"{path}: already redacted")
        return
    hits = d.get("hits", {})
    out = {}
    for cat, lst in hits.items():
        # Hits are normally strings; coerce anything structured so a
        # scanner format change can't crash the absorption script.
        strs = [h if isinstance(h, str) else json.dumps(h, sort_keys=True)
                for h in lst]
        fps = []
        for h in strs:
            echo = h.startswith("GITLOG:")
            rec = {
                "sha256_12": hashlib.sha256(h.encode()).hexdigest()[:12],
                "gitlog_echo": echo,
            }
            if not echo:
                # Keep a masked preview for live hits so adjudication
                # stays auditable from the artifact alone without
                # re-quoting a token the next scan would re-find.
                # PREFIX only: hits commonly END in the flagged token,
                # so a kept suffix would re-commit the token's tail
                # (and fully re-quote tokens of <= 4 chars).
                rec["preview"] = (h[:4] + "…") if len(h) > 12 else "…"
            fps.append(rec)
        out[cat] = {
            "n": len(strs),
            "n_live": sum(1 for f in fps if not f["gitlog_echo"]),
            "fingerprints": fps,
        }
    d["hits"] = out
    d["redacted"] = True
    d["adjudication"] = (
        "hit strings redacted to sha256 fingerprints so the committed "
        "artifact cannot re-enter git log and echo into later scans; "
        "live (non-GITLOG) hits are adjudicated in COVERAGE.md §2.2 "
        "(the standing robots-UA-list finding: public crawler UA tokens "
        "only)"
    )
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
        f.write("\n")
    total = sum(c["n"] for c in out.values())
    live = sum(c["n_live"] for c in out.values())
    print(f"{path}: redacted {total} hits ({live} live, "
          f"{total - live} gitlog echoes)")


if __name__ == "__main__":
    redact(sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK.json")
