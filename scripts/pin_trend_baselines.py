#!/usr/bin/env python
"""Pin per-query baselines for HEADLINE entries that have none —
the r12 close of the bench blind spot (verdict r11 #2): entries
added since r8 were 'tracked for trend' only, so the over_1_3x
regression gate could not see them (two untracked 3x movements in
r10->r11 went unflagged).

Protocol (same as the r8 re-pin recorded in BASELINE_LOCAL.json):
two back-to-back bench.py sessions on an otherwise idle host; the
pinned value is the per-query MEAN of the two sessions' best-of-3
times. Existing pins are NOT touched (the standing no-re-pin rule);
only previously-unpinned HEADLINE entries gain a value.

Usage:
    python scripts/pin_trend_baselines.py s1.json s2.json [s3.json]

The optional third session adjudicates entries where the first two
sessions disagree by >1.3x and >0.2s (host noise on ~1s queries):
such an entry pins at the mean of its two CLOSEST readings across
the three sessions. Without a third session, diverged entries are
left unpinned (exit 2) — probe before pinning.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BASELINE = os.path.join(REPO, "BASELINE_LOCAL.json")


def main() -> int:
    sessions = []
    for path in sys.argv[1:4]:
        with open(path) as fh:
            sessions.append(json.loads(fh.read().splitlines()[0]))
    from bench import HEADLINE

    with open(BASELINE) as fh:
        base = json.load(fh)
    pinned = base["queries"]

    added = {}
    diverged = {}
    for q in HEADLINE:
        if q in pinned:
            continue
        vals = [s["queries"].get(q) for s in sessions]
        if any(v is None for v in vals):
            print(f"SKIP {q}: missing from a session", file=sys.stderr)
            continue
        a, b = vals[0], vals[1]
        # the two sessions must agree before a value becomes a gate:
        # >1.3x divergence between back-to-back runs means the host
        # was not idle or the query is cold-start-dominated — probe
        # before pinning (the r11 contaminated-session lesson)
        if max(a, b) / max(min(a, b), 1e-9) > 1.3 and abs(a - b) > 0.2:
            if len(vals) == 3:
                # third session adjudicates: mean of the two closest
                pairs = [(abs(x - y), x, y) for i, x in enumerate(vals)
                         for y in vals[i + 1:]]
                _, x, y = min(pairs)
                added[q] = round((x + y) / 2, 3)
                print(f"adjudicated {q}: {vals} -> {added[q]}")
            else:
                diverged[q] = (a, b)
            continue
        added[q] = round((a + b) / 2, 3)

    pinned.update(added)
    history = base.setdefault("history", {})
    key = "trend_pin"
    while key in history:  # never overwrite an earlier study's record
        key += "_next"
    history[key] = {
        "pinned_from": (
            f"{len(sessions)}-session study (back-to-back "
            "bench.py, idle host; protocol of the r12 study)"
        ),
        "sessions": [s["value"] for s in sessions],
        "added": sorted(added),
    }
    with open(BASELINE, "w") as fh:
        json.dump(base, fh, indent=1)
        fh.write("\n")
    print(f"pinned {len(added)} new entries; {len(pinned)} total")
    for q, (a, b) in diverged.items():
        print(f"DIVERGED (not pinned, probe first): {q}: {a} vs {b}")
    return 0 if not diverged else 2


if __name__ == "__main__":
    raise SystemExit(main())
