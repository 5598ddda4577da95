#!/usr/bin/env python
"""Refresh query_manifest.json — the per-query source-hash manifest
that machine-enforces the window rotation policy's one manual rule:
a query whose implementation or oracle changed must re-enter the
driver correctness window before its hash can be refreshed.

Rules (the enforcement lives in the REFUSAL, not the test alone):
- new registrations are added freely (their driver coverage is
  guarded separately by unchecked_queries_outside_window);
- hashes are refreshed ONLY for names inside the current 50-slot
  driver window — i.e. names whose next driver row will reflect the
  changed code;
- a changed hash OUTSIDE the window is refused loudly: restage the
  name into _DRIVER_WINDOW_FIRST first, then rerun this script;
- names no longer registered are dropped (replaced queries).

tests/test_config.py::test_changed_queries_must_enter_driver_window
fails the suite whenever the working tree violates the same rule, so
forgetting to run this script cannot slip a silent change through.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo2pq_spark.queries.registry import (  # noqa: E402
    load_all,
    query_source_hashes,
)

MANIFEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "query_manifest.json",
)


def main() -> int:
    names = list(load_all())
    window = set(names[:50])
    current = query_source_hashes()
    try:
        with open(MANIFEST) as fh:
            manifest = json.load(fh)
    except FileNotFoundError:
        manifest = {}

    refused = []
    out = {}
    for name in sorted(current):
        if name not in manifest:
            out[name] = current[name]  # new registration
            print(f"added     {name}")
        elif manifest[name] == current[name]:
            out[name] = manifest[name]
        elif name in window:
            out[name] = current[name]
            print(f"refreshed {name} (in driver window)")
        else:
            out[name] = manifest[name]  # keep stale: test will fail
            refused.append(name)
    dropped = sorted(set(manifest) - set(current))
    for name in dropped:
        print(f"dropped   {name} (no longer registered)")

    with open(MANIFEST, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")

    if refused:
        print(
            "\nREFUSED to refresh hashes for CHANGED queries outside "
            f"the driver window: {refused}\nRestage them into "
            "_DRIVER_WINDOW_FIRST (their next driver row must reflect "
            "the changed code), then rerun.",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
