"""Generation-keyed /tmp staging for queries that materialize a
data generation (tar shards, count stores, span sidecars) and read it
back within the same call.

A FIXED path shared across scale factors / concurrent sessions is the
hazard class behind the r14 cache-registry bug (a plan-keyed cache
served a stale generation) and the r14-verdict's concurrent
bench-vs-oracle collision note: two sessions interleaving write/read
on one directory can read a mixed generation — and the tarshards
committer even DELETES shards absent from its own manifest, so for
tar generations the interleave is destructive, not just stale.

Keying by (source path, mtime) makes each (scale factor, data
generation) pair a distinct directory, so plans and readers can never
cross generations; reruns over the SAME unchanged source reuse the
dir instead of accreting /tmp entries per bench repeat (the reason
these queries never used mkdtemp).
"""

from __future__ import annotations


def generation_tmp_dir(
    sf_dir: str, tag: str, table: str = "documents"
) -> str:
    """Staging dir for a query-local data generation under ``tag``,
    keyed by the source table's absolute path + mtime (md5, 12 hex
    chars). Distinct scale factors, distinct tags, and regenerated
    sources (new mtime) all map to distinct directories; an unchanged
    source is stable across calls."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, f"{table}.parquet")
    # a parquet source may be a single file OR a directory of parts
    # (both shapes have shipped in the testdata); for a directory the
    # DIR mtime can survive an in-place part rewrite, so fold the
    # entries' mtimes in too — the streaming staging helpers' rule
    mtimes = [os.path.getmtime(src)]
    if os.path.isdir(src):
        mtimes += [
            os.path.getmtime(os.path.join(src, f))
            for f in os.listdir(src)
        ]
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{max(mtimes)}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"m2pq_{tag}_{key}")
