"""Explicit stale-generation cleanup for the layout warehouse
(ADVICE r11).

The bucketed/partitioned twins are write-once per (table, sf_dir,
layout spec, SOURCE FINGERPRINT): regenerating testdata in place mints
a new fingerprint-named generation and orphans the old one. By default
the writers prune stale same-spec siblings inline, but that deletion
runs on the READ path of a shared directory — with
``SPARK_GRAFT_LAYOUT_GC=0`` the inline GC is disabled and THIS tool is
the cleanup: for every spec prefix under spark-warehouse/{bucketed,
partitioned}, it keeps the most recently written generation and
removes the rest. Run it between workloads, never concurrently with
one.

    python tools/layout_gc.py [--dry-run]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOTS = (
    os.path.join(_REPO, "spark-warehouse", "bucketed"),
    os.path.join(_REPO, "spark-warehouse", "partitioned"),
)


def _sf_dirs_by_tag() -> dict[str, str]:
    """Map the 8-hex sf-dir tag embedded in twin names back to the
    source directory, for every candidate testdata root on this host
    (the driver's /root/testdata SFs, the repo-local .localdata SFs,
    and $SPARK_GRAFT_SF_DIR). The tag is md5(abspath)[:8], so it can
    only be inverted by enumerating candidates."""
    from batch_processing_system_spark.engine.bucketing import _sf_tag

    cands: list[str] = []
    env = os.environ.get("SPARK_GRAFT_SF_DIR")
    if env:
        cands.append(env)
    for root in ("/root/testdata", os.path.join(_REPO, ".localdata")):
        if os.path.isdir(root):
            cands += [os.path.join(root, d) for d in sorted(os.listdir(root))]
    return {_sf_tag(d): d for d in cands if os.path.isdir(d)}


def _current_fingerprint(prefix: str) -> str | None:
    """The source fingerprint the CURRENT testdata would mint for this
    spec prefix (``{kind}_{table}_{sftag}[_...]``), or None when the
    sf dir can't be resolved (e.g. a pytest tmp path long gone)."""
    parts = prefix.split("_")
    if len(parts) < 3:
        return None
    table, tag = parts[1], parts[2]
    sf_dir = _sf_dirs_by_tag().get(tag)
    if sf_dir is None:
        return None
    from batch_processing_system_spark.engine.bucketing import _src_fingerprint

    try:
        fp = _src_fingerprint(sf_dir, table)
    except OSError:
        return None
    # a missing source parquet fingerprints the empty list — treat as
    # unresolvable rather than matching nothing
    return fp if os.path.exists(os.path.join(sf_dir, f"{table}.parquet")) else None


def stale_generations(root: str) -> list[str]:
    """Group sibling directories by spec prefix (name minus the
    trailing source-fingerprint segment). Within each group, keep the
    generation whose trailing fingerprint matches the CURRENT source
    (ADVICE r12: mtime alone keeps the NEWEST directory, which is the
    wrong one when testdata was reverted to an earlier snapshot — the
    live generation would be deleted and every next read forced into a
    full rewrite); fall back to newest-mtime when the source can't be
    resolved. Everything else in the group is stale."""
    groups: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return []
    for d in sorted(os.listdir(root)):
        if os.path.isdir(os.path.join(root, d)) and "_" in d:
            groups.setdefault(d.rsplit("_", 1)[0], []).append(d)
    stale: list[str] = []
    for prefix, sibs in groups.items():
        if len(sibs) > 1:
            fp = _current_fingerprint(prefix)
            live = [d for d in sibs if fp and d.rsplit("_", 1)[1] == fp]
            keep = live[0] if live else max(
                sibs, key=lambda d: os.stat(os.path.join(root, d)).st_mtime
            )
            stale += [d for d in sibs if d != keep]
    return stale


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dry-run", action="store_true",
                    help="list stale generations without deleting")
    args = ap.parse_args()
    n = 0
    for root in ROOTS:
        for d in stale_generations(root):
            n += 1
            if args.dry_run:
                print(f"stale: {os.path.join(root, d)}")
            else:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                print(f"removed: {os.path.join(root, d)}")
    print(f"{n} stale generation(s){' (dry run)' if args.dry_run else ''}")


if __name__ == "__main__":
    main()
