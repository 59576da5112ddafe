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


def stale_generations(root: str) -> list[str]:
    """Group sibling directories by spec prefix (name minus the
    trailing source-fingerprint segment); everything but the most
    recently modified generation of each group is stale."""
    groups: dict[str, list[str]] = {}
    if not os.path.isdir(root):
        return []
    for d in sorted(os.listdir(root)):
        if os.path.isdir(os.path.join(root, d)) and "_" in d:
            groups.setdefault(d.rsplit("_", 1)[0], []).append(d)
    stale: list[str] = []
    for sibs in groups.values():
        if len(sibs) > 1:
            keep = max(sibs, key=lambda d: os.stat(os.path.join(root, d)).st_mtime)
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
