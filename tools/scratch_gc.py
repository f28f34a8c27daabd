"""Scratch-layout garbage collector (round-12, VERDICT r11 #8).

The engine materializes load-time layouts under the repo-local scratch
root (`sources.partitioned._scratch_root()`):

- ``part/<fixture>/orders_by_year``          — partitioned orders copy (j7)
- ``bucketed/<fixture>_b<N>/<table>``        — bucketed+sorted pair /
  q21 lateness pre-agg (j18 / q21_preagg_colocation / q3 / d2 family)

These accumulate across rounds and — worse — a killed writer can leave a
partially written directory behind. Every in-engine consumer already
refuses to re-register an invalid layout (``_SUCCESS`` marker + baked-in
bucket-id validation, `operators/bucketing._bucket_files_match`), but the
stale bytes stay on disk forever and a legacy directory written under an
OLD spec (pre-round-10 paths without the ``_b<N>`` suffix) is dead weight
no current code will ever read.

This tool makes the contract operational: VALIDATE every known layout,
REMOVE anything invalid in the known ``part/`` and ``bucketed/``
families (the ensure_* functions rebuild on next use — removal there is
always safe), and report what it did as one JSON line. Directories
outside the known families are REPORTED, never removed, unless
``--purge-unknown`` is passed (ADVICE r12: a future layout family added
without updating this tool — or anything a user parks under the scratch
root — must not be silently rm -rf'd; only the known families' validity
can actually be checked). Run with ``--dry-run`` to only report.

Run gc only with NO live Spark session attached to this repo: a warm
session that already registered a layout table short-circuits in
ensure_* on ``spark.catalog.tableExists`` and would keep reading the
swept path. The ensure_* functions additionally re-verify the on-disk
``_SUCCESS`` marker before trusting a registered table (round-13), so a
stranded session rebuilds instead of failing — but the sweep itself
still races a concurrent writer, so keep the no-live-session rule.

Usage: python tools/scratch_gc.py [--dry-run] [--purge-unknown] [--root PATH]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BUCKET_TAG = re.compile(r"_b(\d+)$")


def _valid_partitioned(layout: Path) -> bool:
    return (layout / "_SUCCESS").exists()


def _valid_bucketed(layout: Path, num_buckets: int) -> bool:
    from praw_etl_student_dropout_spark.operators.bucketing import (
        _bucket_files_match,
    )

    return (layout / "_SUCCESS").exists() and _bucket_files_match(
        layout, num_buckets
    )


def gc_scratch(
    root: Path | None = None,
    dry_run: bool = False,
    purge_unknown: bool = False,
) -> dict:
    """Validate every layout under ``root`` (default: the engine scratch
    root); remove invalid/legacy entries in the known families. Unknown
    top-level directories are only reported (``unknown`` key) unless
    ``purge_unknown`` — their validity cannot be checked, so removal must
    be an explicit operator decision. Returns ``{"valid": [...],
    "removed": {path: reason}, "unknown": [...], "dry_run": bool}`` with
    paths relative to the root."""
    if root is None:
        from praw_etl_student_dropout_spark.sources.partitioned import (
            _scratch_root,
        )

        root = _scratch_root()
    root = Path(root)
    valid: list[str] = []
    removed: dict[str, str] = {}
    unknown: list[str] = []

    def drop(path: Path, reason: str) -> None:
        removed[str(path.relative_to(root))] = reason
        if not dry_run:
            shutil.rmtree(path, ignore_errors=True)

    if not root.is_dir():
        return {
            "valid": valid,
            "removed": removed,
            "unknown": unknown,
            "dry_run": dry_run,
        }

    for family in sorted(p for p in root.iterdir() if p.is_dir()):
        if family.name == "part":
            for fixture in sorted(p for p in family.iterdir() if p.is_dir()):
                for layout in sorted(p for p in fixture.iterdir() if p.is_dir()):
                    if _valid_partitioned(layout):
                        valid.append(str(layout.relative_to(root)))
                    else:
                        drop(layout, "no _SUCCESS marker (partial write)")
        elif family.name == "bucketed":
            for tagdir in sorted(p for p in family.iterdir() if p.is_dir()):
                m = _BUCKET_TAG.search(tagdir.name)
                if m is None:
                    # pre-round-10 layout without the encoded bucket
                    # count: no current code path re-registers these
                    drop(tagdir, "legacy path without _b<N> bucket spec")
                    continue
                nb = int(m.group(1))
                for layout in sorted(p for p in tagdir.iterdir() if p.is_dir()):
                    if _valid_bucketed(layout, nb):
                        valid.append(str(layout.relative_to(root)))
                    else:
                        drop(
                            layout,
                            f"invalid bucket layout for {nb} buckets "
                            "(partial write or spec drift)",
                        )
        else:
            if purge_unknown:
                drop(family, "unrecognized scratch family (--purge-unknown)")
            else:
                unknown.append(str(family.relative_to(root)))
    return {
        "valid": valid,
        "removed": removed,
        "unknown": unknown,
        "dry_run": dry_run,
    }


def main() -> None:
    dry = "--dry-run" in sys.argv
    purge = "--purge-unknown" in sys.argv
    root = None
    if "--root" in sys.argv:
        root = Path(sys.argv[sys.argv.index("--root") + 1])
    print(json.dumps(gc_scratch(root=root, dry_run=dry, purge_unknown=purge)))


if __name__ == "__main__":
    main()
