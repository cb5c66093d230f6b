"""Print the next driver-window rotation (VERDICT r03 item 1 workflow).

Reads every CORRECTNESS_r*.json beside the repo root, diffs against the
live REGISTRY ordering, and prints:

  - the backlog (never driver-checked), in current registry order;
  - any entry whose NEWEST driver row is non-green (needs a re-row);
  - a ready-to-paste window list (refreshes first, then backlog) capped
    at the driver's 50-slot gate.

Round-5 usage: replace `_R4_WINDOW` in logset_spark/queries.py with the
printed list (rename appropriately) and re-run scripts/check_queries.py
on it before committing.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from logset_spark.queries import REGISTRY

    newest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            for name, row in json.load(f).items():
                if name not in newest or rnd > newest[name][0]:
                    newest[name] = (rnd, row)

    names = list(REGISTRY)
    backlog = [n for n in names if n not in newest]

    def green(row: dict) -> bool:
        ok = row.get("rows_match") and row.get("schema_match") \
            and row.get("hash_match")
        rows_only = row.get("err") == "no_oracle" and row.get(
            "spark_rows") is not None
        return bool(ok or rows_only)

    stale = [n for n, (rnd, row) in sorted(newest.items())
             if not green(row)]

    print(f"registry: {len(names)}  driver-checked: {len(newest)}  "
          f"backlog: {len(backlog)}  non-green newest rows: {len(stale)}")
    if stale:
        print("\nneeds a re-row (newest driver record non-green):")
        for n in stale:
            rnd, row = newest[n]
            print(f"  {n} (r{rnd:02d}: err={str(row.get('err'))[:40]!r})")
    window = stale + [n for n in backlog if n not in stale]
    print(f"\nwindow ({min(len(window), WINDOW)} of driver's {WINDOW} slots):")
    for n in window[:WINDOW]:
        print(f'    "{n}": ({n}, SQL_{n[2:].upper()}),  # check SQL name')
    leftover = window[WINDOW:]
    print(f"\nleftover after this rotation: {len(leftover)}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # piped into head: fine
        sys.exit(0)
