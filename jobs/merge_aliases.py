"""Incremental alias-merge maintenance — run via spark-submit (the
dictionary-growth twin of build_graph's stage 3):

    zip -r kgpipe.zip logset_spark
    spark-submit --py-files kgpipe.zip jobs/merge_aliases.py \
        --new-aliases /path/alias_drop.parquet \
        --state /path/wh/_alias_state --out /path/wh/sameas

Each invocation folds one drop of NEW dictionary rows
(surface, canon_uri) into the persistent canonicalization assignment via
cc.cc_incremental — cost O(|drop| + |affected components|), never a
recompute over the historical alias graph — and rewrites the full
refreshed sameAs triple set to --out.  Untouched canonical ids are
byte-stable across drops, so downstream tables keyed on them don't
churn; re-submitting the same drop is a no-op.  The state is
epoch-versioned and _SUCCESS-gated (crash mid-write leaves the previous
epoch authoritative), and is always re-derivable by a full
build_graph.py run if lost.

Prints ONE JSON line: drop size, merged assignment size, sameAs rows.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Incremental alias merge")
    p.add_argument("--new-aliases", required=True,
                   help="parquet of NEW dictionary rows "
                        "(surface, canon_uri)")
    p.add_argument("--state", required=True,
                   help="persistent assignment dir (epoch-versioned)")
    p.add_argument("--out", default=None,
                   help="write the refreshed sameAs triples here "
                        "(overwrite); omit to only update the state")
    p.add_argument("--keep-epochs", type=int, default=2)
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from logset_spark.pipeline import (
        _alias_state_latest,
        merge_aliases_incremental,
    )
    from logset_spark.session import get_spark

    spark = get_spark("merge_aliases", cpus=args.cpus)
    drop = spark.read.parquet(args.new_aliases)
    same_as = merge_aliases_incremental(
        spark, drop, args.state, keep_epochs=args.keep_epochs
    ).localCheckpoint(eager=True)
    if args.out:
        same_as.write.mode("overwrite").parquet(args.out)
    version, assignment = _alias_state_latest(spark, args.state)
    print(json.dumps({
        "new_aliases": drop.count(),
        "state_version": version,
        "assignment_rows": assignment.count(),
        "sameas_rows": same_as.count(),
        "out": args.out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
