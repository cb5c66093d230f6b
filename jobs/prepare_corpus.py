"""spark-submit job: prepare a training corpus from a documents table.

    spark-submit --py-files kgpipe.zip jobs/prepare_corpus.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/corpus --budget 2048

Runs quality gate -> exact dedup -> MinHash near-dedup -> deterministic
sample -> sequence packing -> bin_group-partitioned parquet, and prints
ONE JSON line of per-stage stats (the data-card numbers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--out", default=None, help="output parquet dir")
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--sample-nibbles", default="01234567")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()

    from logset_spark.corpus import prepare_corpus
    from logset_spark.session import get_spark

    spark = get_spark("prepare_corpus", cpus=args.cpus)
    docs = spark.read.parquet(args.input)
    _packed, stats = prepare_corpus(
        docs,
        out_path=args.out,
        budget=args.budget,
        near_dup_threshold=args.near_dup_threshold,
        sample_nibbles=args.sample_nibbles,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
