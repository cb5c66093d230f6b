"""Phase-level profiling of the materialize path (dev tool).

spark-submit --master local[N] --driver-memory 48g --py-files pkg.zip \
    scripts/profile_materialize.py --input <transcripts> --cpus N

Times, separately: structural extraction (noop sink), dedup shuffle
(noop), layout repartition+sort+partitioned parquet write.  Prints one
JSON line."""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--out", default="/tmp/profmat")
    p.add_argument("--dict", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from logset_spark.operators import extract, materialize
    from logset_spark.session import get_spark
    from logset_spark.sources.tableio import TableIO

    spark = get_spark("profile_materialize", cpus=args.cpus)
    t: dict[str, float] = {}

    tr = spark.read.parquet(args.input)

    t0 = time.monotonic()
    structural = extract.structural_triples(tr)
    structural.write.format("noop").mode("overwrite").save()
    t["extract_noop"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    deduped = materialize.dedup_triples(structural)
    deduped.write.format("noop").mode("overwrite").save()
    t["extract_dedup_noop"] = round(time.monotonic() - t0, 2)

    io = TableIO(args.out, n_buckets=16)
    shutil.rmtree(args.out, ignore_errors=True)
    t0 = time.monotonic()
    io.write(materialize.dedup_triples(structural), "triples")
    t["extract_dedup_write"] = round(time.monotonic() - t0, 2)

    if args.dict:
        from logset_spark.operators import link as L

        dictionary = spark.read.parquet(args.dict)
        surfaces = {r["surface"] for r in dictionary.select("surface").distinct().collect()}
        det = extract.make_mention_detector(spark, surfaces, include_unknown=True)
        cand = extract.mentions(tr, det)

        t0 = time.monotonic()
        linked = L.link_mentions(spark, cand, dictionary, 0.55).persist()
        linked.count()
        t["link_persist_count"] = round(time.monotonic() - t0, 2)

        mention_tri = extract.mention_triples(linked)
        t0 = time.monotonic()
        mention_tri.write.format("noop").mode("overwrite").save()
        t["mention_tri_noop_from_cache"] = round(time.monotonic() - t0, 2)

        shutil.rmtree(args.out, ignore_errors=True)
        t0 = time.monotonic()
        full = structural.unionByName(mention_tri)
        io.write(materialize.dedup_triples(full), "triples")
        t["union_dedup_write"] = round(time.monotonic() - t0, 2)

    print(json.dumps({"cpus": args.cpus, "phases": t}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
