"""Dev profiling: isolate the link_exact anti-scaling (local[8] vs local[32]).

spark-submit --master local[N] --driver-memory 48g --py-files pkg.zip \
    scripts/profile_link.py --input T --dict D --cpus N --mode <m>

Modes: detect (UDF+explode noop), join (detect+broadcast join, noop),
persist (join + persist + count), full (link_mentions as the pipeline runs).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--dict", dest="dict_path", required=True)
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--mode", default="detect")
    args = p.parse_args()

    from logset_spark.operators import extract, link
    from logset_spark.session import get_spark

    spark = get_spark("profile_link", cpus=args.cpus)
    tr = spark.read.parquet(args.input)
    dictionary = spark.read.parquet(args.dict_path)
    surfaces = {r["surface"] for r in dictionary.select("surface").distinct().collect()}
    det = extract.make_mention_detector(spark, surfaces, include_unknown=True)

    t: dict[str, float] = {}
    t0 = time.monotonic()
    cand = extract.mentions(tr, det)
    if args.mode == "detect":
        cand.write.format("noop").mode("overwrite").save()
        t["cold"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        cand.write.format("noop").mode("overwrite").save()
        t["warm"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
    elif args.mode == "join":
        link.exact_link(cand, dictionary).write.format("noop").mode("overwrite").save()
    elif args.mode == "persist":
        ex = link.exact_link(cand, dictionary).persist()
        ex.count()
    elif args.mode == "full":
        linked = link.link_mentions(spark, cand, dictionary, 0.55, timings=t)
        linked = linked.persist()
        linked.count()
    elif args.mode in ("structural_noop", "mention_noop", "stage1_noop", "stage1_write"):
        from logset_spark import pipeline
        from logset_spark.operators import extract as E
        from logset_spark.sources.tableio import TableIO

        if args.mode == "structural_noop":
            df = E.structural_triples(tr)
        elif args.mode == "mention_noop":
            df = link.exact_link(cand, dictionary, keep_norm=True)
        else:
            df = pipeline._stage1_triples(tr, dictionary, det)
        if args.mode == "stage1_write":
            import shutil
            shutil.rmtree("/tmp/prof_stage1", ignore_errors=True)
            pipeline._write_stage1(TableIO("/tmp/prof_stage1", n_buckets=16), "prof", df)
        else:
            df.write.format("noop").mode("overwrite").save()
    t["wall"] = round(time.monotonic() - t0, 2)
    print(json.dumps({"cpus": args.cpus, "mode": args.mode, "t": t}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
