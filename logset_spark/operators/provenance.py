"""PROV-O provenance quads over the warehouse control tables.

LogSet is a metadata catalog: its graphs DESCRIBE data artifacts
(ConcreteLog describedBy, LogSeries validity) at least as much as they
hold data.  This engine's build pipeline already records that metadata
relationally — per-run lineage rows and the per-partition stage
manifest — so this module recasts those control tables as PROV-O-shaped
quads and the knowledge graph becomes self-describing: the same SPARQL
surface that answers "which tools did conv X use" also answers "which
run generated partition (day, bucket), with how many rows, when".

Vocabulary (prefixed strings, like every URI in this engine):

    run:<run_id>            rdf:type prov:Activity
                            prov:startedAtTime / prov:endedAtTime (ISO)
                            logset:rowsIn / logset:triplesOut (counts)
                            prov:generated table:triples
    part:<day>/<bucket>     rdf:type prov:Entity
                            prov:wasGeneratedBy run:<run_id>
                            partOf table:triples
                            logset:tsDay / logset:convBucket

Each run's quads live in the named graph `prov:run/<run_id>`, so
`GRAPH ?g { ... }` isolates one run's provenance and a constant graph
term prunes to it.  Everything derives from the control tables, which
are metadata-scale (rows bounded by runs x partitions, never by data) —
but the derivation is still a DataFrame plan, so a warehouse with a
million recorded partitions costs a million-row transform, not a
driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materialize import LINEAGE, MANIFEST

QUAD_COLS = ("graph", "subj", "pred", "obj")


def _quad(graph: F.Column, subj: F.Column, pred: str, obj) -> list:
    if not isinstance(obj, F.Column):
        obj = F.lit(obj)
    return [
        graph.alias("graph"), subj.alias("subj"),
        F.lit(pred).alias("pred"), obj.alias("obj"),
    ]


def provenance_quads(spark: SparkSession, io) -> DataFrame:
    """Derive (graph, subj, pred, obj) provenance quads from the
    warehouse's lineage + manifest tables (io: TableIO-shaped)."""
    lin = io.read(spark, LINEAGE).where(F.col("stage") == "build_graph")
    run_u = F.concat(F.lit("run:"), F.col("run_id"))
    g = F.concat(F.lit("prov:run/"), F.col("run_id"))
    iso = "yyyy-MM-dd'T'HH:mm:ss"
    started = F.date_format(
        F.timestamp_millis(F.col("wall_clock_ms") - F.col("wall_ms")), iso
    )
    ended = F.date_format(F.timestamp_millis(F.col("wall_clock_ms")), iso)
    run_parts = [
        lin.select(_quad(g, run_u, "rdf:type", "prov:Activity")),
        lin.select(_quad(g, run_u, "prov:startedAtTime", started)),
        lin.select(_quad(g, run_u, "prov:endedAtTime", ended)),
        lin.select(_quad(g, run_u, "logset:rowsIn",
                         F.col("rows_in").cast("string"))),
        lin.select(_quad(g, run_u, "logset:triplesOut",
                         F.col("rows_out").cast("string"))),
        lin.select(_quad(g, run_u, "prov:generated", "table:triples")),
    ]

    man = io.read(spark, MANIFEST).where(
        (F.col("stage") == "materialize")
        & (F.col("status") == "done")
        & F.col("ts_day").isNotNull()
    ).select(
        "run_id",
        F.col("ts_day").cast("string").alias("day"),
        F.col("conv_bucket").cast("string").alias("bucket"),
    ).distinct()
    part_u = F.concat(F.lit("part:"), F.col("day"), F.lit("/"),
                      F.col("bucket"))
    gm = F.concat(F.lit("prov:run/"), F.col("run_id"))
    part_parts = [
        man.select(_quad(gm, part_u, "rdf:type", "prov:Entity")),
        man.select(_quad(gm, part_u, "prov:wasGeneratedBy",
                         F.concat(F.lit("run:"), F.col("run_id")))),
        man.select(_quad(gm, part_u, "partOf", "table:triples")),
        man.select(_quad(gm, part_u, "logset:tsDay", F.col("day"))),
        man.select(_quad(gm, part_u, "logset:convBucket",
                         F.col("bucket"))),
    ]
    out = run_parts[0]
    for p in run_parts[1:] + part_parts:
        out = out.unionByName(p)
    return out.distinct()


def with_provenance(triples: DataFrame, prov: DataFrame,
                    data_graph: str = "kg:data") -> DataFrame:
    """Union the data triples (as the named graph `data_graph`) with
    provenance quads into one quads frame the SPARQL GRAPH clause can
    dispatch over.  Non-GRAPH patterns keep matching everything (the
    union default graph), so existing queries run unchanged."""
    return (
        triples.select("subj", "pred", "obj")
        .withColumn("graph", F.lit(data_graph))
        .select(*QUAD_COLS)
        .unionByName(prov.select(*QUAD_COLS))
    )
