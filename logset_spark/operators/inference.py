"""RDFS forward-chaining inference over the triples DataFrame.

LogSet's catalogs are typed by an RDFS ontology (classes like
ConcreteLog/LogSeries under a class hierarchy, properties with declared
domains/ranges — SURVEY §1.1); rdflib answers "every X, including
subclasses" by in-memory entailment.  At 10^12 triples the same
entailment is a handful of joins against ontology-scale closures — this
module materializes it as a DataFrame plan.

Rules implemented (the RDFS core that changes query answers):

    rdfs5/7   (p subPropertyOf* q), (s p o)        ->  (s q o)
    rdfs2     (p domain c),         (s p o)        ->  (s rdf:type c)
    rdfs3     (p range c),          (s p o)        ->  (o rdf:type c)
    rdfs9/11  (c subClassOf* d),    (x rdf:type c) ->  (x rdf:type d)

Rule composition order makes ONE pass complete: property generalization
first (its output feeds domain/range), then domain/range (their output
feeds the class-hierarchy walk), then type propagation up the closed
subClassOf relation.  The closures themselves ride
graph.transitive_closure (path doubling), so deep hierarchies cost
O(log depth) rounds, and both closures are ONTOLOGY-scale (dozens to
thousands of rows) — they broadcast, so every instance-side rule is a
broadcast join: the 10^12-row side never shuffles.

Documented subset: schema-about-schema entailment (subPropertyOf of
rdf:type, subClassOf of rdfs:Class metacircularity) is out of scope —
the ontology is read once, closed, and applied to instance triples; an
ontology whose schema triples are themselves derived needs a second
pass (compose the operator twice).

Vocabulary terms are the engine's prefixed-string spellings
(`rdf:type`, `rdfs:subClassOf`, `rdfs:subPropertyOf`, `rdfs:domain`,
`rdfs:range`) — the Turtle loader preserves prefixed names verbatim, so
catalogs written against the rdflib namespaces land exactly here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
SUBCLASS = "rdfs:subClassOf"
SUBPROP = "rdfs:subPropertyOf"
DOMAIN = "rdfs:domain"
RANGE = "rdfs:range"

_SCHEMA_PREDS = (SUBCLASS, SUBPROP, DOMAIN, RANGE)


def _closure_reflexive(edges: DataFrame) -> DataFrame:
    """subClassOf*/subPropertyOf* — the transitive closure PLUS the
    identity pair for every mentioned term (RDFS entailment keeps the
    asserted triple: p subPropertyOf* p).  Ontology-scale input."""
    from .graph import transitive_closure

    closed = transitive_closure(edges).select("node", "ancestor")
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    return closed.unionByName(
        nodes.select("node", F.col("node").alias("ancestor"))
    ).distinct()


def rdfs_materialize(triples: DataFrame) -> DataFrame:
    """Asserted + RDFS-entailed triples, DISTINCT (a graph is a set).

    Plan shape: two ontology-scale closures (path doubling over the
    schema slice only), then four broadcast joins against the instance
    scan — the instance side is read once and never shuffled except for
    the final distinct.  Schema triples pass through unchanged."""
    t = triples.select("subj", "pred", "obj")
    schema = t.where(F.col("pred").isin(list(_SCHEMA_PREDS)))

    sub_class = _closure_reflexive(
        schema.where(F.col("pred") == SUBCLASS).select(
            F.col("subj").alias("child"), F.col("obj").alias("parent")
        )
    )
    sub_prop = _closure_reflexive(
        schema.where(F.col("pred") == SUBPROP).select(
            F.col("subj").alias("child"), F.col("obj").alias("parent")
        )
    )

    # rdfs5/7 — generalize predicates up the closed subPropertyOf.
    # The reflexive closure regenerates the asserted triple too, so
    # `generalized` SUPERSEDES the instance slice for the rules below
    # (predicates outside any subPropertyOf chain ride the left join).
    inst = t.where(~F.col("pred").isin(list(_SCHEMA_PREDS)))
    generalized = (
        inst.join(
            F.broadcast(sub_prop.withColumnRenamed("node", "pred")),
            "pred", "left",
        )
        .select(
            "subj",
            F.coalesce("ancestor", "pred").alias("pred"),
            "obj",
        )
    )

    # rdfs2/3 — domain/range typing from every (asserted or
    # property-generalized) triple
    dom = schema.where(F.col("pred") == DOMAIN).select(
        F.col("subj").alias("pred"), F.col("obj").alias("cls")
    )
    rng = schema.where(F.col("pred") == RANGE).select(
        F.col("subj").alias("pred"), F.col("obj").alias("cls")
    )
    typed_dom = generalized.join(F.broadcast(dom), "pred").select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("cls").alias("obj")
    )
    typed_rng = generalized.join(F.broadcast(rng), "pred").select(
        F.col("obj").alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.col("cls").alias("obj"),
    )

    # rdfs9/11 — every type statement (asserted, generalized, or
    # domain/range-derived) walks up the closed subClassOf
    types = (
        generalized.where(F.col("pred") == RDF_TYPE)
        .unionByName(typed_dom)
        .unionByName(typed_rng)
    )
    types_up = types.join(
        F.broadcast(sub_class.withColumnRenamed("node", "obj")), "obj"
    ).select("subj", "pred", F.col("ancestor").alias("obj"))

    return (
        t.unionByName(generalized)
        .unionByName(types)
        .unionByName(types_up)
        .distinct()
    )
