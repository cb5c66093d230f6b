"""RDF-star / reification operators over the WIDE annotation frame.

Statement-level metadata (who extracted a triple, with what confidence,
from which turn) is first-class in KG construction: the reference keeps
it implicit in rdflib node attributes; at 100 TB the only shape that
survives is columnar.  The engine therefore represents an annotated
statement as one row of

    (subj, pred, obj, a_pred, a_obj)

— the quoted triple never becomes an encoded string term, so every
operator here is plain DataFrame work (joins/groupBys Catalyst can
push into, no parsing in the hot path).  Turtle-star syntax exists only
at the serialization edges (sources/turtle.py {to,from,load,save}
_turtle_star).

Two lowerings connect the wide frame to a plain triple table:

* reify(annotations)   -> standard RDF reification triples: one
  deterministic statement node per distinct (subj, pred, obj) carrying
  rdf:type rdf:Statement + rdf:subject/predicate/object, plus one
  (stmt, a_pred, a_obj) triple per annotation row.  Statement node ids
  are content-addressed (`_:stmt-md5(s\\x1fp\\x1fo)`), so reify is
  idempotent and two partitions annotating the same triple converge on
  the same node without coordination — the property that matters when
  annotation rows arrive from thousands of tasks.
* unreify(triples)     -> the wide frame back: recognizes exactly
  reify's output shape.

Both directions are pure native column expressions + two hash
exchanges; round-trip is a pytest invariant and both are DuckDB-oracle
checkable (md5 agrees across engines).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
RDF_STATEMENT = "rdf:Statement"
RDF_SUBJECT = "rdf:subject"
RDF_PREDICATE = "rdf:predicate"
RDF_OBJECT = "rdf:object"

_SEP = "\x1f"  # cannot occur in data: the Turtle sinks reject control chars


def stmt_node(subj=None, pred=None, obj=None):
    """Content-addressed statement node id for a triple — the \\x1f
    separator makes the concatenation prefix-collision-free.  Defaults
    to the (subj, pred, obj) columns."""
    return F.concat(
        F.lit("_:stmt-"),
        F.md5(F.concat_ws(
            _SEP,
            subj if subj is not None else F.col("subj"),
            pred if pred is not None else F.col("pred"),
            obj if obj is not None else F.col("obj"),
        )),
    )


def reify(annotations: DataFrame) -> DataFrame:
    """Wide annotation frame -> standard reification triples.

    Output: for each DISTINCT annotated triple, the four skeleton
    triples (type/subject/predicate/object), plus one annotation triple
    per input row.  One narrow distinct on the skeleton side; the
    annotation side is a pure projection — no join."""
    node = stmt_node()
    base = annotations.select("subj", "pred", "obj").distinct()
    skeleton = base.select(
        node.alias("n"), F.col("subj"), F.col("pred"), F.col("obj")
    )

    def leg(p: str, o) -> DataFrame:
        return skeleton.select(
            F.col("n").alias("subj"), F.lit(p).alias("pred"),
            o.alias("obj"))

    legs = (
        leg(RDF_TYPE, F.lit(RDF_STATEMENT))
        .unionByName(leg(RDF_SUBJECT, F.col("subj")))
        .unionByName(leg(RDF_PREDICATE, F.col("pred")))
        .unionByName(leg(RDF_OBJECT, F.col("obj")))
    )
    notes = annotations.select(
        node.alias("subj"),
        F.col("a_pred").alias("pred"),
        F.col("a_obj").alias("obj"),
    )
    return legs.unionByName(notes)


_SKELETON_PREDS = (RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT)


def unreify(triples: DataFrame) -> DataFrame:
    """Reification triples -> the wide annotation frame.

    A statement node is any subject carrying all three of
    rdf:subject/predicate/object (rdf:type rdf:Statement is emitted by
    reify but not required here — real-world reification is sloppy);
    every OTHER predicate on that node (type excluded) becomes an
    annotation row.  Plan: one pivot-style groupBy over the skeleton
    legs + one equi-join for the notes — two exchanges on the statement
    node, no matter how many annotations per statement."""
    skel = (
        triples.where(F.col("pred").isin(*_SKELETON_PREDS))
        .groupBy(F.col("subj").alias("n"))
        .agg(
            F.max(F.when(F.col("pred") == RDF_SUBJECT, F.col("obj")))
            .alias("s"),
            F.max(F.when(F.col("pred") == RDF_PREDICATE, F.col("obj")))
            .alias("p"),
            F.max(F.when(F.col("pred") == RDF_OBJECT, F.col("obj")))
            .alias("o"),
        )
        .where(
            F.col("s").isNotNull()
            & F.col("p").isNotNull()
            & F.col("o").isNotNull()
        )
    )
    notes = triples.where(
        ~F.col("pred").isin(*_SKELETON_PREDS)
        & ~(
            (F.col("pred") == RDF_TYPE)
            & (F.col("obj") == RDF_STATEMENT)
        )
    )
    return notes.join(skel, notes["subj"] == skel["n"]).select(
        F.col("s").alias("subj"),
        F.col("p").alias("pred"),
        F.col("o").alias("obj"),
        F.col("pred").alias("a_pred"),
        F.col("obj").alias("a_obj"),
    )


def _rewrite_star_patterns(query: str) -> str:
    """SPARQL-star -> SPARQL via the spec's reification mapping, as a
    purely LOCAL text rewrite on the literal-protected query:

        << s p o >> ap ao .
    becomes
        ?__stmtN <rdf:subject> s . ?__stmtN <rdf:predicate> p .
        ?__stmtN <rdf:object> o . ?__stmtN ap ao .

    When `ap` is a VARIABLE a FILTER excluding the four reification
    predicates is injected alongside — otherwise the variable would
    leak the skeleton rows themselves as annotation matches.  A quoted
    triple anywhere else (object position, nested) survives the rewrite
    and is rejected loudly."""
    from .sparql import _protect_literals, _restore_quoted

    q, lits = _protect_literals(query)
    n = [0]

    # the annotation clause after `>> ` runs to the statement's '.' or
    # the group's '}' and may be a full predicate-object list
    # (`ap ao ; ap2 ao2 , ao3`) — literals and <iri>s are protected, so
    # '.', ';' and ',' inside them are inert and the clause can never
    # contain a stray '.'
    # the clause must START with a non-space term — a bare object-
    # position `... << s p o >> .` (no annotation clause at all) must
    # NOT match here; it falls through to the loud rejection below
    pat = re.compile(
        r"<<\s*(\S+)\s+(\S+)\s+(\S+)\s*>>\s*([^\s.{}][^.{}]*?)\s*(?=\.|\})")

    def sub(m: "re.Match[str]") -> str:
        n[0] += 1
        v = f"?__stmt{n[0]}"
        s, p, o, clause = m.groups()
        pats = [
            f"{v} <{RDF_SUBJECT}> {s}",
            f"{v} <{RDF_PREDICATE}> {p}",
            f"{v} <{RDF_OBJECT}> {o}",
        ]
        filters = []
        for seg in clause.split(";"):
            seg = seg.strip()
            if not seg:
                continue  # trailing ';'
            toks = seg.split()
            if len(toks) < 2:
                raise ValueError(
                    f"malformed annotation clause after quoted triple: "
                    f"{seg!r} (need `pred obj`)")
            ap = toks[0]
            for ao in " ".join(toks[1:]).split(","):
                ao = ao.strip()
                if not ao or len(ao.split()) != 1:
                    raise ValueError(
                        f"malformed object list in annotation clause: "
                        f"{seg!r}")
                pats.append(f"{v} {ap} {ao}")
            if ap.startswith("?"):
                filters.append(" && ".join(
                    f"{ap} != <{x}>"
                    for x in (RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT,
                              RDF_TYPE)))
        if len(pats) == 3:  # clause held no annotation pair at all
            raise ValueError(
                "quoted-triple pattern without an annotation clause "
                "(only subject-position `<< s p o >> pred obj .` "
                "patterns are rewritable)")
        out = " . ".join(pats) + " "
        for f_ in filters:
            out += f". FILTER ({f_}) "
        return out

    q = pat.sub(sub, q)
    if "<<" in q or ">>" in q:
        raise ValueError(
            "unsupported quoted-triple form (only subject-position "
            "`<< s p o >> pred obj .` patterns are rewritable)")
    return _restore_quoted(q, lits)


def sparql_star(triples: DataFrame, annotations: DataFrame, query: str,
                **kwargs) -> DataFrame:
    """SPARQL-star over (asserted triples, wide annotations): quoted
    triple patterns are rewritten to the standard reification mapping
    (_rewrite_star_patterns) and evaluated by the plain SPARQL compiler
    over triples UNION reify(annotations).  The reified frame is
    columnar and per-predicate prunable, so a constant-annotation
    pattern (`<< ?s ?p ?o >> kg:confidence ?c`) scans only the
    kg:confidence slice plus three skeleton slices — the same
    vertical-pruning story as every other BGP."""
    from .sparql import sparql

    data = triples.select("subj", "pred", "obj").unionByName(
        reify(annotations))
    return sparql(data, _rewrite_star_patterns(query), **kwargs)


def annotate_confidence(
    triples: DataFrame,
    *,
    score_col: str = "score",
    source_col: str | None = None,
    conf_pred: str = "kg:confidence",
    source_pred: str = "kg:derivedFrom",
    decimals: int = 4,
) -> DataFrame:
    """Triples carrying a per-row extraction score (the linker's
    `score` column) -> wide annotation rows: one kg:confidence per
    triple (score rounded to a stable lexical form so serialization is
    deterministic), plus one kg:derivedFrom row when `source_col` is
    given (provenance: the turn/conv URI the triple came from).  Null
    scores (unlinked mentions) produce no row — absence of confidence
    IS the signal."""
    cols = triples.columns
    for c in (score_col,) + ((source_col,) if source_col else ()):
        if c not in cols:
            raise ValueError(f"column {c!r} not in {cols}")
    conf = (
        triples.where(F.col(score_col).isNotNull())
        .select(
            "subj", "pred", "obj",
            F.lit(conf_pred).alias("a_pred"),
            # format_string, NOT format_number: the latter inserts
            # thousands-separator commas ('1,234.5000') — a lexical
            # form numeric casts and cross-engine comparisons reject
            F.format_string(f"%.{decimals}f",
                            F.col(score_col).cast("double"))
            .alias("a_obj"),
        )
    )
    if not source_col:
        return conf
    src = (
        triples.where(F.col(source_col).isNotNull())
        .select(
            "subj", "pred", "obj",
            F.lit(source_pred).alias("a_pred"),
            F.col(source_col).cast("string").alias("a_obj"),
        )
    )
    return conf.unionByName(src)


def graph_star_annotations(graph: DataFrame) -> DataFrame:
    """The materialized KG triple table (vocab.TRIPLE_COLS: subj, pred,
    obj + conv_id/turn_idx/ts/conf provenance columns) -> its wide
    annotation frame: kg:confidence for every linked row (conf non-null)
    and kg:derivedFrom pointing at the originating turn URI for every
    row.  Pure projection — the provenance columns the pipeline already
    threads through every stage ARE the statement metadata, so star
    export costs one column-pruned scan, no joins."""
    from .. import vocab as V

    with_src = graph.withColumn(
        "_src", V.turn_uri("conv_id", "turn_idx"))
    return annotate_confidence(
        with_src, score_col="conf", source_col="_src")
