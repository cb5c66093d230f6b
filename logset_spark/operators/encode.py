"""Dictionary-encoded triple storage — the node-table design of native
RDF stores (RDF-3X, Jena TDB, Virtuoso) recast on DataFrames.

The reference holds its graph as rdflib term objects in memory
(PK:src/graph.py — SURVEY §0: pointer unverifiable, reference dir
empty); this engine's string-URI triple table is the honest distributed
equivalent, but at 10^12 triples the URI strings dominate every byte the
engine moves: a turn URI is ~25 bytes where a bigint is 8, and every
join/shuffle/scan pays it.  Term encoding fixes that once:

* `build_term_dictionary` — every distinct term (subj ∪ pred ∪ obj) gets
  a contiguous 1-based bigint id assigned in GLOBAL SORT ORDER via the
  distributed zipWithIndex (operators/ordering.py global_sorted_index —
  two balanced shuffles, never a single-task stage).  Sorted assignment
  buys two things: the ids are DETERMINISTIC (replayable in ANSI SQL as
  row_number() OVER (ORDER BY term) — the q_term_dict oracle), and terms
  sharing a namespace prefix (ent:, turn:, conv:) get CONTIGUOUS id
  ranges, so a predicate or namespace filter on the encoded table is a
  dense integer range scan.
* `encode_triples` — (subj, pred, obj) strings -> (s_id, p_id, o_id)
  bigints: three shuffle joins against the dictionary (the one-time bulk
  cost every native store pays at load).  8-byte fixed-width keys then
  replace ~25-byte strings in every downstream exchange; parquet
  dictionary+delta encoding compresses the sorted id columns far below
  the string columns they replace.
* `decode_triples` — the inverse joins, for serialization boundaries.
* `bgp_encoded` — the BGP join chain over the ENCODED table: constant
  terms in patterns are translated to ids by one dictionary probe
  bounded by the query's constant count (a filtered scan + collect of a
  handful of rows — metadata-scale, never the corpus), the joins run on
  integers, and only the PROJECTED variables are decoded at the end.
  Variable predicates and shared-variable joins work unchanged; the
  result is identical to bgp() over the string table (pytest parity +
  the q_encoded_bgp oracle) while every exchange carries bigints.

What stays out: FILTER/string functions need the lexical form, so the
general sparql() surface keeps the string table; bgp_encoded is the
high-volume join path (the one that matters at 10^12), not a second
query language.

Measured (605k-triple warehouse, jobs/encode_graph.py + a plan-metrics
probe on the 2-hop SMJ, this host): encoded triples 2.87 MB on disk vs
3.33 MB for the same (s,p,o) strings — only 1.16x, because parquet's own
dictionary encoding already absorbs most string redundancy AT REST — but
the 2-hop join's shuffle wrote 636 KB encoded vs 1,093 KB string for the
identical 101,396 records (1.72x, with lz4 in-flight compression already
dampening the raw ~25B->8B field ratio), and every sort/join comparison
became an integer compare.  The win lives in the EXCHANGES, which is
where a 10^12-triple self-join actually hurts; the disk story is mostly
a wash and is reported as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ordering import global_sorted_index

POSITIONS = ("subj", "pred", "obj")


def _all_terms(triples: DataFrame) -> DataFrame:
    """Distinct terms across all three positions — the ONE definition of
    'what is a term' shared by build and extend (a drift between them
    would assign duplicate or missing ids)."""
    terms = None
    for c in POSITIONS:
        part = triples.select(F.col(c).alias("term"))
        terms = part if terms is None else terms.unionAll(part)
    return terms.distinct()


def build_term_dictionary(triples: DataFrame) -> DataFrame:
    """DataFrame[term string, tid bigint]: every distinct term across all
    three positions, ids contiguous from 1 in term sort order."""
    return global_sorted_index(_all_terms(triples), ["term"], index_col="tid")


def extend_term_dictionary(dic: DataFrame, triples: DataFrame) -> DataFrame:
    """Append-only dictionary growth — the property that makes encoding
    viable at 10^12 triples: new data NEVER renumbers existing terms (a
    rebuild would invalidate every id a downstream consumer holds), it
    assigns ids above the current max to the genuinely-new terms only.

    Returns the NEW rows (term, tid) — union with `dic` for the full
    table, or append them to the stored terms table.  New ids continue
    from max(tid) in sort order of the new terms, so a given (dictionary
    state, batch) pair is deterministic and replayable in SQL
    (max + row_number over the anti-joined terms).  Plan: one distinct
    over the batch's terms (batch-scale), one broadcast-or-shuffle
    anti-join against the dictionary, one 1-row max aggregate, one
    zipWithIndex over the new terms (usually tiny)."""
    fresh = _all_terms(triples).join(dic.select("term"), "term", "left_anti")
    base = dic.agg(F.coalesce(F.max("tid"), F.lit(0)).alias("m"))
    indexed = global_sorted_index(fresh, ["term"], index_col="tid")
    return indexed.crossJoin(F.broadcast(base)).select(
        "term", (F.col("tid") + F.col("m")).cast("bigint").alias("tid")
    )


def encode_triples(triples: DataFrame, dic: DataFrame) -> DataFrame:
    """(subj, pred, obj) -> (s_id, p_id, o_id); extra columns ride along.
    Inner joins: a term missing from the dictionary is a pipeline bug and
    must surface as a row-count mismatch, not a silent null."""
    out = triples
    for c, idc in zip(POSITIONS, ("s_id", "p_id", "o_id")):
        d = dic.select(F.col("term").alias(c), F.col("tid").alias(idc))
        out = out.join(d, c, "inner").drop(c)
    return out


def decode_triples(encoded: DataFrame, dic: DataFrame) -> DataFrame:
    out = encoded
    for c, idc in zip(POSITIONS, ("s_id", "p_id", "o_id")):
        d = dic.select(F.col("tid").alias(idc), F.col("term").alias(c))
        out = out.join(d, idc, "inner").drop(idc)
    return out


def _is_var(t: str) -> bool:
    return t.startswith("?")


def sparql_encoded(
    encoded: DataFrame, dic: DataFrame, query: str
) -> DataFrame:
    """SELECT queries over the encoded store: the BGP subset bgp_encoded
    evaluates, plus COUNT-family aggregates (COUNT / COUNT DISTINCT /
    COUNT(*)), which run ENTIRELY in id space — counting ids equals
    counting terms — with group keys decoded after the aggregate.  The
    rest of the SPARQL surface (FILTER, OPTIONAL, UNION, non-COUNT
    aggregates, paths, ...) needs lexical forms or term ORDER mid-plan
    and is deliberately NOT lowered here — anything outside the subset
    is rejected loudly with a pointer at the string warehouse, never
    silently approximated.  ORDER BY / LIMIT / OFFSET / DISTINCT apply
    after decoding."""
    from .sparql import _is_path, parse_sparql

    pq = parse_sparql(query)
    unsupported = [
        (pq.filters, "FILTER"),
        (pq.optionals, "OPTIONAL"), (pq.unions, "UNION"),
        (pq.binds, "BIND"), (pq.values, "VALUES"),
        (pq.not_exists, "FILTER NOT EXISTS"), (pq.minus, "MINUS"),
        (pq.exists, "FILTER EXISTS"), (pq.subqueries, "subqueries"),
        (pq.services, "SERVICE"), (pq.construct, "CONSTRUCT"),
        (pq.describe, "DESCRIBE"), (pq.ask, "ASK"),
        (pq.having, "HAVING"), (pq.group_by, "GROUP BY"),
        (pq.from_graphs, "FROM"), (pq.from_named, "FROM NAMED"),
    ]
    bad = [name for feat, name in unsupported if feat]
    if bad:
        raise ValueError(
            f"{', '.join(bad)} outside the encoded-BGP subset — run this "
            "query against the string warehouse (query_graph --warehouse)")
    for pat in pq.patterns:
        if _is_path(pat[1]):
            raise ValueError(
                f"property path {pat[1]!r} outside the encoded-BGP subset "
                "— run against the string warehouse")
    if pq.aggs:
        # COUNT family runs ENTIRELY in id space: counting ids equals
        # counting terms (the mapping is a bijection — true for grown
        # dictionaries too), and only the group keys decode, AFTER the
        # aggregate, at one dictionary join per key over group-count
        # rows.  MIN/MAX/GROUP_CONCAT/SAMPLE would need id order to
        # mirror term order, which extend_term_dictionary's append-only
        # ids deliberately break — rejected, not approximated.
        non_count = sorted({a.func for a in pq.aggs if a.func != "COUNT"})
        if non_count:
            raise ValueError(
                f"{', '.join(non_count)} outside the encoded subset "
                "(only COUNT is id-safe) — run against the string "
                "warehouse (query_graph --warehouse)")
        needed = list(dict.fromkeys(
            pq.select + [a.var for a in pq.aggs if a.var is not None]
        ))
        sol = bgp_encoded(
            encoded, dic, pq.patterns,
            select=needed or None, distinct=False, decode=False,
        )

        def _cnt(a):
            if a.var is None:
                return F.count(F.lit(1)).alias(a.alias)
            col = F.col(f"v_{a.var}")
            return (F.count_distinct(col) if a.distinct
                    else F.count(col)).alias(a.alias)

        out = sol.groupBy(*[f"v_{v}" for v in pq.select]).agg(
            *[_cnt(a) for a in pq.aggs]
        )
        for v in pq.select:
            d = dic.select(
                F.col("tid").alias(f"v_{v}"), F.col("term").alias(v)
            )
            out = out.join(d, f"v_{v}", "inner")
        out = out.select(*pq.select, *[a.alias for a in pq.aggs])
    else:
        out = bgp_encoded(
            encoded, dic, pq.patterns,
            select=pq.select or None, distinct=pq.distinct,
        )
    if pq.order_by:
        out = out.orderBy(*[
            F.col(v).desc() if desc else F.col(v).asc()
            for v, desc in pq.order_by
        ])
    if pq.offset is not None:
        out = out.offset(pq.offset)
    if pq.limit is not None:
        out = out.limit(pq.limit)
    return out


def bgp_encoded(
    encoded: DataFrame,
    dic: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = True,
    decode: bool = True,
) -> DataFrame:
    """Evaluate a BGP over the encoded table; return DECODED columns for
    the selected variables.

    Plan shape: one probe of the dictionary for the query's constant
    terms (driver collect bounded by the pattern list, never data-scale),
    then the standard shared-variable equi-join chain — every join key an
    8-byte bigint — then one dictionary join per PROJECTED variable to
    restore lexical forms.  An unknown constant term means an empty
    result (per SPARQL), expressed as an impossible id, not an error.

    Constants normalize exactly as the string evaluator's do (round-4
    sweep fix: `<p>` used to probe the dictionary with its brackets on
    and silently matched nothing): `<iri>` denotes the raw IRI,
    well-known namespaces fold to the canonical short spelling, and the
    `a` keyword in predicate position is rdf:type."""
    from .sparql import _const_term

    pos_ids = ("s_id", "p_id", "o_id")
    for p in patterns:
        if len(p) != 3:
            raise ValueError(
                "GRAPH patterns outside the encoded-BGP subset (the "
                "encoded store holds one merged graph) — run against "
                "the string warehouse")

    def _norm(t: str, idc: str) -> str:
        if idc == "p_id" and t == "a":
            return "rdf:type"
        return _const_term(t)

    consts = sorted({
        _norm(t, idc)
        for p in patterns
        for t, idc in zip(p, pos_ids)
        if not _is_var(t)
    })
    cmap = {}
    if consts:
        rows = dic.where(F.col("term").isin(consts)).collect()
        cmap = {r["term"]: r["tid"] for r in rows}
    missing = object()

    def term_id(t: str):
        if _is_var(t):
            return None
        return cmap.get(t, missing)

    parts = []
    for pat in patterns:
        df = encoded
        var_to_idc: dict[str, str] = {}
        empty = False
        for t, idc in zip(pat, pos_ids):
            tid = term_id(t if _is_var(t) else _norm(t, idc))
            if tid is None:
                v = t[1:]
                if v in var_to_idc:  # repeated var: same-row equality
                    df = df.where(F.col(idc) == F.col(var_to_idc[v]))
                else:
                    var_to_idc[v] = idc
            elif tid is missing:
                empty = True
            else:
                df = df.where(F.col(idc) == F.lit(tid))
        if empty:  # unknown constant: this pattern matches nothing
            df = df.where(F.lit(False))
        sel = [
            F.col(idc).alias(f"v_{v}") for v, idc in var_to_idc.items()
        ]
        # all-constant pattern = existence gate: one row iff it matches
        parts.append(df.select(*sel) if sel else df.select().limit(1))
    joined = None
    for df in parts:
        if joined is None:
            joined = df
            continue
        shared = [c for c in df.columns if c in joined.columns]
        joined = (
            joined.join(df, shared, "inner") if shared
            else joined.crossJoin(df)
        )
    variables = [c[2:] for c in joined.columns]
    out_vars = select if select is not None else variables
    bad = [v for v in out_vars if v not in variables]
    if bad:
        raise ValueError(f"selected variable(s) not bound by the BGP: {bad}")
    if not decode:  # id-space result for downstream integer aggregation
        out = joined.select(*[f"v_{v}" for v in out_vars])
        return out.distinct() if distinct else out
    out = joined
    for v in out_vars:
        d = dic.select(
            F.col("tid").alias(f"v_{v}"), F.col("term").alias(v)
        )
        out = out.join(d, f"v_{v}", "inner")
    out = out.select(*out_vars)
    return out.distinct() if distinct else out
