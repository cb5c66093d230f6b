"""SPARQL basic-graph-pattern compiler over the triples DataFrame.

LogSet's query surface is rdflib SPARQL: a user writes triple patterns
with shared variables and rdflib answers them by in-memory index lookups,
row at a time (SURVEY §1.3 / §3).  At 10^12 triples the same query is a
chain of filtered scans + equi-joins — exactly what Catalyst optimizes —
so this module compiles a SPARQL subset to a DataFrame plan instead of
interpreting patterns per row:

* each triple pattern becomes ONE filtered scan of the triples table
  (constants in s/p/o positions are pushed-down parquet filters; the
  `pred` filter prunes row groups via column stats, and on a
  pred-bucketed layout prunes whole files);
* shared variables between patterns become equi-join keys (Catalyst
  picks broadcast vs shuffle per side size; AQE re-plans at runtime);
* FILTER clauses become post-join `where` expressions on bound columns
  (pushed further down by Catalyst when they touch one pattern only);
* OPTIONAL groups become left outer joins on the shared variables —
  the standard SPARQL-algebra LeftJoin lowering.

Pattern-order heuristic: patterns are greedily ordered most-constants
first among those sharing a variable with the already-bound set, so the
plan grows connected (no accidental cartesian) and starts from the most
selective scan.  Catalyst cannot reorder inner joins across the Python
DSL, so this one ordering decision lives here; everything downstream
(join strategy, filter pushdown, codegen) is the optimizer's.

Grammar (documented subset — one line per clause, '.'-separated
patterns):

    SELECT [DISTINCT] ?v1 ?v2 | *
           | ?g1 ... (AGG(?v) AS ?name) ...   -- SPARQL 1.1 aggregates:
             COUNT/MIN/MAX/SUM/AVG over a var, or COUNT(*); plain ?vars
             in the list become the GROUP BY keys (groupBy lowering;
             SUM/AVG try_cast the string object to double)
    WHERE { pattern ( . pattern )*
            ( . FILTER(expr) )*
            ( . OPTIONAL { pattern ( . pattern )* } )* }
    WHERE { { patterns } UNION { patterns } ( UNION {...} )* }
    [ ORDER BY ?v1 [DESC] ... ] [ LIMIT n ]

    Other query forms: ASK { body } (one boolean row);
    CONSTRUCT { template patterns } WHERE { body } (solutions
    instantiate the template into distinct (subj, pred, obj) rows —
    the reference's graph-building shape).

    pattern := term term term        term := ?var | bareword | 'literal'
               (a constant predicate `p+` is the SPARQL 1.1 one-or-more
                property path, evaluated as a distributed transitive
                closure of p's edges)
    expr    := ?var (=|!=|<|<=|>|>=) value, regex(?var, 'pat'),
               bound(?var), combined with && / || / !

Terms are plain strings (URIs in this engine are prefixed strings like
`conv:123`, SURVEY §1.3); no datatype tower — the triples table is
(subj, pred, obj) strings, so comparisons are string comparisons, which
matches how the structural triples encode values.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subj", "pred", "obj")


def _is_var(t: str) -> bool:
    return t.startswith("?")


@dataclass
class AggItem:
    func: str  # COUNT/MIN/MAX/SUM/AVG
    var: str | None  # None = COUNT(*)
    alias: str


@dataclass
class ParsedQuery:
    select: list[str]  # var names without '?'; empty = all in-order
    aggs: list["AggItem"]  # SPARQL 1.1 aggregate items; select = group keys
    distinct: bool
    patterns: list[tuple[str, str, str]]
    filters: list[str]  # raw FILTER bodies (still with ?vars)
    optionals: list[list[tuple[str, str, str]]] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    # WHERE { {A} UNION {B} ... }: pattern-group arms (patterns is then
    # empty); each arm is a plain BGP (no nested FILTER/OPTIONAL in arms)
    unions: list[list[tuple[str, str, str]]] = field(default_factory=list)
    # CONSTRUCT { template } WHERE {...}: template triple patterns whose
    # variables are substituted from each solution (None = SELECT query)
    construct: list[tuple[str, str, str]] | None = None
    # ASK { ... }: one boolean row — does any solution exist?
    ask: bool = False
    # DESCRIBE <uri>: every triple with the resource as subject or object
    describe: str | None = None


def _tokenize_terms(s: str) -> list[str]:
    """Split pattern text on whitespace, keeping 'quoted literals' (which
    may contain spaces) as single terms."""
    return [
        m.group(1) if m.group(1) is not None else m.group(0)
        for m in re.finditer(r"'([^']*)'|\S+", s)
    ]


def _parse_patterns(body: str) -> list[tuple[str, str, str]]:
    pats = []
    for chunk in body.split("."):
        chunk = chunk.strip()
        if not chunk:
            continue
        terms = _tokenize_terms(chunk)
        if len(terms) != 3:
            raise ValueError(f"pattern must have 3 terms: {chunk!r}")
        pats.append(tuple(terms))
    return pats


def parse_sparql(query: str) -> ParsedQuery:
    """Parse the documented SPARQL subset.  Raises ValueError with the
    offending clause on anything outside the subset — silent
    misinterpretation of a query language is worse than rejection."""
    q = " ".join(query.split())  # normalize whitespace
    dm = re.match(r"DESCRIBE\s+(\S+)\s*$", q, re.IGNORECASE)
    if dm and not _is_var(dm.group(1)):
        pq = ParsedQuery(select=[], aggs=[], distinct=True, patterns=[],
                         filters=[])
        pq.describe = dm.group(1)
        return pq
    am = re.match(r"ASK\s*\{(.*)\}\s*$", q, re.IGNORECASE | re.DOTALL)
    if am:
        inner = parse_sparql(f"SELECT * WHERE {{{am.group(1)}}}")
        inner.ask = True
        return inner
    cm = re.match(
        r"CONSTRUCT\s*\{(.*?)\}\s*WHERE\s*\{(.*)\}\s*$", q,
        re.IGNORECASE | re.DOTALL,
    )
    if cm:
        template = _parse_patterns(cm.group(1))
        if not template:
            raise ValueError("CONSTRUCT template has no triple patterns")
        inner = parse_sparql(f"SELECT * WHERE {{{cm.group(2)}}}")
        inner.construct = template
        return inner
    m = re.match(
        r"SELECT\s+(DISTINCT\s+)?(.*?)\s+WHERE\s*\{(.*)\}"
        r"(?:\s*ORDER\s+BY\s+(.*?))?(?:\s*LIMIT\s+(\d+))?\s*$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparseable query (need SELECT ... WHERE {{...}}): {q!r}")
    distinct = m.group(1) is not None
    sel_raw = m.group(2).strip()
    aggs: list[AggItem] = []

    def _agg(mo: re.Match) -> str:
        func = mo.group(1).upper()
        var = None if mo.group(2) == "*" else mo.group(2)[1:]
        if var is None and func != "COUNT":
            raise ValueError(f"{func}(*) is not in the subset (COUNT(*) only)")
        aggs.append(AggItem(func, var, mo.group(3)[1:]))
        return " "

    sel_raw = re.sub(
        r"\(\s*(COUNT|MIN|MAX|SUM|AVG)\s*\(\s*(\?\w+|\*)\s*\)\s+AS\s+(\?\w+)\s*\)",
        _agg, sel_raw, flags=re.IGNORECASE,
    ).strip()
    if sel_raw == "*":
        if aggs:
            raise ValueError("cannot mix * with aggregate items")
        select: list[str] = []
    else:
        select = [v[1:] for v in sel_raw.split() if _is_var(v)]
        if len(select) != len(sel_raw.split()):
            raise ValueError(f"SELECT list must be ?vars or aggregates: {sel_raw!r}")

    body = m.group(3)
    filters: list[str] = []
    optionals: list[list[tuple[str, str, str]]] = []

    # pull OPTIONAL { ... } groups out first (no nesting in the subset)
    def _opt(mo: re.Match) -> str:
        optionals.append(_parse_patterns(mo.group(1)))
        return " "

    body = re.sub(r"OPTIONAL\s*\{([^{}]*)\}", _opt, body, flags=re.IGNORECASE)

    # then FILTER(...) clauses (balanced parens not needed for the subset:
    # match to the ')' that balances the opening one)
    def _filt(mo: re.Match) -> str:
        filters.append(mo.group(1).strip())
        return " "

    body = re.sub(r"FILTER\s*\(((?:[^()]|\([^()]*\))*)\)", _filt, body,
                  flags=re.IGNORECASE)

    # top-level UNION of braced pattern groups: { A } UNION { B } [UNION ...]
    unions: list[list[tuple[str, str, str]]] = []
    um = re.match(
        r"\s*\{([^{}]*)\}(?:\s+UNION\s+\{([^{}]*)\})+\s*$", body, re.IGNORECASE
    )
    if um:
        arms = re.findall(r"\{([^{}]*)\}", body)
        unions = [_parse_patterns(a) for a in arms]
        if any(not a for a in unions):
            raise ValueError("empty UNION arm")
        patterns = []
    else:
        patterns = _parse_patterns(body)
        if not patterns:
            raise ValueError("WHERE clause has no triple patterns")

    order_by = []
    if m.group(4):
        toks = m.group(4).split()
        i = 0
        while i < len(toks):
            if not _is_var(toks[i]):
                raise ValueError(f"ORDER BY expects ?vars: {m.group(4)!r}")
            desc = i + 1 < len(toks) and toks[i + 1].upper() == "DESC"
            order_by.append((toks[i][1:], desc))
            i += 2 if desc else 1
    limit = int(m.group(5)) if m.group(5) else None
    return ParsedQuery(
        select=select, aggs=aggs, distinct=distinct, patterns=patterns,
        filters=filters, optionals=optionals, order_by=order_by, limit=limit,
        unions=unions,
    )


def _filter_to_expr(body: str) -> str:
    """FILTER body -> Spark SQL boolean expression over bound columns.
    Whitelist-rewrites the subset's operators; unknown ?vars simply become
    missing-column errors at analysis time (loud, not silent)."""
    e = body
    e = re.sub(r"regex\s*\(\s*\?(\w+)\s*,\s*('(?:[^']*)')\s*\)",
               r"\1 RLIKE \2", e, flags=re.IGNORECASE)
    e = re.sub(r"bound\s*\(\s*\?(\w+)\s*\)", r"\1 IS NOT NULL", e,
               flags=re.IGNORECASE)
    e = e.replace("&&", " AND ").replace("||", " OR ")
    e = re.sub(r"!(?!=)", " NOT ", e)
    e = re.sub(r"(?<![!<>=])=(?!=)", "=", e)  # SPARQL '=' is SQL '='
    e = e.replace("!=", "<>")
    e = re.sub(r"\?(\w+)", r"\1", e)
    return e


def _scan(triples: DataFrame, pattern: tuple[str, str, str], tag: int) -> tuple[DataFrame, set[str]]:
    """One pattern -> one filtered scan projecting its variables.
    Constants filter (pushed down to the source); a variable repeated
    within the pattern adds an intra-row equality filter.

    SPARQL 1.1 property path `pred+` (one-or-more): the pattern's source
    is swapped for the transitive closure of that predicate's edge set
    (path-doubling `transitive_closure`, O(log diameter) rounds) — the
    rdflib recursive-traversal semantics as a distributed fixpoint."""
    pred = pattern[1]
    if not _is_var(pred) and pred.endswith("+") and len(pred) > 1:
        from .graph import transitive_closure

        base = pred[:-1]
        edges = triples.where(F.col("pred") == base).select(
            F.col("subj").alias("child"), F.col("obj").alias("parent")
        )
        triples = transitive_closure(edges).select(
            F.col("node").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("ancestor").alias("obj"),
        )
    df = triples
    first_pos_of: dict[str, str] = {}
    for pos, term in zip(_POS, pattern):
        if _is_var(term):
            v = term[1:]
            if v in first_pos_of:
                df = df.where(F.col(first_pos_of[v]) == F.col(pos))
            else:
                first_pos_of[v] = pos
        else:
            df = df.where(F.col(pos) == term)
    cols = [F.col(pos).alias(v) for v, pos in first_pos_of.items()]
    # a pattern with no vars is an existence assertion: one marker row if
    # any triple matches, zero otherwise (limit(1) so the later crossJoin
    # gates rather than multiplies)
    if not cols:
        return df.select(F.lit(1).alias(f"_exists_{tag}")).limit(1), set()
    return df.select(*cols), set(first_pos_of)


def _order_patterns(patterns: list[tuple[str, str, str]]) -> list[tuple[str, str, str]]:
    """Greedy: most constants first; then repeatedly take the most-
    selective pattern connected (shares a var) to the bound set, falling
    back to any remaining pattern (true cartesian — allowed but last)."""
    if not patterns:
        return []
    n_const = lambda p: sum(0 if _is_var(t) else 1 for t in p)
    pvars = lambda p: {t[1:] for t in p if _is_var(t)}
    remaining = sorted(patterns, key=n_const, reverse=True)
    out = [remaining.pop(0)]
    bound = pvars(out[0])
    while remaining:
        connected = [p for p in remaining if pvars(p) & bound]
        pick = max(connected, key=n_const) if connected else remaining[0]
        remaining.remove(pick)
        out.append(pick)
        bound |= pvars(pick)
    return out


def _join_patterns(
    triples: DataFrame, patterns: list[tuple[str, str, str]], start_tag: int = 0
) -> tuple[DataFrame, list[str]]:
    """Inner-join a pattern group on shared variables; returns the bound
    DataFrame and variable order of first appearance."""
    ordered = _order_patterns(patterns)
    acc, acc_vars = _scan(triples, ordered[0], start_tag)
    var_order = [c for c in acc.columns if not c.startswith("_exists_")]
    for i, p in enumerate(ordered[1:], start=start_tag + 1):
        df, vs = _scan(triples, p, i)
        shared = sorted(acc_vars & vs)
        acc = acc.join(df, on=shared) if shared else acc.crossJoin(df)
        var_order += [v for v in sorted(vs - acc_vars)]
        acc_vars |= vs
    return acc, var_order


def bgp(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    filters: list[str] = (),
    optionals: list[list[tuple[str, str, str]]] = (),
    select: list[str] | None = None,
    distinct: bool = True,
    unions: list[list[tuple[str, str, str]]] = (),
) -> DataFrame:
    """Programmatic BGP evaluation (the parser lowers to this).  Returns
    a DataFrame with one column per selected variable.

    `unions`: pattern-group arms ({A} UNION {B}); each arm is evaluated
    independently and the solutions concatenated with variables aligned
    by name (vars unbound in an arm become NULL — SPARQL union
    semantics).  Mutually exclusive with `patterns`."""
    if unions:
        if patterns:
            raise ValueError("patterns and unions are mutually exclusive")
        arm_res = []
        var_order: list[str] = []
        for i, arm in enumerate(unions):
            df, _ = _join_patterns(triples, arm, start_tag=5000 * (i + 1))
            vs = [c for c in df.columns if not c.startswith("_exists_")]
            arm_res.append((df, set(vs)))
            var_order += [v for v in vs if v not in var_order]
        aligned = [
            df.select(*[
                F.col(v) if v in vs else F.lit(None).cast("string").alias(v)
                for v in var_order
            ])
            for df, vs in arm_res
        ]
        acc = aligned[0]
        for d in aligned[1:]:
            acc = acc.unionByName(d)
    else:
        acc, var_order = _join_patterns(triples, patterns)
    for gi, group in enumerate(optionals):
        opt_df, opt_vars = _join_patterns(triples, group, start_tag=1000 * (gi + 1))
        shared = sorted(set(var_order) & set(opt_df.columns))
        if not shared:
            raise ValueError(f"OPTIONAL group {group} shares no variable")
        acc = acc.join(opt_df, on=shared, how="left")
        var_order += [v for v in opt_df.columns
                      if v not in var_order and not v.startswith("_exists_")]
    for f in filters:
        acc = acc.where(F.expr(_filter_to_expr(f)))
    cols = select if select else [v for v in var_order]
    out = acc.select(*cols)
    return out.distinct() if distinct else out


def sparql(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a query in the documented SPARQL subset over a
    (subj, pred, obj, ...) triples DataFrame."""
    pq = parse_sparql(query)
    if pq.describe is not None:
        # DESCRIBE <uri>: the resource's concise neighborhood — both
        # pushed-down scans, unioned (rdflib's Graph.triples((uri,*,*))
        # + ((*,*,uri)) shape)
        return (
            triples.where(F.col("subj") == pq.describe)
            .select("subj", "pred", "obj")
            .unionByName(
                triples.where(F.col("obj") == pq.describe)
                .select("subj", "pred", "obj")
            )
            .distinct()
        )
    if pq.ask:
        # ASK: one boolean row.  limit(1) before the agg so the scan
        # stops at the first solution instead of materializing them all.
        sol = bgp(
            triples, pq.patterns, filters=pq.filters, optionals=pq.optionals,
            distinct=False, unions=pq.unions,
        ).limit(1)
        return sol.agg((F.count(F.lit(1)) > 0).alias("ask"))
    if pq.construct is not None:
        # CONSTRUCT: evaluate WHERE, then instantiate each template
        # pattern per solution — the reference's graph-building shape
        # (query bindings -> emitted triples), distinct because a graph
        # is a SET of triples
        sol = bgp(
            triples, pq.patterns, filters=pq.filters, optionals=pq.optionals,
            distinct=False, unions=pq.unions,
        )
        def _term(t: str):
            return F.col(t[1:]) if _is_var(t) else F.lit(t)
        parts = [
            sol.select(
                _term(s).alias("subj"), _term(p).alias("pred"),
                _term(o).alias("obj"),
            )
            for s, p, o in pq.construct
        ]
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        # unbound OPTIONAL vars instantiate no triple (SPARQL semantics)
        return out.where(
            F.col("subj").isNotNull() & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        ).distinct()
    if pq.aggs:
        # aggregate form: evaluate the BGP keeping every needed variable
        # as raw bindings (NO distinct — aggregate semantics are over the
        # solution multiset), then one groupBy on the plain select vars
        needed = list(dict.fromkeys(
            pq.select + [a.var for a in pq.aggs if a.var is not None]
        ))
        sol = bgp(
            triples, pq.patterns, filters=pq.filters, optionals=pq.optionals,
            select=needed or None, distinct=False, unions=pq.unions,
        )
        def _agg_col(a: AggItem):
            if a.var is None:
                return F.count(F.lit(1)).alias(a.alias)
            col = F.col(a.var)
            if a.func in ("SUM", "AVG"):
                col = col.cast("double")
            return getattr(F, a.func.lower())(col).alias(a.alias)
        out = sol.groupBy(*pq.select).agg(*[_agg_col(a) for a in pq.aggs])
    else:
        out = bgp(
            triples,
            pq.patterns,
            filters=pq.filters,
            optionals=pq.optionals,
            select=pq.select or None,
            distinct=pq.distinct,
            unions=pq.unions,
        )
    if pq.order_by:
        out = out.orderBy(
            *[F.col(v).desc() if desc else F.col(v).asc() for v, desc in pq.order_by]
        )
    if pq.limit is not None:
        out = out.limit(pq.limit)
    return out


def write_vertical(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write triples VERTICALLY PARTITIONED by predicate (the classic
    triple-store layout: one directory per predicate).  The KG vocabulary
    is a closed, small set (SURVEY §1.1 — LogSet's ontology has ~a dozen
    predicates), so partition count stays tiny while every constant-pred
    BGP pattern — the overwhelmingly common kind — prunes to its own
    files at PLANNING time (PartitionFilters, no footer reads of other
    predicates).  Repartition by pred before the write so each partition
    dir is written by its own task set instead of every task appending a
    sliver to every dir."""
    (
        triples.repartition("pred")
        .write.mode(mode)
        .partitionBy("pred")
        .parquet(path)
    )


def read_vertical(spark, path: str) -> DataFrame:
    """Read a vertical layout back as an ordinary (subj, pred, obj, ...)
    triples DataFrame — bgp()/sparql() work unchanged; Catalyst turns
    their pred-constant filters into partition pruning."""
    return spark.read.parquet(path)
