"""SPARQL 1.1 Update over triples DataFrames and snapshot tables.

Subset (same discipline as operators/sparql.py — anything outside it is
rejected loudly with the offending clause, because silently
misinterpreting a mutation language corrupts the store):

    [PREFIX ns: <iri>]*
    INSERT DATA { triple ( . triple )* }           -- all-constant
    DELETE DATA { triple ( . triple )* }           -- all-constant
    DELETE WHERE { pattern ( . pattern )* }        -- plain BGP; the
                                                   -- body IS the template
    DELETE { template } INSERT { template } WHERE { body }
    DELETE { template } WHERE { body }
    INSERT { template } WHERE { body }
        -- templates are plain BGPs (vars + constants; no paths, no
        -- FILTER/OPTIONAL/... keywords); the WHERE body takes the full
        -- query subset (FILTER, OPTIONAL, BIND, VALUES, NOT EXISTS, ...)

Semantics (SPARQL 1.1 Update, applied to one graph):

* Both the delete set D and the insert set I are computed against the
  ORIGINAL graph state (the spec's "delete then insert, both from the
  same solution sequence"), then `G' = (G \\ D) UNION I` as a SET of
  triples — inserting an existing triple is a no-op, deleting an absent
  one is a no-op.
* Solutions with an unbound variable in a template instantiate no triple
  for that template (the CONSTRUCT rule), which this lowering inherits
  by reusing the CONSTRUCT instantiation path verbatim.

Two surfaces:

* `sparql_update(graph, update)` — pure functional form: returns the
  new graph as a DataFrame (extra non-spo columns on kept rows are
  preserved; inserted rows carry NULL for them).  This is what the
  oracle checks: D and I lower to anti-join / union-distinct plans that
  DuckDB reproduces exactly.
* `apply_update(store, spark, update, ...)` — snapshot-store form: one
  atomic copy-on-write commit against a SnapshotTableIO (Iceberg
  CoW MERGE shape): only partitions holding a deleted row or receiving
  an inserted row are rewritten, everything else keeps its files, and
  the pre-update graph stays readable via time travel.  rdflib's
  `Graph.update()` is the single-process equivalent of this surface.

Scale: D and I are usually tiny next to the store (a pattern-scoped
mutation); the delete is one anti-join on (subj, pred, obj) — broadcast
when small, shuffle otherwise — and the CoW commit rewrites only the
touched (ts_day, conv_bucket) slice, never the table.
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sparql import (
    ParsedQuery,
    _const_term,
    _eval_parsed,
    _expand_term,
    _is_path,
    _is_var,
    _parse_patterns,
    _parse_protected,
    _protect_literals,
    _restore_quoted,
    _strip_comments,
    _strip_prefix_headers,
)

_SPO = ("subj", "pred", "obj")


@dataclass
class ParsedUpdate:
    delete_tmpl: list[tuple[str, str, str]] = field(default_factory=list)
    insert_tmpl: list[tuple[str, str, str]] = field(default_factory=list)
    where: ParsedQuery | None = None  # None => DATA form (all-constant)


def _check_template(tmpl: list[tuple[str, str, str]], clause: str,
                    constant: bool = False) -> None:
    for p in tmpl:
        if len(p) != 3:
            raise ValueError(f"{clause} template takes triples, got {p}")
        if _is_path(p[1]) or (not _is_var(p[1]) and p[1].startswith("!")):
            raise ValueError(
                f"{clause} template predicates must be plain terms, "
                f"not paths/negated sets: {p[1]!r}")
        if constant and any(_is_var(t) for t in p):
            raise ValueError(
                f"{clause} takes constant triples only (got variable in "
                f"{p}); use DELETE/INSERT ... WHERE for patterns")


def _no_keywords(body: str, clause: str) -> None:
    kw = re.search(
        r"\b(FILTER|OPTIONAL|BIND|VALUES|UNION|MINUS|SELECT|GRAPH)\b",
        body, re.IGNORECASE)
    if kw:
        raise ValueError(
            f"{clause} takes a plain BGP; {kw.group(1)} is outside the "
            "subset here")


def parse_sparql_update(update: str) -> ParsedUpdate:
    """Parse one update request in the documented subset."""
    q, lits = _protect_literals(" ".join(_strip_comments(update).split()))
    q, prefixes = _strip_prefix_headers(q, lits)
    pu = ParsedUpdate()

    m = re.match(r"(INSERT|DELETE)\s+DATA\s*\{(.*)\}\s*$", q,
                 re.IGNORECASE | re.DOTALL)
    if m:
        verb, body = m.group(1).upper(), m.group(2)
        _no_keywords(body, f"{verb} DATA")
        tmpl = _parse_patterns(body, lits)
        if not tmpl:
            raise ValueError(f"{verb} DATA has no triples")
        _check_template(tmpl, f"{verb} DATA", constant=True)
        if verb == "INSERT":
            pu.insert_tmpl = tmpl
        else:
            pu.delete_tmpl = tmpl
    else:
        m = re.match(r"DELETE\s+WHERE\s*\{(.*)\}\s*$", q,
                     re.IGNORECASE | re.DOTALL)
        if m:
            # the body IS the template (spec shorthand) — plain BGP only,
            # same restriction (and the same reason) as CONSTRUCT WHERE
            _no_keywords(m.group(1), "DELETE WHERE")
            tmpl = _parse_patterns(m.group(1), lits)
            if not tmpl:
                raise ValueError("DELETE WHERE has no triple patterns")
            _check_template(tmpl, "DELETE WHERE")
            pu.delete_tmpl = tmpl
            pu.where = _parse_protected(
                f"SELECT * WHERE {{{m.group(1)}}}", lits)
        else:
            m = re.match(
                r"(?:DELETE\s*\{(.*?)\}\s*)?(?:INSERT\s*\{(.*?)\}\s*)?"
                r"WHERE\s*\{(.*)\}\s*$",
                q, re.IGNORECASE | re.DOTALL)
            if not m or (m.group(1) is None and m.group(2) is None):
                raise ValueError(
                    "unparseable update (need INSERT/DELETE DATA, DELETE "
                    f"WHERE, or DELETE/INSERT {{...}} WHERE {{...}}): {q!r}")
            for grp, clause in ((m.group(1), "DELETE"),
                                (m.group(2), "INSERT")):
                if grp is None:
                    continue
                _no_keywords(grp, clause)
                tmpl = _parse_patterns(grp, lits)
                if not tmpl:
                    raise ValueError(f"{clause} template has no triples")
                _check_template(tmpl, clause)
                if clause == "DELETE":
                    pu.delete_tmpl = tmpl
                else:
                    pu.insert_tmpl = tmpl
            pu.where = _parse_protected(
                f"SELECT * WHERE {{{m.group(3)}}}", lits)

    if prefixes:
        x = lambda t: _expand_term(t, prefixes)  # noqa: E731
        pu.delete_tmpl = [tuple(map(x, p)) for p in pu.delete_tmpl]
        pu.insert_tmpl = [tuple(map(x, p)) for p in pu.insert_tmpl]
        if pu.where is not None:
            from .sparql import _expand_prefixes

            _expand_prefixes(pu.where, prefixes)
    # template vars must be bound by the WHERE body (or the request can
    # never instantiate anything — reject at parse, not silently at run)
    if pu.where is not None:
        bound = {t[1:] for p in pu.where.patterns for t in p if _is_var(t)}
        bound |= {t[1:] for g, _ in (pu.where.optionals or [])
                  for p in g for t in p if _is_var(t)}
        bound |= {b[1] for b in (pu.where.binds or [])}
        bound |= {v for vs, _ in (pu.where.values or []) for v in vs}
        for arm, _ in (pu.where.unions or []):
            bound |= {t[1:] for p in arm for t in p if _is_var(t)}
        for p in pu.delete_tmpl + pu.insert_tmpl:
            for t in p:
                if _is_var(t) and t[1:] not in bound:
                    raise ValueError(
                        f"template variable {t} is not bound in WHERE")
    return pu


def _sets(graph: DataFrame, pu: ParsedUpdate) -> tuple[DataFrame | None,
                                                       DataFrame | None]:
    """Lower the request to (delete_set, insert_set) spo frames, both
    computed against the original `graph` (SPARQL Update evaluation
    order).  Template instantiation reuses the CONSTRUCT path —
    per-solution template stamping, unbound-var drop, distinct."""
    spark = graph.sparkSession
    spo_graph = graph.select(*_SPO)

    def const_frame(tmpl):
        # `a` in verb position = rdf:type, same as the template/WHERE
        # instantiation paths (round-4 sweep: INSERT DATA used to store
        # the literal predicate 'a')
        rows = [
            (_const_term(s),
             "rdf:type" if p == "a" else _const_term(p),
             _const_term(o))
            for s, p, o in tmpl
        ]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string").distinct()

    def tmpl_frame(tmpl):
        # shallow-copy the WHERE plan and stamp this template on it —
        # the CONSTRUCT branch of _eval_parsed does the instantiation
        pq = copy.copy(pu.where)
        pq.construct = tmpl
        return _eval_parsed(spo_graph, pq)

    mk = const_frame if pu.where is None else tmpl_frame
    d = mk(pu.delete_tmpl) if pu.delete_tmpl else None
    i = mk(pu.insert_tmpl) if pu.insert_tmpl else None
    return d, i


def _split_requests(update: str) -> list[str]:
    """A SPARQL 1.1 update REQUEST is a ';'-separated operation
    sequence.  Split on top-level ';' — literal-safe (protection first)
    and brace-depth-aware (';' inside a template/body never splits) —
    and re-spell each part."""
    q, lits = _protect_literals(update)
    parts, depth, start = [], 0, 0
    for idx, ch in enumerate(q):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        elif ch == ";" and depth == 0:
            parts.append(q[start:idx])
            start = idx + 1
    parts.append(q[start:])
    return [_restore_quoted(p, lits).strip() for p in parts if p.strip()]


def _apply_one(graph: DataFrame, update: str) -> DataFrame:
    pu = parse_sparql_update(update)
    d, i = _sets(graph, pu)
    kept = graph
    if d is not None:
        kept = kept.join(d, on=list(_SPO), how="left_anti")
    if i is None:
        return kept
    add = i.join(kept.select(*_SPO), on=list(_SPO), how="left_anti")
    return kept.unionByName(add, allowMissingColumns=True)


_PREFIX_HDR_RE = re.compile(
    r"\s*((?:PREFIX\s+\w*:\s*<[^<>\s]*>\s*)+)", re.IGNORECASE)


def sparql_update(graph: DataFrame, update: str) -> DataFrame:
    """Apply one update REQUEST (one operation, or a ';'-sequence of
    operations applied left-to-right, each seeing the previous one's
    output — SPARQL 1.1 request semantics) to a triples DataFrame;
    returns the new graph.  Leading PREFIX declarations remain in
    effect for every operation of the sequence (spec behavior).  Extra
    (non-spo) columns survive on kept rows and are NULL on inserted
    rows."""
    parts = _split_requests(update)
    if not parts:
        raise ValueError("empty update request")
    if len(parts) == 1:
        return _apply_one(graph, parts[0])
    # SPARQL 1.1: a PREFIX declaration stays in effect for the REST of
    # the request, wherever in the sequence it appears — so accumulate
    # every part's leading declarations into the running header (ADVICE
    # r04: only the FIRST part's header used to propagate).  Each part
    # is applied with the accumulated header PREPENDED, so its own
    # inline declarations come later in the text and override older
    # bindings for that and subsequent operations (last wins).
    decl_re = re.compile(r"PREFIX\s+(\w*:)\s*(<[^<>\s]*>)", re.IGNORECASE)
    header_decls: dict[str, str] = {}
    out = graph
    for part in parts:
        rendered = "".join(
            f"PREFIX {ns} {iri} " for ns, iri in header_decls.items()
        )
        out = _apply_one(out, rendered + part)
        hm = _PREFIX_HDR_RE.match(part)
        if hm:
            for ns, iri in decl_re.findall(hm.group(1)):
                header_decls[ns] = iri
    return out


def apply_update(
    store, spark: SparkSession, update: str,
    insert_conv=None, insert_ts: str = "1970-01-01 00:00:00",
    stats_cols: list[str] | None = None,
) -> tuple[int, int, int]:
    """Apply one update request to a SnapshotTableIO triples store as
    ONE atomic copy-on-write commit (Iceberg MERGE shape): partitions
    holding a deleted row or receiving an insert are rewritten; every
    other partition keeps its files; the pre-update graph remains
    readable via time travel.

    Inserted triples need the store's layout columns: `insert_conv` is a
    Column expression for conv_id (default: the subject's local name —
    `conv:x` partitions with conversation x, anything else under its own
    key) and `insert_ts` the timestamp literal they are filed under.
    Returns (new_version, n_deleted, n_inserted)."""
    if len(_split_requests(update)) > 1:
        raise ValueError(
            "';'-sequenced update requests are not supported on the "
            "snapshot store (each operation must be its own atomic "
            "commit — issue them as separate apply_update calls); the "
            "functional sparql_update() form applies sequences")
    pu = parse_sparql_update(update)
    graph = store.read(spark)
    d, i = _sets(graph, pu)
    deletes = None
    if d is not None:
        deletes = d.select(*_SPO).distinct()
    inserts = None
    if i is not None:
        if insert_conv is None:
            insert_conv = F.regexp_replace(F.col("subj"), r"^\w+:", "")
        new = i.join(graph.select(*_SPO), on=list(_SPO), how="left_anti")
        data_cols = [c for c in graph.columns
                     if c not in ("ts_day", "conv_bucket")]
        inserts = new.withColumn("conv_id", insert_conv).withColumn(
            "ts", F.lit(insert_ts).cast("timestamp"))
        for c in data_cols:
            if c not in inserts.columns:
                # typed nulls — an untyped (void) column would be written
                # with an arbitrary physical parquet type and break the
                # non-mergeSchema read against the store's real schema
                inserts = inserts.withColumn(
                    c, F.lit(None).cast(graph.schema[c].dataType))
        inserts = inserts.select(*data_cols)
    return store.cow_update(
        spark, deletes=deletes, on=list(_SPO), inserts=inserts,
        stats_cols=stats_cols)


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update — graph management over QUADS frames
# ---------------------------------------------------------------------------

_MGMT_RE = re.compile(
    r"^(CLEAR|DROP|CREATE|COPY|MOVE|ADD|LOAD)\b", re.IGNORECASE)


def is_graph_management(update: str) -> bool:
    """True when the request is a graph-management form (CLEAR/DROP/
    CREATE/COPY/MOVE/ADD/LOAD) rather than a triple-template form."""
    return bool(_MGMT_RE.match(update.strip()))


def _mgmt_target(tok: list[str], allow_classes: bool = True) -> str:
    """Consume one graph designator from the token list: `GRAPH <g>`,
    a bare term, `DEFAULT`, or (when allowed) `NAMED` / `ALL`.
    Returns the term, or the markers '\x02default'/'\x02named'/
    '\x02all'."""
    if not tok:
        raise ValueError("graph-management request is missing its target")
    head = tok[0].upper()
    if head == "DEFAULT":
        tok.pop(0)
        return "\x02default"
    if allow_classes and head in ("NAMED", "ALL"):
        tok.pop(0)
        return "\x02" + head.lower()
    if head == "GRAPH":
        tok.pop(0)
        if not tok:
            raise ValueError("GRAPH keyword without a graph term")
    return _const_term(tok.pop(0))


def graph_update(
    quads: DataFrame, update: str,
    load_fn=None,
) -> DataFrame:
    """SPARQL 1.1 Update graph management, functional form: apply one
    CLEAR / DROP / CREATE / COPY / MOVE / ADD / LOAD request to a quads
    frame (subj, pred, obj, graph) and return the new frame.

    Dataset representation (documented, same discipline as the query
    side): named graphs are non-null `graph` values; THE DEFAULT GRAPH
    IS the rows whose `graph` IS NULL.  A DataFrame records no empty
    graphs, so (per the spec's note for such stores) DROP == CLEAR and
    CREATE is a no-op — except that non-SILENT forms still raise when
    the target graph has no rows, because on a store that cannot record
    emptiness, "absent" is the only checkable notion of "does not
    exist".  SILENT downgrades every such error to a no-op.

    LOAD reads a local Turtle file (sources/turtle.py parser — the
    catalog-scale path, driver-parsed) into the target graph; pass
    `load_fn(path) -> DataFrame[subj,pred,obj]` to override (tests, or
    a future remote fetcher).

    Scale: every form is a filter/union over the quads frame — one
    predicate pushdown against a graph-partitioned table, never a scan
    of untargeted graphs' data.
    """
    if "graph" not in quads.columns:
        raise ValueError(
            "graph management needs a quads frame with a 'graph' column "
            f"(got columns {quads.columns})")
    q, lits = _protect_literals(" ".join(_strip_comments(update).split()))
    q, prefixes = _strip_prefix_headers(q, lits)
    tok = q.split()
    verb = tok.pop(0).upper()
    silent = bool(tok) and tok[0].upper() == "SILENT"
    if silent:
        tok.pop(0)

    from .sparql import _restore_content

    def term(t):
        t = _restore_content(t, lits)
        return _expand_term(t, prefixes) if prefixes else t

    toks = [term(t) for t in tok]

    def done(label):  # trailing tokens = a clause we'd misinterpret
        if toks:
            raise ValueError(f"{label}: unexpected trailing {toks[0]!r}")

    def g_pred(g):  # Column predicate selecting graph g's rows
        if g == "\x02default":
            return F.col("graph").isNull()
        if g == "\x02named":
            return F.col("graph").isNotNull()
        if g == "\x02all":
            return F.lit(True)
        # null-safe: ~(graph == g) must KEEP default-graph (NULL) rows
        return F.col("graph").eqNullSafe(g)

    def require_nonempty(g, label):
        if silent or g in ("\x02named", "\x02all"):
            return
        if quads.where(g_pred(g)).limit(1).count() == 0:
            name = "DEFAULT" if g == "\x02default" else repr(g)
            raise ValueError(
                f"{label}: graph {name} has no rows "
                "(SILENT downgrades this to a no-op)")

    if verb in ("CLEAR", "DROP"):
        g = _mgmt_target(toks)
        done(verb)
        require_nonempty(g, verb)
        return quads.where(~g_pred(g))

    if verb == "CREATE":
        g = _mgmt_target(toks, allow_classes=False)
        done(verb)
        if g.startswith("\x02"):
            raise ValueError("CREATE takes GRAPH <g>")
        if not silent and quads.where(g_pred(g)).limit(1).count() > 0:
            raise ValueError(f"CREATE: graph {g!r} already exists")
        return quads  # no empty-graph record on a DataFrame store

    if verb in ("COPY", "MOVE", "ADD"):
        src = _mgmt_target(toks, allow_classes=False)
        if not toks or toks.pop(0).upper() != "TO":
            raise ValueError(f"{verb} needs '{verb} <src> TO <dst>'")
        dst = _mgmt_target(toks, allow_classes=False)
        done(verb)
        if src.startswith("\x02n") or dst.startswith("\x02n"):
            raise ValueError(f"{verb} takes GRAPH <g> or DEFAULT operands")
        require_nonempty(src, verb)
        if src == dst:
            return quads  # spec: same-graph COPY/MOVE/ADD is a no-op
        moved = quads.where(g_pred(src)).withColumn(
            "graph",
            F.lit(None).cast("string") if dst == "\x02default"
            else F.lit(dst))
        out = quads
        if verb in ("COPY", "MOVE"):
            out = out.where(~g_pred(dst))  # dst is REPLACED, not merged
        if verb == "MOVE":
            out = out.where(~g_pred(src))
        if verb == "ADD":
            # set semantics WITHIN the destination: re-adding a triple the
            # dst already holds is a no-op (anti-join, never a frame-wide
            # distinct — untargeted graphs' row multiplicity is not ours
            # to change)
            moved = moved.join(
                quads.where(g_pred(dst)).select(*_SPO).distinct(),
                on=list(_SPO), how="left_anti").distinct()
        return out.unionByName(moved.select(*out.columns))

    if verb == "LOAD":
        if not toks:
            raise ValueError("LOAD needs a source uri/path")
        src = toks.pop(0)
        path = src[1:-1] if src.startswith("<") and src.endswith(">") else src
        if path.startswith("file://"):
            path = path[len("file://"):]
        g = None
        if toks:
            if toks.pop(0).upper() != "INTO":
                raise ValueError("LOAD: want 'LOAD <src> [INTO GRAPH <g>]'")
            g = _mgmt_target(toks, allow_classes=False)
            done("LOAD")
            if g.startswith("\x02"):
                g = None  # INTO DEFAULT
        try:
            if load_fn is not None:
                tri = load_fn(path)
            elif path.endswith(".trig"):
                from ..sources.turtle import load_trig

                tri = load_trig(quads.sparkSession, path)
            elif path.endswith(".nt"):
                # distributed line-format load; malformed lines are
                # quarantined by the source — LOAD is strict, so any
                # quarantined line fails the request (SILENT swallows)
                from ..sources.ntriples import from_ntriples

                tri, bad = from_ntriples(quads.sparkSession, path)
                nbad = bad.count()
                if nbad:
                    raise ValueError(
                        f"LOAD {path}: {nbad} malformed N-Triples line(s)"
                    )
            elif path.endswith(".nq"):
                from ..sources.ntriples import from_nquads

                tri, bad = from_nquads(quads.sparkSession, path)
                nbad = bad.count()
                if nbad:
                    raise ValueError(
                        f"LOAD {path}: {nbad} malformed N-Quads line(s)"
                    )
                # the source marks the default graph '' ; the quads
                # store's convention is graph IS NULL — map at the
                # boundary or default-graph rows land in a phantom
                # named graph the default-graph queries never see
                tri = tri.withColumn(
                    "graph",
                    F.when(F.col("graph") == "", F.lit(None).cast("string"))
                    .otherwise(F.col("graph")),
                )
            else:
                from ..sources.turtle import load_turtle

                tri = load_turtle(quads.sparkSession, path)
        except Exception:
            if silent:
                return quads
            raise
        if "graph" in tri.columns and g is None:
            # a quads source (TriG) carries its own graph attribution;
            # INTO GRAPH overrides it below
            new = tri.select("subj", "pred", "obj", "graph")
        else:
            new = tri.select(
                "subj", "pred", "obj",
                F.lit(g).cast("string").alias("graph"))
        return quads.unionByName(new).distinct()

    raise ValueError(f"unknown graph-management verb {verb!r}")
