"""SHACL-subset shape validation over the triples DataFrame.

LogSet catalogs are schema'd data: every ConcreteLog needs a
describedBy, every LogSeries a validity interval — the reference
enforces this shape implicitly in its build code.  This module makes
the contract explicit and checkable at warehouse scale: shapes are
declared as triples (the W3C SHACL vocabulary, loadable from a .ttl
file through this engine's own Turtle parser — anonymous property
shapes `[ sh:path ...; sh:minCount 1 ]` and `sh:in (a b c)` collections
included), compiled once on the driver (shapes are metadata-scale),
and validated as a DataFrame plan over the instance graph.

Subset (constraints that matter for a transcript KG; anything else in
the shapes graph is rejected loudly — a validator that silently skips
a constraint certifies garbage):

    node shapes:  sh:targetClass C      focus = { s | s rdf:type C }
                  sh:targetSubjectsOf p focus = { s | s p ? }
    property shapes (sh:property [ sh:path p ; ... ]):
                  sh:minCount n   focus with fewer than n p-values
                  sh:maxCount n   focus with more than n p-values
                  sh:pattern 're' p-values not matching the regex
                  sh:in (v ...)   p-values outside the list
                  sh:class C      p-values lacking rdf:type C
                  sh:hasValue v   focus with no p-value equal to v
                  sh:minLength n  p-values shorter than n characters
                  sh:maxLength n  p-values longer than n characters
                  sh:nodeKind k   p-values of the wrong kind, where
                                  k ∈ {sh:IRI, sh:Literal, sh:BlankNode}
                                  decided by this engine's term shapes:
                                  `_:` = blank node, `prefix:rest` = IRI
                                  (save_turtle's is_uri test), else
                                  literal

`sh:path` takes a plain predicate, an `[ sh:inversePath p ]` node
(focus validated against the nodes that REACH it — "every customer has
at most N orders"), or a `( p1 p2 ... )` sequence list (values at the
end of the hop chain, one pruned scan + equi-join per hop, value-node
set deduped per SHACL semantics).  Richer path algebra
(alternation/closure) stays outside the subset and is rejected
loudly.  Both the full SHACL IRIs and the bare `sh:` prefixed
spellings are accepted.

Returns a violations DataFrame (focus, shape, path, constraint,
value) — empty means conformant.  Per constraint the plan is a
filtered, column-pruned scan plus at most one aggregation or one
anti-join; value-level checks never shuffle the graph (the constraint
side is a literal or an ontology-scale broadcast).  Count constraints
aggregate only the single predicate's rows — on a pred-partitioned
(vertical) layout that scan prunes to one partition.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHACL_NS = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "rdf:type"
_FIRST, _REST, _NIL = "rdf:first", "rdf:rest", "rdf:nil"


def _sh_local(term: str) -> str | None:
    """`http://www.w3.org/ns/shacl#X` or `sh:X` -> `X` (else None)."""
    for head in (SHACL_NS, "sh:"):
        if term.startswith(head):
            return term[len(head):]
    return None


@dataclass
class PropertyShape:
    path: str                       # display form: p | ^p | p1/p2/...
    path_kind: str = "direct"       # direct | inverse | sequence
    path_seq: list[str] | None = None  # inverse target / sequence hops
    min_count: int | None = None
    max_count: int | None = None
    pattern: str | None = None
    in_values: list[str] | None = None
    class_: str | None = None
    has_value: str | None = None
    min_length: int | None = None
    max_length: int | None = None
    node_kind: str | None = None  # local name: IRI | Literal | BlankNode


@dataclass
class SparqlConstraint:
    select: str           # sh:select query text; must bind ?this
    message: str | None   # sh:message, reported in the `value` column


@dataclass
class NodeShape:
    name: str
    target_class: str | None = None
    target_subjects_of: str | None = None
    properties: list[PropertyShape] = field(default_factory=list)
    sparql: list[SparqlConstraint] = field(default_factory=list)


def compile_shapes(shape_triples) -> list[NodeShape]:
    """Compile a shapes graph (list of (s, p, o) or a small DataFrame)
    into NodeShape specs.  Driver-side on purpose: a shapes graph is
    metadata (dozens of rows), the same class of input as the RDFS
    ontology in operators/inference.py."""
    if isinstance(shape_triples, DataFrame):
        shape_triples = [
            (r["subj"], r["pred"], r["obj"])
            for r in shape_triples.select("subj", "pred", "obj").collect()
        ]
    by_subj: dict[str, list[tuple[str, str]]] = {}
    for s, p, o in shape_triples:
        by_subj.setdefault(s, []).append((p, o))

    def rdf_list(head: str) -> list[str]:
        out, seen = [], set()
        while head != _NIL:
            if head in seen:
                raise ValueError(f"cyclic rdf:List at {head}")
            seen.add(head)
            props = dict(by_subj.get(head, ()))
            if _FIRST not in props or _REST not in props:
                raise ValueError(f"malformed rdf:List node {head}")
            out.append(props[_FIRST])
            head = props[_REST]
        return out

    def prop_shape(node: str) -> PropertyShape:
        ps = PropertyShape(path="")
        for p, o in by_subj.get(node, ()):
            loc = _sh_local(p)
            if loc == "path":
                # only a BLANK path object can be a path construct; an
                # IRI predicate that happens to be described elsewhere
                # in the shapes graph is still a plain sh:path
                o_props = (
                    dict(by_subj.get(o, ())) if o.startswith("_:") else {}
                )
                inv = next((v for k, v in o_props.items()
                            if _sh_local(k) == "inversePath"), None)
                if inv is not None:
                    # sh:path [ sh:inversePath p ] — focus is the OBJECT
                    ps.path_kind = "inverse"
                    ps.path_seq = [inv]
                    ps.path = f"^{inv}"
                elif _FIRST in o_props:
                    # sh:path ( p1 p2 ... ) — sequence path
                    seq = rdf_list(o)
                    if not seq:
                        raise ValueError(f"empty sh:path list at {o!r}")
                    ps.path_kind = "sequence"
                    ps.path_seq = seq
                    ps.path = "/".join(seq)
                elif o_props or not (
                    re.fullmatch(r"[^\s|/^*+?!()]+", o)
                    # a full scheme:rest IRI legitimately contains '/'
                    # (round-4 fix: `sh:path <http://x.org/p>` was
                    # rejected); SHACL spells sequence paths as RDF
                    # LISTS, never with '/', so a scheme-shaped term is
                    # always a plain predicate — other path-operator
                    # characters stay banned so an engine-style 'p+'
                    # string can never silently match nothing
                    or re.fullmatch(
                        r"[A-Za-z][A-Za-z0-9+.-]*:[^\s|^*+?!()]+", o)
                ):
                    # a bnode with properties that is neither an
                    # inversePath nor a list is some richer path
                    # construct — reject loudly, never treat the bnode
                    # label as a predicate
                    raise ValueError(
                        f"sh:path takes a plain predicate, an "
                        f"[ sh:inversePath p ] node, or a ( p1 p2 ... ) "
                        f"sequence list; got {o!r}")
                else:
                    ps.path = o
            elif loc == "minCount":
                ps.min_count = int(o)
            elif loc == "maxCount":
                ps.max_count = int(o)
            elif loc == "pattern":
                ps.pattern = o
            elif loc == "in":
                ps.in_values = rdf_list(o)
            elif loc == "class":
                ps.class_ = o
            elif loc == "hasValue":
                ps.has_value = o
            elif loc == "minLength":
                ps.min_length = int(o)
            elif loc == "maxLength":
                ps.max_length = int(o)
            elif loc == "nodeKind":
                kind = _sh_local(o) or o
                if kind not in ("IRI", "Literal", "BlankNode"):
                    raise ValueError(
                        f"unsupported sh:nodeKind {o!r} — supported: "
                        "sh:IRI, sh:Literal, sh:BlankNode (the compound "
                        "kinds are outside the subset)")
                ps.node_kind = kind
            else:
                raise ValueError(
                    f"unsupported SHACL constraint {p!r} on {node!r} — "
                    "supported: path/minCount/maxCount/pattern/in/class/"
                    "hasValue/minLength/maxLength/nodeKind")
        if not ps.path:
            raise ValueError(f"property shape {node!r} has no sh:path")
        return ps

    def sparql_constraint(node: str) -> SparqlConstraint:
        """SHACL-SPARQL constraint component (sh:sparql [ sh:select
        "..." ; sh:message "..." ]): the SELECT must project ?this —
        each solution's ?this is a violating focus node."""
        select, message = None, None
        for p, o in by_subj.get(node, ()):
            loc = _sh_local(p)
            if loc == "select":
                select = o
            elif loc == "message":
                message = o
            elif loc in ("prefixes",):
                raise ValueError(
                    "sh:prefixes is outside the subset — inline PREFIX "
                    "headers in the sh:select text instead")
            else:
                raise ValueError(
                    f"unsupported term {p!r} on sh:sparql node {node!r}")
        if not select:
            raise ValueError(f"sh:sparql node {node!r} has no sh:select")
        if "?this" not in select and "$this" not in select:
            raise ValueError(
                f"sh:select on {node!r} never mentions ?this — every "
                "solution must identify its violating focus node")
        return SparqlConstraint(select=select.replace("$this", "?this"),
                                message=message)

    shapes: list[NodeShape] = []
    for s, pos in by_subj.items():
        if not any(p == RDF_TYPE and _sh_local(o) == "NodeShape"
                   for p, o in pos):
            continue
        ns = NodeShape(name=s)
        for p, o in pos:
            loc = _sh_local(p)
            if p == RDF_TYPE or loc is None:
                continue  # the type row / non-SHACL annotation triples
            if loc == "targetClass":
                ns.target_class = o
            elif loc == "targetSubjectsOf":
                ns.target_subjects_of = o
            elif loc == "property":
                ns.properties.append(prop_shape(o))
            elif loc == "sparql":
                ns.sparql.append(sparql_constraint(o))
            else:
                raise ValueError(
                    f"unsupported SHACL term {p!r} on shape {s!r}")
        if ns.target_class is None and ns.target_subjects_of is None:
            raise ValueError(f"shape {s!r} declares no target")
        if not ns.properties and not ns.sparql:
            raise ValueError(
                f"shape {s!r} has no sh:property/sh:sparql constraints")
        shapes.append(ns)
    if not shapes:
        raise ValueError("shapes graph declares no sh:NodeShape")
    return shapes


_VIOLATION_COLS = ("focus", "shape", "path", "constraint", "value")


def _path_values(graph: DataFrame, ps: PropertyShape) -> DataFrame:
    """(focus, value) pairs reachable via the property shape's path.

    direct keeps the historical row-per-triple extraction (the graph is
    a set of triples, so no dedup is needed and no shuffle is added);
    inverse/sequence paths return the DISTINCT value-node set per SHACL
    semantics (a sequence can reach one value node through several
    intermediates, and counting routes instead of nodes would corrupt
    minCount/maxCount)."""
    if ps.path_kind == "inverse":
        return (
            graph.where(F.col("pred") == ps.path_seq[0])
            .select(F.col("obj").alias("focus"), F.col("subj").alias("value"))
            .distinct()
        )
    if ps.path_kind == "sequence":
        cur = graph.where(F.col("pred") == ps.path_seq[0]).select(
            F.col("subj").alias("focus"), F.col("obj").alias("value")
        )
        for hop in ps.path_seq[1:]:
            nxt = graph.where(F.col("pred") == hop).select(
                F.col("subj").alias("value"), F.col("obj").alias("_next")
            )
            cur = cur.join(nxt, "value").select(
                "focus", F.col("_next").alias("value")
            )
        return cur.distinct()
    return graph.where(F.col("pred") == ps.path).select(
        F.col("subj").alias("focus"), F.col("obj").alias("value")
    )


def validate(
    graph: DataFrame, shapes, focus_scope: DataFrame | None = None,
) -> DataFrame:
    """Validate `graph` (subj, pred, obj triples) against `shapes`
    (a shapes-graph DataFrame / triple list, or pre-compiled
    [NodeShape]).  Returns violations (focus, shape, path, constraint,
    value); empty = conformant.

    focus_scope (optional): a one-column DataFrame of node names; every
    shape's focus set is narrowed to it (semi-join) BEFORE any
    constraint work.  This is the INCREMENTAL validation hook: after a
    delta lands, pass the delta's subjects and only touched nodes are
    re-checked — but each is checked against the FULL graph, so
    count-family constraints see true cardinalities (validating a delta
    in isolation would see partial counts and certify garbage).  The
    narrowing reaches the scans through the semi-joins, so constraint
    work scales with the delta, not the graph."""
    if not (isinstance(shapes, list) and shapes
            and isinstance(shapes[0], NodeShape)):
        shapes = compile_shapes(shapes)
    if focus_scope is not None:
        if len(focus_scope.columns) != 1:
            raise ValueError(
                "focus_scope must have exactly one column of node names")
        focus_scope = focus_scope.select(
            F.col(focus_scope.columns[0]).alias("focus")
        ).distinct()
    spark = graph.sparkSession
    parts: list[DataFrame] = []

    def viol(df, shape, path, constraint, value_col=None):
        v = value_col if value_col is not None else F.lit(None).cast("string")
        parts.append(df.select(
            F.col("focus"),
            F.lit(shape).alias("shape"),
            F.lit(path).alias("path"),
            F.lit(constraint).alias("constraint"),
            v.alias("value"),
        ))

    for ns in shapes:
        if ns.target_class is not None:
            focus = graph.where(
                (F.col("pred") == RDF_TYPE) & (F.col("obj") == ns.target_class)
            ).select(F.col("subj").alias("focus")).distinct()
        else:
            focus = graph.where(
                F.col("pred") == ns.target_subjects_of
            ).select(F.col("subj").alias("focus")).distinct()
        if focus_scope is not None:
            focus = focus.join(focus_scope, "focus", "left_semi")
        for ps in ns.properties:
            vals = _path_values(graph, ps).join(focus, "focus", "left_semi")
            if ps.min_count is not None or ps.max_count is not None \
                    or ps.has_value is not None:
                # one aggregation serves all three count-family checks
                agg = vals.groupBy("focus").agg(
                    F.count("*").alias("_n"),
                    F.max((F.col("value") == ps.has_value).cast("int"))
                    .alias("_hit") if ps.has_value is not None
                    else F.lit(1).alias("_hit"),
                )
                cnt = focus.join(agg, "focus", "left").select(
                    "focus",
                    F.coalesce("_n", F.lit(0)).alias("_n"),
                    F.coalesce("_hit", F.lit(0)).alias("_hit"),
                )
                if ps.min_count is not None:
                    viol(cnt.where(F.col("_n") < ps.min_count), ns.name,
                         ps.path, "minCount",
                         F.col("_n").cast("string"))
                if ps.max_count is not None:
                    viol(cnt.where(F.col("_n") > ps.max_count), ns.name,
                         ps.path, "maxCount",
                         F.col("_n").cast("string"))
                if ps.has_value is not None:
                    viol(cnt.where(F.col("_hit") == 0), ns.name, ps.path,
                         "hasValue", F.lit(ps.has_value))
            if ps.pattern is not None:
                viol(vals.where(~F.col("value").rlike(ps.pattern)),
                     ns.name, ps.path, "pattern", F.col("value"))
            if ps.min_length is not None:
                viol(vals.where(F.length("value") < ps.min_length),
                     ns.name, ps.path, "minLength", F.col("value"))
            if ps.max_length is not None:
                viol(vals.where(F.length("value") > ps.max_length),
                     ns.name, ps.path, "maxLength", F.col("value"))
            if ps.node_kind is not None:
                is_bnode = F.col("value").startswith("_:")
                is_iri = (
                    F.col("value").rlike(r"^[A-Za-z][A-Za-z0-9_-]*:[^\s]+$")
                    & ~is_bnode
                )
                ok = {
                    "IRI": is_iri,
                    "BlankNode": is_bnode,
                    "Literal": ~is_iri & ~is_bnode,
                }[ps.node_kind]
                viol(vals.where(~ok), ns.name, ps.path,
                     "nodeKind", F.col("value"))
            if ps.in_values is not None:
                viol(vals.where(~F.col("value").isin(ps.in_values)),
                     ns.name, ps.path, "in", F.col("value"))
            if ps.class_ is not None:
                typed = graph.where(
                    (F.col("pred") == RDF_TYPE) & (F.col("obj") == ps.class_)
                ).select(F.col("subj").alias("_typed_value")).distinct()
                viol(
                    vals.join(
                        typed,
                        vals["value"] == typed["_typed_value"],
                        "left_anti"),
                    ns.name, ps.path, "class", F.col("value"))
        for sc in ns.sparql:
            # SHACL-SPARQL: the spec evaluates the SELECT with $this
            # pre-bound per focus node; over a DataFrame engine the
            # equivalent (and distributed) lowering runs the query ONCE
            # over the whole graph and SEMI-JOINS its ?this column with
            # the focus set — per-focus re-execution would be a
            # driver-side loop over data.
            from .sparql import sparql as _sparql

            res = _sparql(graph.select("subj", "pred", "obj"), sc.select)
            if "this" not in res.columns:
                raise ValueError(
                    f"sh:select on shape {ns.name!r} does not project "
                    f"?this (columns: {res.columns})")
            hits = res.select(F.col("this").alias("focus")).distinct() \
                      .join(focus, "focus", "left_semi")
            viol(hits, ns.name, "sh:sparql", "sparql",
                 F.lit(sc.message or sc.select[:80]))
    if not parts:
        return spark.createDataFrame(
            [], "focus string, shape string, path string, "
                "constraint string, value string")
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out
