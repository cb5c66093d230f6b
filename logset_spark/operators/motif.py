"""GraphFrames-style motif finding over an edge DataFrame.

The reference answers structural questions about its catalog graph
("which LogSeries has a ConcreteLog that no host points at?") by
in-memory rdflib traversal; at KG scale the same questions are motif
queries — small subgraph patterns matched against a distributed edge
set.  `find_motifs` takes the GraphFrames pattern language (the de
facto public API for this on Spark) and lowers it to plain Catalyst
joins, so the physical plan is whatever AQE picks for the equi-join
chain: broadcast when a bound side is small, SMJ otherwise — never a
bespoke traversal engine.

Pattern grammar (a conjunction of `;`-separated edge terms):

    term        := ['!'] '(' [name] ')' '-[' [name] ']->' '(' [name] ')'
    (a)-[e]->(b)   directed edge from vertex a to vertex b, edge named e
    (a)-[]->(b)    anonymous edge (matched, not projected)
    (a)-[]->()     anonymous vertex (fresh existential, not projected)
    !(a)-[]->(b)   NEGATED edge: no edge a->b exists (left-anti join)

Semantics (matches GraphFrames' documented behavior):

* Repeated vertex names UNIFY — `(a)-[]->(b); (b)-[]->(a)` finds
  mutual pairs; `(a)-[]->(a)` finds self-loops.
* Edge names must be distinct; naming a negated edge is an error
  (there is no edge row to project).
* Results are BAG semantics — one output row per distinct morphism
  (per combination of matched edge rows), exactly what the equivalent
  SQL join chain returns, so every motif is DuckDB-oracle-checkable.
  Distinct edge rows in == distinct morphisms out.
* Both endpoints of a negated term must be bound by the positive
  terms: negation filters matches, it cannot generate bindings.
* A pattern whose positive terms are disconnected is a cross join —
  rejected by default (an accidental cartesian at 10^12 edges is an
  outage), opt-in via allow_cartesian=True.

Output columns, in first-appearance order: one per named vertex (the
vertex id), and for each named edge `e`, `e_<col>` for every edge
column beyond src/dst (e.g. `e_pred` when the edge set is a triple
table).  The join graph binds each term on its already-bound vertex
columns, so selectivity compounds left-to-right — order patterns
most-selective-first for the best plan, same discipline as the SPARQL
BGP compiler (operators/sparql.py), which this module deliberately
mirrors: a motif IS a BGP over (src, dst) instead of (subj, pred, obj).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(
    r"^(!?)\s*\(\s*(\w*)\s*\)\s*-\s*\[\s*(\w*)\s*\]\s*->\s*\(\s*(\w*)\s*\)$"
)


def _parse_pattern(pattern: str) -> list[tuple[bool, str, str | None, str]]:
    """-> [(negated, src_var, edge_name|None, dst_var)].  Anonymous
    vertices get fresh `__v<n>` names (never projected); anonymous
    edges get edge_name None."""
    terms = []
    fresh = [0]

    def vertex(name: str) -> str:
        if name:
            if name.startswith("__"):
                raise ValueError(f"reserved vertex name {name!r}")
            return name
        fresh[0] += 1
        return f"__v{fresh[0]}"

    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        neg, a, e, b = m.groups()
        if neg and e:
            raise ValueError(
                f"negated edge cannot be named (nothing to project): {raw!r}"
            )
        terms.append((bool(neg), vertex(a), e or None, vertex(b)))
    if not terms:
        raise ValueError("empty motif pattern")
    names = [e for _, _, e, _ in terms if e]
    if len(names) != len(set(names)):
        raise ValueError(f"duplicate edge names in pattern: {names}")
    return terms


def find_motifs(
    edges: DataFrame, pattern: str, *, allow_cartesian: bool = False
) -> DataFrame:
    """Match `pattern` against `edges` (columns src, dst + any extras).

    Returns one column per named vertex and `e_<col>` per named edge's
    extra columns, in first-appearance order.  See module docstring for
    the full semantics."""
    cols = edges.columns
    if "src" not in cols or "dst" not in cols:
        raise ValueError(f"edge frame needs src/dst columns, has {cols}")
    extras = [c for c in cols if c not in ("src", "dst")]

    terms = _parse_pattern(pattern)
    positive = [t for t in terms if not t[0]]
    negative = [t for t in terms if t[0]]
    if not positive:
        raise ValueError("motif needs at least one positive term")

    # output order: named (non-anonymous) elements by first appearance
    out_cols: list[str] = []
    for _, a, e, b in terms:
        for v in (a, b):
            if not v.startswith("__") and v not in out_cols:
                out_cols.append(v)
        if e:
            out_cols.extend(f"{e}_{c}" for c in extras)

    def term_frame(a: str, e: str | None, b: str) -> DataFrame:
        keep = [F.col("src").alias(a)]
        if b == a:  # self-loop: unify endpoints before projecting one
            return edges.where(F.col("src") == F.col("dst")).select(
                *keep,
                *(F.col(c).alias(f"{e}_{c}") for c in (extras if e else ())),
            )
        keep.append(F.col("dst").alias(b))
        if e:
            keep.extend(F.col(c).alias(f"{e}_{c}") for c in extras)
        return edges.select(*keep)

    # greedy connected ordering: always join a term sharing a bound
    # vertex; a forced cross join is rejected unless opted into
    pending = list(positive)
    first = pending.pop(0)
    acc = term_frame(first[1], first[2], first[3])
    bound = {first[1], first[3]}
    while pending:
        i = next(
            (
                j
                for j, (_, a, _, b) in enumerate(pending)
                if a in bound or b in bound
            ),
            None,
        )
        if i is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected motif pattern would cross join; pass "
                    "allow_cartesian=True if that is really intended"
                )
            i = 0
        _, a, e, b = pending.pop(i)
        t = term_frame(a, e, b)
        shared = [v for v in {a, b} if v in bound]
        acc = acc.crossJoin(t) if not shared else acc.join(t, shared)
        bound |= {a, b}

    for _, a, _, b in negative:
        for v in (a, b):
            if v not in bound:
                raise ValueError(
                    f"negated term endpoint {v!r} is not bound by any "
                    "positive term (negation filters, it cannot bind)"
                )
        if a == b:  # negated self-loop: no edge v->v
            probe = edges.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias(a)
            )
            acc = acc.join(probe, [a], "left_anti")
        else:
            probe = edges.select(
                F.col("src").alias(a), F.col("dst").alias(b)
            )
            acc = acc.join(probe, [a, b], "left_anti")

    return acc.select(*out_cols)
