"""R2RML-lite: declarative relational-to-RDF mapping compiled to
DataFrame plans.

KG construction does not stop at transcript extraction — the warehouse's
entity dictionary, and most real enrichment sources, are TABLES.  The
W3C's R2RML answers "how do rows become triples" declaratively; this
module implements the useful core as plain dataclasses compiled to a
union of column projections, so the mapping executes as whatever plan
Catalyst picks (template minting is concat/format — codegen'd, no
Python in the row path) and any mapped triple set is oracle-checkable
by replaying the same templates in SQL.

Supported (the R2RML core, spelled Python-side):

  TriplesMap(table, subject, pos, where=None)
      subject:  a Template for the row's subject term
      pos:      [(predicate, object_spec), ...] — predicate is a
                constant string; object_spec is Col / Template / Const
                / Ref
      where:    optional SQL boolean expression filtering source rows
                (rr:logicalTable with a SQL view, the lite spelling)
  Col(name)          object = the column's value, cast to string
  Template("o:{k}")  object/subject = template with {col} substitutions
  Const("x")         object = constant term
  Ref(parent_table, child_col, parent_col, parent_subject)
      object = the PARENT map's subject for rows joined on
      child_col = parent_col (rr:RefObjectMap / rr:joinCondition) —
      the foreign-key-to-edge rule that turns a star schema into a
      graph.  Compiled to an equi-join; broadcast when the parent is
      dimension-sized is Catalyst/AQE's call.

NULL semantics per the R2RML spec: a term map referencing a NULL column
generates NO triple (the row is skipped for that predicate-object map
only); a NULL in the subject template skips the whole row.

Scale shape: each (predicate, object) map is one projection of the
source scan — the union is linear in mapped triples, column-pruned per
map; Ref maps add one equi-join each.  Nothing here shuffles except
those joins and an optional final distinct.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TPL = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


@dataclass(frozen=True)
class Col:
    name: str


@dataclass(frozen=True)
class Template:
    text: str

    def columns(self) -> list[str]:
        return _TPL.findall(self.text)


@dataclass(frozen=True)
class Const:
    value: str


@dataclass(frozen=True)
class Ref:
    parent_table: str
    child_col: str
    parent_col: str
    parent_subject: "Template"


@dataclass(frozen=True)
class TriplesMap:
    table: str
    subject: Template
    pos: tuple = field(default_factory=tuple)  # ((pred, spec), ...)
    where: str | None = None


def _template_col(tpl: Template):
    """Template -> (string Column, not-null guard Column).  Built from
    concat of literal segments and cast columns; the guard is the AND
    of referenced columns' NOT NULL (concat would nullify the whole
    term anyway — the guard makes the spec's skip rule explicit and
    keeps the filter pushable)."""
    parts: list = []
    last = 0
    cols = []
    for m in _TPL.finditer(tpl.text):
        if m.start() > last:
            parts.append(F.lit(tpl.text[last:m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        cols.append(m.group(1))
        last = m.end()
    if last < len(tpl.text):
        parts.append(F.lit(tpl.text[last:]))
    if not parts:
        parts = [F.lit("")]
    guard = F.lit(True)
    for c in cols:
        guard = guard & F.col(c).isNotNull()
    return F.concat(*parts), guard


def r2rml_map(
    tables: dict[str, DataFrame],
    maps: list[TriplesMap],
    deduplicate: bool = True,
) -> DataFrame:
    """Execute TriplesMaps against `tables` -> DataFrame[subj, pred,
    obj].  deduplicate=True applies the RDF set semantics (one distinct
    at the end — the only full shuffle); False keeps the raw union for
    callers that dedup later in a wider pipeline."""
    outs = []
    for tm in maps:
        if tm.table not in tables:
            raise ValueError(f"unknown table {tm.table!r} in TriplesMap")
        src = tables[tm.table]
        if tm.where:
            src = src.where(F.expr(tm.where))
        subj_col, subj_guard = _template_col(tm.subject)
        for pred, spec in tm.pos:
            if isinstance(spec, Col):
                obj_col = F.col(spec.name).cast("string")
                guard = subj_guard & F.col(spec.name).isNotNull()
                row = src
            elif isinstance(spec, Template):
                obj_col, og = _template_col(spec)
                guard = subj_guard & og
                row = src
            elif isinstance(spec, Const):
                obj_col, guard, row = F.lit(spec.value), subj_guard, src
            elif isinstance(spec, Ref):
                if spec.parent_table not in tables:
                    raise ValueError(
                        f"unknown parent table {spec.parent_table!r} in Ref"
                    )
                pcol, pguard = _template_col(spec.parent_subject)
                parent = tables[spec.parent_table].select(
                    F.col(spec.parent_col).alias("__r2rml_pk"),
                    pcol.alias("__r2rml_psub"),
                ).where(pguard)
                row = src.join(
                    parent,
                    src[spec.child_col] == parent["__r2rml_pk"],
                )
                obj_col = F.col("__r2rml_psub")
                guard = subj_guard & F.col(spec.child_col).isNotNull()
            else:
                raise TypeError(f"unsupported object spec {spec!r}")
            outs.append(
                row.where(guard).select(
                    subj_col.alias("subj"),
                    F.lit(pred).alias("pred"),
                    obj_col.alias("obj"),
                )
            )
    if not outs:
        raise ValueError("no TriplesMaps given")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.distinct() if deduplicate else out
