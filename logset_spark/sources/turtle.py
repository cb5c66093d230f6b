"""Tiny Turtle (.ttl) emitter/parser for golden-file parity only.

The reference's catalog files are Turtle serialized by rdflib
(PK:src/graph.py Graph.serialize(format='turtle')).  At scale our graph
lives in partitioned parquet (tableio.py); Turtle exists here solely so
toy-scale goldens can be rendered/compared in the reference's own format.
Deliberately minimal: one `subj pred obj .` statement per line, N-Triples-ish
subset of Turtle, sorted for determinism.  NOT a general Turtle parser.
"""

from __future__ import annotations

import re

import pandas as pd


_CTRL = re.compile("[\x00-\x1f\x7f\x85\u2028\u2029]")


def _term(value: str) -> str:
    """URIs (contain a ':' prefix we mint) -> <uri>; else a quoted literal.
    Control/line-separator chars are \\uXXXX-escaped (N-Triples canon) so
    one statement is always exactly one physical line."""
    if re.match(r"^[A-Za-z][\w-]*:\S+$", value):
        return f"<{value}>"
    escaped = value.replace("\\", "\\\\").replace('"', '\\"')
    escaped = _CTRL.sub(lambda m: f"\\u{ord(m.group()):04X}", escaped)
    return f'"{escaped}"'


def to_turtle(triples: pd.DataFrame) -> str:
    """triples: DataFrame[subj, pred, obj] -> deterministic Turtle text."""
    rows = triples[["subj", "pred", "obj"]].drop_duplicates()
    rows = rows.sort_values(["subj", "pred", "obj"])
    lines = [
        f"{_term(s)} <{p}> {_term(o)} ."
        for s, p, o in rows.itertuples(index=False)
    ]
    return "\n".join(lines) + "\n"


_ESCAPE = re.compile(r'\\(u[0-9A-Fa-f]{4}|["\\])')


def _unescape(lit: str) -> str:
    return _ESCAPE.sub(
        lambda m: chr(int(m.group(1)[1:], 16))
        if m.group(1).startswith("u")
        else m.group(1),
        lit,
    )


_LINE = re.compile(
    r'^(<(?P<s>[^>]+)>)\s+<(?P<p>[^>]+)>\s+'
    r'(<(?P<o_uri>[^>]+)>|"(?P<o_lit>(?:[^"\\]|\\.)*)")\s*\.$'
)


def from_turtle(text: str) -> pd.DataFrame:
    """Parse the subset emitted by to_turtle back into a triple frame."""
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE.match(line)
        if not m:
            raise ValueError(f"unparseable turtle line: {line!r}")
        obj = m.group("o_uri")
        if obj is None:
            obj = _unescape(m.group("o_lit"))
        rows.append((m.group("s"), m.group("p"), obj))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"])
