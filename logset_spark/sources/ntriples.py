"""Distributed N-Triples / N-Quads source and sink.

The Turtle path (sources/turtle.py) parses on the driver BY DESIGN —
catalogs are metadata-scale and the grammar is recursive.  N-Triples/
N-Quads is the opposite case: the bulk RDF interchange format is
strictly LINE-based (one statement per line, no prefixes, no state
across lines), which is exactly the shape Spark's text source
parallelizes — so a 100 TB .nt dump ingests as a distributed scan with
native regexp term extraction, no Python anywhere.

Subset and conventions (matching this engine's term model):

* `<iri>` terms are stored WITHOUT the angle brackets (full IRI
  string); `_:label` blank nodes pass through; `"literal"` objects are
  stored as their BARE lexical form with `^^<datatype>` / `@lang`
  dropped — the same convention the Turtle parser applies (its module
  docstring), so .nt and .ttl loads of the same data agree.
* String escapes `\\"` `\\\\` `\\n` `\\t` `\\r` are decoded natively
  (literal-replace chain, placeholder first so `\\\\n` decodes to
  backslash-n, not newline).  Literals carrying OTHER escapes (incl.
  `\\uXXXX`) are QUARANTINED loudly, not half-decoded.
* Comment (`#`) and blank lines are skipped; anything else that fails
  the statement grammar lands in the quarantine frame with the raw
  line — the jsonl/csv source discipline (corrupt input is data about
  the pipeline, never silently dropped).
* N-Quads: an optional 4th term names the graph; from_nquads returns
  (subj, pred, obj, graph) with '' for the default graph.

The sink mirrors the reader: IRI-shaped terms (the engine's
`prefix:rest` test, same as the Turtle emitter) get brackets, `_:`
passes, everything else is quoted with the inverse escape chain.
Deterministic per row => the write is idempotent; text lines land
distributed (one shard per partition), never through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one statement:  subj  pred  obj  [graph]  .
_TERM_S = r"(<[^<>\s]*>|_:\S+)"
_TERM_P = r"(<[^<>\s]*>)"
_TERM_O = r"""(<[^<>\s]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^<>\s]*>|@[A-Za-z0-9-]+)?)"""
_LINE_NT = rf"^\s*{_TERM_S}\s+{_TERM_P}\s+{_TERM_O}\s*\.\s*$"
_LINE_NQ = rf"^\s*{_TERM_S}\s+{_TERM_P}\s+{_TERM_O}(?:\s+{_TERM_S})?\s*\.\s*$"

_PLACEHOLDER = "\x00"


def _decode_literal(col):
    """Quoted-literal column -> bare lexical form with escapes decoded.
    Placeholder trick keeps double-backslash from cascading."""
    inner = F.regexp_extract(col, r'^"((?:[^"\\]|\\.)*)"', 1)
    out = F.replace(inner, F.lit("\\\\"), F.lit(_PLACEHOLDER))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    return F.replace(out, F.lit(_PLACEHOLDER), F.lit("\\"))


def _decode_term(col):
    """<iri> -> iri (well-known rdf/rdfs/owl IRIs folded to the
    engine's canonical short spelling, same as the Turtle parser);
    _:b -> _:b;  "lit"[^^dt|@lang] -> decoded lexical."""
    from ..operators.rdflist import vocab_canon

    is_iri = col.startswith("<")
    is_lit = col.startswith('"')
    return (
        F.when(
            is_iri,
            vocab_canon(col.substr(F.lit(2), F.length(col) - F.lit(2))),
        )
        .when(is_lit, _decode_literal(col))
        .otherwise(col)
    )


def _read_lines(spark, path: str, pattern: str, n_terms: int) -> DataFrame:
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    content = lines.where(
        (F.trim("line") != "") & ~F.trim(F.col("line")).startswith("#")
    )
    terms = [
        F.regexp_extract("line", pattern, i + 1).alias(f"t{i}")
        for i in range(n_terms)
    ]
    parsed = content.select("line", F.col("line").rlike(pattern).alias("_ok"), *terms)
    # undecodable escape in the object literal -> quarantine, not
    # mangle.  Tokenized full-match: every backslash must START a
    # supported escape (a per-char scan would misread the char AFTER a
    # double-backslash as an escape head).
    bad_escape = F.col("t2").startswith('"') & ~F.col("t2").rlike(
        r'^"(?:[^"\\]|\\["\\ntr])*"'
    )
    # IRIREF positions allow UCHAR (\uXXXX / \UXXXXXXXX) per the
    # N-Triples grammar; this decoder does not decode them, so a
    # bracketed IRI term carrying ANY backslash is quarantined rather
    # than stored raw-and-undecoded (ADVICE r03: the old check only
    # inspected the object literal).
    for i in range(n_terms):
        t = F.col(f"t{i}")
        bad_escape = bad_escape | (t.startswith("<") & t.contains("\\"))
    return parsed.select(
        "line", "_ok",
        (F.col("_ok") & bad_escape).alias("_bad_escape"),
        *[f"t{i}" for i in range(n_terms)],
    )


def _split(parsed: DataFrame, n_terms: int) -> tuple[DataFrame, DataFrame]:
    good = parsed.where(F.col("_ok") & ~F.col("_bad_escape"))
    bad = parsed.where(~F.col("_ok") | F.col("_bad_escape")).select(
        "line",
        F.when(F.col("_bad_escape"), "unsupported_escape")
        .otherwise("malformed_statement")
        .alias("reason"),
    )
    return good, bad


# XSD numeric datatypes whose lexical forms order numerically (the
# SPARQL operator-mapping numeric tower); short-form tags after the
# namespace fold below.
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"
_NUMERIC_XSD = [
    "xsd:integer", "xsd:decimal", "xsd:double", "xsd:float", "xsd:long",
    "xsd:int", "xsd:short", "xsd:byte", "xsd:nonNegativeInteger",
    "xsd:nonPositiveInteger", "xsd:negativeInteger",
    "xsd:positiveInteger", "xsd:unsignedLong", "xsd:unsignedInt",
    "xsd:unsignedShort", "xsd:unsignedByte",
]


def _typed_cols(obj_raw, obj_lex):
    """(raw object term, decoded lexical) -> [obj_dt, obj_num] columns.

    TYPED-LITERAL SHADOW COLUMNS (VERDICT r04 §What's missing 1
    prototype): the engine's term model stays untyped strings, but the
    parse is the one place the datatype is still visible — so emit it
    as metadata: obj_dt = the datatype tag (xsd:... short form, null
    for plain/lang-tagged/non-literal), obj_num = the double value for
    numeric xsd datatypes (try_cast: a malformed lexical under a
    numeric datatype yields null rather than poisoning the scan).
    SPARQL numeric FILTER comparisons prefer obj_num when present
    (operators/sparql.py), closing the '\"9\" > \"10\" lexically'
    divergence from rdflib for typed data."""
    dt_raw = F.regexp_extract(obj_raw, r"\^\^<([^<>\s]*)>$", 1)
    dt = F.when(
        dt_raw == "", F.lit(None).cast("string")
    ).otherwise(F.regexp_replace(dt_raw, f"^{_XSD_NS}", "xsd:"))
    num = F.when(
        dt.isin(_NUMERIC_XSD), obj_lex.try_cast("double")
    ).otherwise(F.lit(None).cast("double"))
    return [dt.alias("obj_dt"), num.alias("obj_num")]


def from_ntriples(
    spark, path: str, typed: bool = False
) -> tuple[DataFrame, DataFrame]:
    """.nt file(s) -> (triples[subj, pred, obj], quarantine[line, reason]).

    typed=True appends the obj_dt/obj_num shadow columns (_typed_cols);
    subj/pred/obj stay byte-identical to the untyped load."""
    parsed = _read_lines(spark, path, _LINE_NT, 3)
    good, bad = _split(parsed, 3)
    obj = _decode_term(F.col("t2"))
    extra = _typed_cols(F.col("t2"), obj) if typed else []
    return (
        good.select(
            _decode_term(F.col("t0")).alias("subj"),
            _decode_term(F.col("t1")).alias("pred"),
            obj.alias("obj"),
            *extra,
        ),
        bad,
    )


def from_nquads(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """.nq file(s) -> (quads[subj, pred, obj, graph], quarantine).
    graph = '' for default-graph statements."""
    parsed = _read_lines(spark, path, _LINE_NQ, 4)
    good, bad = _split(parsed, 4)
    return (
        good.select(
            _decode_term(F.col("t0")).alias("subj"),
            _decode_term(F.col("t1")).alias("pred"),
            _decode_term(F.col("t2")).alias("obj"),
            F.when(F.col("t3") == "", F.lit("")).otherwise(
                _decode_term(F.col("t3"))
            ).alias("graph"),
        ),
        bad,
    )


def _encode_literal(col):
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.concat(F.lit('"'), out, F.lit('"'))


def _encode_term(col):
    """Inverse of _decode_term under the engine's term shapes: IRI-shaped
    (prefix:rest, the Turtle emitter's is_uri test) -> <...>; _: ->
    verbatim; else quoted literal.

    Known ambiguity (ADVICE r03, inherent to the untyped bare-string
    term model): a LITERAL whose lexical value happens to be
    scheme:rest-shaped ("mailto:x", "a:b") is indistinguishable from an
    IRI term here and is emitted bracketed, so it round-trips through
    to_ntriples/from_ntriples as an IRI — a silent term-category
    change.  The engine stores no term-kind provenance that could
    disambiguate; pinned by test_colon_shaped_literal_ambiguity."""
    is_bnode = col.startswith("_:")
    is_iri = col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:\S+$") & ~is_bnode
    return (
        F.when(is_bnode, col)
        .when(is_iri, F.concat(F.lit("<"), col, F.lit(">")))
        .otherwise(_encode_literal(col))
    )


def _encode_pred(col):
    """Predicates are IRIs by definition — always bracketed, so the
    engine's bare predicate tokens (hasTurn, usedTool) round-trip as
    <hasTurn> instead of being misemitted as quoted literals."""
    return F.concat(F.lit("<"), col, F.lit(">"))


def to_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """triples[subj, pred, obj] -> distributed .nt text shards."""
    triples.select(
        F.concat_ws(
            " ",
            _encode_term(F.col("subj")),
            _encode_pred(F.col("pred")),
            _encode_term(F.col("obj")),
            F.lit("."),
        ).alias("value")
    ).write.mode(mode).text(path)


def to_nquads(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    """quads[subj, pred, obj, graph] -> .nq shards ('' graph = default)."""
    g = F.when(F.col("graph") == "", F.lit(None)).otherwise(
        _encode_term(F.col("graph"))
    )
    quads.select(
        F.concat_ws(
            " ",
            _encode_term(F.col("subj")),
            _encode_pred(F.col("pred")),
            _encode_term(F.col("obj")),
            g,
            F.lit("."),
        ).alias("value")
    ).write.mode(mode).text(path)
