"""logset_spark — a from-scratch, PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of NERSC/LogSet.

The reference (NERSC/LogSet) is a single-process rdflib/Turtle catalog
builder (see SURVEY.md §0-1; /root/reference was empty at survey time, so
reference loci are public-repo file-level pointers `PK:src/graph.py`,
`PK:src/handcoded.py`, `PK:etc/logset#.ttl`).  This package re-expresses its
data model Spark-first:

* an RDF graph (bag of triples) is a DataFrame[subj, pred, obj, ...]
* hand-coded entity emitters  -> vectorized extraction over transcripts
* rdflib SPARQL               -> Spark SQL / DataFrame plans (Catalyst)
* Turtle catalog files        -> partitioned parquet/Iceberg triple tables

Layout (SURVEY.md §7):
    sources/    synth transcript generator, TableIO seam, Turtle golden I/O
    operators/  extract, link, canonicalize (CC), materialize, dedup, ANN,
                as-of, sessionize, text-stats, multimodal plumbing
    functions/  column-kit helpers (normalization, hashing, vectors)
    plans/      explain/plan-inspection helpers
    streaming/  incremental (availableNow) ingest mirror of the batch path
"""

__version__ = "0.1.0"
