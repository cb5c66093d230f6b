"""RDFS forward-chaining inference over the triples DataFrame.

LogSet's catalogs are typed by an RDFS ontology (classes like
ConcreteLog/LogSeries under a class hierarchy, properties with declared
domains/ranges — SURVEY §1.1); rdflib answers "every X, including
subclasses" by in-memory entailment.  At 10^12 triples the same
entailment is a handful of joins against ontology-scale closures — this
module materializes it as a DataFrame plan.

Rules implemented (the RDFS core that changes query answers):

    rdfs5/7   (p subPropertyOf* q), (s p o)        ->  (s q o)
    rdfs2     (p domain c),         (s p o)        ->  (s rdf:type c)
    rdfs3     (p range c),          (s p o)        ->  (o rdf:type c)
    rdfs9/11  (c subClassOf* d),    (x rdf:type c) ->  (x rdf:type d)

Rule composition order makes ONE pass complete: property generalization
first (its output feeds domain/range), then domain/range (their output
feeds the class-hierarchy walk), then type propagation up the closed
subClassOf relation.  The closures themselves ride
graph.transitive_closure (path doubling), so deep hierarchies cost
O(log depth) rounds, and both closures are ONTOLOGY-scale (dozens to
thousands of rows) — they broadcast, so every instance-side rule is a
broadcast join: the 10^12-row side never shuffles.

Documented subset: schema-about-schema entailment (subPropertyOf of
rdf:type, subClassOf of rdfs:Class metacircularity) is out of scope —
the ontology is read once, closed, and applied to instance triples; an
ontology whose schema triples are themselves derived needs a second
pass (compose the operator twice).

Vocabulary terms are the engine's prefixed-string spellings
(`rdf:type`, `rdfs:subClassOf`, ...).  Every parser/loader
canonicalizes well-known rdf/rdfs/owl full-IRI spellings to these
short forms (turtle._canon_term, ntriples vocab_canon), the SPARQL
layer folds its `<iri>` constants the same way (sparql._const_term),
and each rule entry point re-applies vocab_canon_triples as a belt —
so catalogs and queries written against the rdflib namespaces land
exactly here whether or not they declared the prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"
SUBCLASS = "rdfs:subClassOf"
SUBPROP = "rdfs:subPropertyOf"
DOMAIN = "rdfs:domain"
RANGE = "rdfs:range"

_SCHEMA_PREDS = (SUBCLASS, SUBPROP, DOMAIN, RANGE)


def _closure_reflexive(edges: DataFrame) -> DataFrame:
    """subClassOf*/subPropertyOf* — the transitive closure PLUS the
    identity pair for every mentioned term (RDFS entailment keeps the
    asserted triple: p subPropertyOf* p).  Ontology-scale input."""
    from .graph import transitive_closure

    closed = transitive_closure(edges).select("node", "ancestor")
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    return closed.unionByName(
        nodes.select("node", F.col("node").alias("ancestor"))
    ).distinct()


def rdfs_materialize(triples: DataFrame) -> DataFrame:
    """Asserted + RDFS-entailed triples, DISTINCT (a graph is a set).

    Plan shape: two ontology-scale closures (path doubling over the
    schema slice only), then four broadcast joins against the instance
    scan — the instance side is read once and never shuffled except for
    the final distinct.  Schema triples pass through unchanged."""
    from .rdflist import vocab_canon_triples

    t = vocab_canon_triples(triples)
    schema = t.where(F.col("pred").isin(list(_SCHEMA_PREDS)))

    sub_class = _closure_reflexive(
        schema.where(F.col("pred") == SUBCLASS).select(
            F.col("subj").alias("child"), F.col("obj").alias("parent")
        )
    )
    sub_prop = _closure_reflexive(
        schema.where(F.col("pred") == SUBPROP).select(
            F.col("subj").alias("child"), F.col("obj").alias("parent")
        )
    )

    # rdfs5/7 — generalize predicates up the closed subPropertyOf.
    # The reflexive closure regenerates the asserted triple too, so
    # `generalized` SUPERSEDES the instance slice for the rules below
    # (predicates outside any subPropertyOf chain ride the left join).
    inst = t.where(~F.col("pred").isin(list(_SCHEMA_PREDS)))
    generalized = (
        inst.join(
            F.broadcast(sub_prop.withColumnRenamed("node", "pred")),
            "pred", "left",
        )
        .select(
            "subj",
            F.coalesce("ancestor", "pred").alias("pred"),
            "obj",
        )
    )

    # rdfs2/3 — domain/range typing from every (asserted or
    # property-generalized) triple
    dom = schema.where(F.col("pred") == DOMAIN).select(
        F.col("subj").alias("pred"), F.col("obj").alias("cls")
    )
    rng = schema.where(F.col("pred") == RANGE).select(
        F.col("subj").alias("pred"), F.col("obj").alias("cls")
    )
    typed_dom = generalized.join(F.broadcast(dom), "pred").select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("cls").alias("obj")
    )
    typed_rng = generalized.join(F.broadcast(rng), "pred").select(
        F.col("obj").alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.col("cls").alias("obj"),
    )

    # rdfs9/11 — every type statement (asserted, generalized, or
    # domain/range-derived) walks up the closed subClassOf
    types = (
        generalized.where(F.col("pred") == RDF_TYPE)
        .unionByName(typed_dom)
        .unionByName(typed_rng)
    )
    types_up = types.join(
        F.broadcast(sub_class.withColumnRenamed("node", "obj")), "obj"
    ).select("subj", "pred", F.col("ancestor").alias("obj"))

    return (
        t.unionByName(generalized)
        .unionByName(types)
        .unionByName(types_up)
        .distinct()
    )


# ---------------------------------------------------------------------------
# OWL (RL-subset) materialization — the entity-canonicalization rules
# ---------------------------------------------------------------------------

SAME_AS = "owl:sameAs"
INVERSE_OF = "owl:inverseOf"
SYMMETRIC = "owl:SymmetricProperty"
TRANSITIVE = "owl:TransitiveProperty"
FUNCTIONAL = "owl:FunctionalProperty"
INV_FUNCTIONAL = "owl:InverseFunctionalProperty"

_OWL_PROP_CLASSES = (SYMMETRIC, TRANSITIVE, FUNCTIONAL, INV_FUNCTIONAL)

# pred/subj are joined inside one encoded closure; preds never contain
# the unit separator, asserted at entry
_SEP = "\x1f"


def owl_materialize(triples: DataFrame, passes: int = 1) -> DataFrame:
    """Asserted + OWL-entailed triples, DISTINCT — the OWL 2 RL subset
    that drives ENTITY CANONICALIZATION, which is this engine's core
    problem (north rule: "entity linking and canonicalization"; the
    reference merges duplicate nodes by hand in handcoded-equivalent
    logic; here the ontology declares the merge rules and the engine
    executes them as one DataFrame plan):

        prp-inv   (p owl:inverseOf q), (s p o)            -> (o q s)
                  and symmetrically (s q o)               -> (o p s)
        prp-symp  (p a owl:SymmetricProperty), (s p o)    -> (o p s)
        prp-trp   (p a owl:TransitiveProperty): s -p->+ o -> (s p o)
        prp-fp    (p a owl:FunctionalProperty),
                  (s p o1), (s p o2)                      -> o1 sameAs o2
        prp-ifp   (p a owl:InverseFunctionalProperty),
                  (s1 p o), (s2 p o)                      -> s1 sameAs s2
        eq-*      owl:sameAs is closed as an EQUIVALENCE (symmetric +
                  transitive, via distributed connected components) and
                  every class is REWRITTEN to its lexicographic-min
                  representative in subj/pred/obj position; the class
                  membership is emitted in CANONICAL STAR FORM —
                  (member, owl:sameAs, representative) per non-
                  representative member — not the O(class^2) pair
                  closure OWL RL's eq-sym/eq-trans would materialize.

    Plan shape at 10^12 triples: the ontology slice (inverseOf triples
    + the four property-class typings) is ontology-scale and BROADCAST
    into every instance-side rule; the transitive closure runs ONE
    path-doubling loop for all transitive predicates at once (endpoint
    keys encoded as pred<US>node so chains of different predicates can
    never join); sameAs candidate pairs are emitted in star form per
    (pred, subj)/(pred, obj) group — linear in group size, never the
    quadratic pair set — and the equivalence closure rides the same
    distributed CC operator the linking pipeline uses.  The instance
    scan shuffles only where the semantics require it: the per-group
    window for FP/IFP, the closure loop on transitive edges only, and
    the final distinct.

    Asserted (x owl:sameAs y) triples are CONSUMED by the closure and
    re-emitted in star form — they are identity metadata, not domain
    edges, so rewriting them like domain edges would only yield
    (c sameAs c) noise.

    One pass is a fixpoint for ontologies where the merge rules don't
    feed new FP/IFP violations through the rewrite (the common case,
    pytest-asserted on the fixtures); `passes=n` composes the operator
    for deeper interactions, with each pass a full plan — keep n small
    or checkpoint between passes.
    """
    from .cc import connected_components
    from .graph import transitive_closure

    from .rdflist import vocab_canon_triples

    if passes < 1:
        raise ValueError("passes must be >= 1")
    out = vocab_canon_triples(triples)
    for _ in range(passes):
        out = _owl_pass(out, connected_components, transitive_closure)
    return out


def _owl_pass(t: DataFrame, connected_components, transitive_closure
              ) -> DataFrame:
    is_schema = (F.col("pred") == INVERSE_OF) | (
        (F.col("pred") == RDF_TYPE) & F.col("obj").isin(list(_OWL_PROP_CLASSES))
    )
    schema = t.where(is_schema)
    inst = t.where(~is_schema)

    inv = schema.where(F.col("pred") == INVERSE_OF).select(
        F.col("subj").alias("p"), F.col("obj").alias("q"))

    def _typed(cls: str):
        return schema.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == cls)
        ).select(F.col("subj").alias("p"))

    symp, trans, fp, ifp = (
        _typed(SYMMETRIC), _typed(TRANSITIVE),
        _typed(FUNCTIONAL), _typed(INV_FUNCTIONAL),
    )

    # prp-inv (both directions) + prp-symp: every derived edge is the
    # instance scan joined to a broadcast ontology slice, then swapped
    swapped = inst.select(
        F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj"))
    inv_fwd = swapped.join(
        F.broadcast(inv.withColumnRenamed("p", "pred")), "pred"
    ).select("subj", F.col("q").alias("pred"), "obj")
    inv_bwd = swapped.join(
        F.broadcast(inv.withColumnRenamed("q", "pred")), "pred"
    ).select("subj", F.col("p").alias("pred"), "obj")
    symmed = swapped.join(
        F.broadcast(symp.withColumnRenamed("p", "pred")), "pred"
    ).select("subj", "pred", "obj")

    expanded = (
        inst.unionByName(inv_fwd).unionByName(inv_bwd).unionByName(symmed)
    )
    # the closure and the FP/IFP windows each scan `expanded` again;
    # cut the recomputation (and give CC a stable input) here
    expanded = expanded.localCheckpoint(eager=True)

    # prp-trp — ONE closure for every transitive predicate: endpoints
    # are encoded pred<US>node so the path-doubling midpoint join can
    # only match within a predicate's own edge set
    tedges = expanded.join(
        F.broadcast(trans.withColumnRenamed("p", "pred")), "pred")
    bad = tedges.where(F.col("pred").contains(_SEP)).limit(1).count()
    if bad:
        raise ValueError(f"transitive predicate contains reserved {_SEP!r}")
    closed = transitive_closure(
        tedges.select(
            F.concat_ws(_SEP, "pred", "subj").alias("child"),
            F.concat_ws(_SEP, "pred", "obj").alias("parent"),
        )
    )
    sep_at = F.instr(F.col("node"), _SEP)
    trans_derived = closed.select(
        F.expr(f"substring(ancestor, instr(ancestor, '{_SEP}') + 1)"
               ).alias("obj_raw"),
        F.substring_index("node", _SEP, 1).alias("pred"),
        F.col("node").substr(sep_at + 1, F.length("node")).alias("subj"),
    ).select("subj", "pred", F.col("obj_raw").alias("obj"))

    full = expanded.unionByName(trans_derived).localCheckpoint(eager=True)

    # prp-fp / prp-ifp — sameAs candidates in star form per group:
    # linear in group size (min over a window, pair each member with
    # the min), never the quadratic all-pairs within a group
    w_fp = Window.partitionBy("pred", "subj")
    fp_pairs = (
        full.join(F.broadcast(fp.withColumnRenamed("p", "pred")), "pred")
        .withColumn("m", F.min("obj").over(w_fp))
        .where(F.col("obj") != F.col("m"))
        .select(F.col("m").alias("a"), F.col("obj").alias("b"))
    )
    w_ifp = Window.partitionBy("pred", "obj")
    ifp_pairs = (
        full.join(F.broadcast(ifp.withColumnRenamed("p", "pred")), "pred")
        .withColumn("m", F.min("subj").over(w_ifp))
        .where(F.col("subj") != F.col("m"))
        .select(F.col("m").alias("a"), F.col("subj").alias("b"))
    )
    asserted_sa = full.where(F.col("pred") == SAME_AS).select(
        F.col("subj").alias("a"), F.col("obj").alias("b"))

    sa_edges = asserted_sa.unionByName(fp_pairs).unionByName(ifp_pairs)
    canon = connected_components(
        sa_edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )  # node -> component (lexicographic min) — the canonical map

    # eq-rep — rewrite every position through the canonical map; the
    # map is usually tiny but CAN be instance-scale (mass dedup), so no
    # broadcast hint: AQE picks the strategy from the real size
    def _rw(df: DataFrame, col: str) -> DataFrame:
        m = canon.withColumnRenamed("node", col)
        return df.join(m, col, "left").select(
            *[F.coalesce("component", c).alias(c) if c == col else F.col(c)
              for c in ("subj", "pred", "obj")])

    domain_edges = full.where(F.col("pred") != SAME_AS)
    rewritten = _rw(_rw(_rw(domain_edges, "subj"), "pred"), "obj")

    stars = canon.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("subj"),
        F.lit(SAME_AS).alias("pred"),
        F.col("component").alias("obj"),
    )

    return (
        rewritten.unionByName(stars).unionByName(schema).distinct()
    )


EQUIV_CLASS = "owl:equivalentClass"
EQUIV_PROP = "owl:equivalentProperty"
DISJOINT_WITH = "owl:disjointWith"


def owl_equivalence_expand(triples: DataFrame) -> DataFrame:
    """owl:equivalentClass / owl:equivalentProperty lowered to the RDFS
    vocabulary: each equivalence assertion becomes the subClassOf /
    subPropertyOf pair in BOTH directions (OWL RL scm-eqc1/2,
    scm-eqp1/2), so composing with rdfs_materialize entails through
    equivalence chains for free — the subClassOf* closure is already
    transitive, and a bidirected chain is mutually reachable end to
    end.  Asserted equivalence triples stay in the output (they are
    ontology facts); only the derived sub* rows are added.  Ontology-
    scale work: one filtered scan + a union of two projections."""
    from .rdflist import vocab_canon_triples

    triples = vocab_canon_triples(triples)
    mapping = {EQUIV_CLASS: SUBCLASS, EQUIV_PROP: SUBPROP}
    eq = triples.where(F.col("pred").isin(list(mapping)))
    sub_pred = F.when(F.col("pred") == EQUIV_CLASS, SUBCLASS).otherwise(
        SUBPROP
    )
    fwd = eq.select("subj", sub_pred.alias("pred"), "obj")
    bwd = eq.select(
        F.col("obj").alias("subj"), sub_pred.alias("pred"),
        F.col("subj").alias("obj"),
    )
    extra = fwd.unionByName(bwd)
    for c in triples.columns:
        if c not in ("subj", "pred", "obj"):
            extra = extra.withColumn(c, F.lit(None).cast(triples.schema[c].dataType))
    return triples.unionByName(extra.select(triples.columns)).distinct()


def owl_inconsistencies(triples: DataFrame) -> DataFrame:
    """Consistency REPORT (not materialization): rows describing where
    the data contradicts its ontology —

      kind='disjoint'    (c1 owl:disjointWith c2), (x type c1),
                         (x type c2)  ->  (x, least(c1,c2), greatest)
                         — pair normalized so a symmetric assertion
                         yields one row
      kind='functional'  (p a owl:FunctionalProperty), subject s holds
                         n > 1 distinct p-values  ->  (s, p, n)

    Unlike owl_materialize's prp-fp (which MERGES the values via
    sameAs under the unique-name-free OWL reading), this is the data-
    quality reading: report, don't repair — validate_graph-style exit
    gating wants the violation rows.

    Plan shape: both ontology slices broadcast; the type table is
    pre-filtered to classes mentioned in any disjointWith pair BEFORE
    the self-join, so the join runs on the ontology-relevant slice, and
    the functional check is one groupBy on the functional-pred slice.
    Output: (kind, node, a, b) — b carries the second class or the
    stringified distinct-value count."""
    from .rdflist import vocab_canon_triples

    triples = vocab_canon_triples(triples)
    types = triples.where(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("node"), F.col("obj").alias("cls")
    ).distinct()
    dis = triples.where(F.col("pred") == DISJOINT_WITH).select(
        F.least("subj", "obj").alias("c1"),
        F.greatest("subj", "obj").alias("c2"),
    ).distinct()
    relevant = dis.select(F.col("c1").alias("cls")).unionByName(
        dis.select(F.col("c2").alias("cls"))
    ).distinct()
    slim = types.join(F.broadcast(relevant), "cls", "left_semi")
    disjoint_rows = (
        slim.alias("l")
        .join(slim.alias("r"), "node")
        .join(
            F.broadcast(dis),
            (F.col("l.cls") == F.col("c1")) & (F.col("r.cls") == F.col("c2")),
        )
        .select(
            F.lit("disjoint").alias("kind"),
            "node",
            F.col("c1").alias("a"),
            F.col("c2").alias("b"),
        )
    )

    func_preds = triples.where(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == FUNCTIONAL)
    ).select(F.col("subj").alias("pred"))
    func_rows = (
        triples.join(F.broadcast(func_preds), "pred", "left_semi")
        .groupBy(F.col("subj").alias("node"), "pred")
        .agg(F.countDistinct("obj").alias("n"))
        .where(F.col("n") > 1)
        .select(
            F.lit("functional").alias("kind"),
            "node",
            F.col("pred").alias("a"),
            F.col("n").cast("string").alias("b"),
        )
    )
    return disjoint_rows.unionByName(func_rows)


CHAIN_AXIOM = "owl:propertyChainAxiom"


def property_chains_materialize(
    triples: DataFrame, passes: int = 1, max_chain_len: int = 16
) -> DataFrame:
    """OWL 2 RL prp-spo2: property-chain entailment.

        (p owl:propertyChainAxiom (p1 p2 ... pn)),
        (s p1 x1), (x1 p2 x2), ..., (x_{n-1} pn o)   ->   (s p o)

    The chain argument is an RDF collection, exactly what the Turtle
    parser emits for `( p1 p2 )` — so the axiom's member order is
    recovered with the distributed rdf:List expander (rdflist.py), and
    each chain lowers to n-1 equi-joins over per-predicate filtered
    scans (vertical-partition-prunable, the q_sparql_2hop shape).  A
    length-1 chain degenerates to rdfs7 subproperty inclusion, which
    falls out of the same loop with zero joins.

    Chain DEFINITIONS decide the PLAN (how many joins to stack per
    chain), so they must reach the driver: that collect is
    ontology-scale (axiom count x chain length, bounded by
    `max_chain_len` per chain and in practice tens of rows), never
    data-scale — the same bounded-artifact rule as the IVF centroids
    and bloom words.  Instance edges stay distributed throughout.

    `passes`: one pass is a fixpoint unless a chain-derived predicate
    feeds ANOTHER chain; compose passes for such ontologies (each pass
    is a full plan — keep small or checkpoint between).

    Returns asserted + entailed, DISTINCT.  Composes with
    owl_materialize / rdfs_materialize in any order; like those, list
    plumbing (rdf:first/rest) and the axiom triples themselves pass
    through as asserted metadata.
    """
    from .rdflist import list_expand, vocab_canon_triples

    if passes < 1:
        raise ValueError("passes must be >= 1")

    triples = vocab_canon_triples(triples)
    axioms = triples.where(F.col("pred") == CHAIN_AXIOM).select(
        F.col("subj").alias("p"), F.col("obj").alias("head")
    )
    members = (
        list_expand(triples, heads_filter=axioms.select("head"))
        .join(axioms, "head")
        .select("p", "pos", "member")
        .collect()
    )
    chains: dict[str, list[str]] = {}
    for r in members:
        chains.setdefault(r["p"], []).append((r["pos"], r["member"]))
    for p, ms in chains.items():
        if len(ms) > max_chain_len:
            raise ValueError(
                f"chain for {p!r} has {len(ms)} members "
                f"(max_chain_len={max_chain_len})"
            )
        chains[p] = [m for _, m in sorted(ms)]

    out = triples.select("subj", "pred", "obj")
    for _ in range(passes):
        derived = []
        for p in sorted(chains):
            chain = chains[p]
            cur = out.where(F.col("pred") == chain[0]).select(
                F.col("subj").alias("s"), F.col("obj").alias("x")
            )
            for hop, pi in enumerate(chain[1:]):
                nxt = out.where(F.col("pred") == pi).select(
                    F.col("subj").alias("x"), F.col("obj").alias(f"x{hop}")
                )
                cur = cur.join(nxt, "x").select("s", F.col(f"x{hop}").alias("x"))
            derived.append(
                cur.select(
                    F.col("s").alias("subj"),
                    F.lit(p).alias("pred"),
                    F.col("x").alias("obj"),
                )
            )
        for d in derived:
            out = out.unionByName(d)
        out = out.distinct()
    return out


HAS_KEY = "owl:hasKey"


def owl_keys_materialize(
    triples: DataFrame, max_key_len: int = 8
) -> DataFrame:
    """OWL 2 RL prp-key: composite-key identity.

        (c owl:hasKey (p1 ... pn)),
        (x rdf:type c), (y rdf:type c),
        for every i: (x pi vi) and (y pi vi)     ->   x owl:sameAs y

    THE declarative entity-resolution rule ("same nation + same segment
    => same account"): the ontology states which attribute combination
    identifies an instance of a class, and the engine merges nodes that
    agree on all of them — the machine-checked version of what the
    reference's handcoded entity classes do implicitly by minting one
    URI per key.

    Key specs are rdf:Lists (same recovery path as property chains);
    like them they are ontology-scale and shape the plan (one join per
    key property), so they reach the driver under `max_key_len`.  Per
    class the plan is: typed members, n broadcast-free equi-joins
    attaching one key property each (multi-valued properties yield one
    row per value COMBINATION — x and y merge when ANY full tuple
    matches, the OWL semantics), then a per-tuple-group window that
    emits sameAs in CANONICAL STAR FORM (member -> min representative),
    linear in group size, never the quadratic pair closure.

    Returns asserted + derived candidate `owl:sameAs` rows.  Tuples
    equal across DIFFERENT groups chain only through the equivalence
    closure — compose with owl_materialize, whose sameAs CC closes
    star fragments into classes (tests pin the composition).
    """
    from .rdflist import list_expand, vocab_canon_triples

    triples = vocab_canon_triples(triples)
    axioms = triples.where(F.col("pred") == HAS_KEY).select(
        F.col("subj").alias("cls"), F.col("obj").alias("head")
    )
    members = (
        list_expand(triples, heads_filter=axioms.select("head"))
        .join(axioms, "head")
        .select("cls", "pos", "member")
        .collect()
    )
    keys: dict[str, list[str]] = {}
    for r in members:
        keys.setdefault(r["cls"], []).append((r["pos"], r["member"]))
    for cls, ms in keys.items():
        if len(ms) > max_key_len:
            raise ValueError(
                f"key for {cls!r} has {len(ms)} properties "
                f"(max_key_len={max_key_len})"
            )
        keys[cls] = [m for _, m in sorted(ms)]

    out = triples.select("subj", "pred", "obj")
    derived = []
    for cls in sorted(keys):
        props = keys[cls]
        typed = triples.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == cls)
        ).select(F.col("subj").alias("x"))
        cur = typed
        for i, p in enumerate(props):
            vals = triples.where(F.col("pred") == p).select(
                F.col("subj").alias("x"), F.col("obj").alias(f"v{i}")
            )
            cur = cur.join(vals, "x")
        grp = [F.col(f"v{i}") for i in range(len(props))]
        rep = F.min("x").over(Window.partitionBy(*grp))
        derived.append(
            cur.select(F.col("x").alias("subj"),
                       F.lit(SAME_AS).alias("pred"),
                       rep.alias("obj"))
            .where(F.col("subj") != F.col("obj"))
        )
    for d in derived:
        out = out.unionByName(d)
    return out.distinct()
