"""Triple materialization: linked mentions → (subj, pred, obj) graph rows.

Reference analogue: the final explode-per-box + normalize + append stage
(foundation_workflow.py:92-113 I4/P10/A1) — one text entity fans out to many
output records.  Our fan-out is relational: one linked mention row fans out to
the predicates below, all derived purely from the reference's emitted fields
(name, label, doc membership), so the triple set is a pure function of the
extraction output (FIXTURES.md §4):

* ``mentioned_as``   (canonical, mentioned_as, surface name)   per document
* ``instance_of``    (canonical, instance_of, label)           per document
* ``located_in``     (entity canonical, located_in, location canonical) for
                     entity×location co-occurrence within a document — the
                     routing split mirrors the reference's label-based routing
                     (reflect_workflow3.py:126-132 P4: location handled apart)
* ``co_occurs_with`` (canonical_a, co_occurs_with, canonical_b), a < b,
                     for non-location entity pairs within a document

Every row carries (doc_sha, repo, path, commit) provenance — the content-sha256
per-row lineage invariant (BASELINE.json input_hint).

Plan shape (scale-critical): ONE groupBy on the document key collects the
per-doc entity set (bounded — entities per document are few), and every
predicate family is generated columnar from that array inside a single
projection: triangular transform for co-occurrence pairs, cross transform for
located_in, array_distinct for instance_of.  Total cost = one shuffle of the
mention rows + one explode.  The naive alternative (per-predicate distinct +
two doc-key self-joins) shuffles the wide mention table five times and was
measured ~6× slower at sf0.1×32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bind_once

TRIPLE_COLUMNS = ["subj", "pred", "obj", "doc_sha", "repo", "path", "commit"]

PROV = ["doc_sha", "repo", "path", "commit"]


def _all_triples_expr(ents):
    """Sorted-distinct (canonical, label, name) entity array → the full
    per-document triple array, generated columnar (no per-predicate shuffles:
    triangular transform for co-occurrence, cross transform for located_in,
    array_distinct for instance_of)."""
    mentioned_as = F.transform(
        ents,
        lambda e: F.struct(
            e["canonical"].alias("subj"),
            F.lit("mentioned_as").alias("pred"),
            e["name"].alias("obj"),
        ),
    )
    instance_of = F.transform(
        F.array_distinct(
            F.transform(
                ents, lambda e: F.struct(e["canonical"].alias("c"), e["label"].alias("l"))
            )
        ),
        lambda e: F.struct(
            e["c"].alias("subj"),
            F.lit("instance_of").alias("pred"),
            e["l"].alias("obj"),
        ),
    )

    non_loc_expr = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(ents, lambda e: e["label"] != "location"),
                lambda e: e["canonical"],
            )
        )
    )
    loc_expr = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(ents, lambda e: e["label"] == "location"),
                lambda e: e["canonical"],
            )
        )
    )

    def pair_structs(arr_a, arr_b, pred):
        # cross product arr_a × arr_b as one flattened transform
        return F.flatten(
            F.transform(
                arr_a,
                lambda a: F.transform(
                    arr_b,
                    lambda b: F.struct(
                        a.alias("subj"), F.lit(pred).alias("pred"), b.alias("obj")
                    ),
                ),
            )
        )

    # bind_once the two derived arrays: both appear inside INNER lambdas
    # (loc per non-loc element in the cross product; non_loc sliced per
    # element in the triangular transform) — inlined, the filter/distinct/
    # sort derivation would re-run per element (the lm.doc_bigrams
    # quadratic-HOF bug class; functions/text.bind_once)
    def _with_non_loc(non_loc):
        located_in = bind_once(
            loc_expr, lambda loc: pair_structs(non_loc, loc, "located_in")
        )
        # triangular pairs (a < b) over the sorted canonical array
        co_occurs = F.flatten(
            F.transform(
                non_loc,
                lambda a, i: F.transform(
                    F.slice(non_loc, i + F.lit(2), F.size(non_loc)),
                    lambda b: F.struct(
                        a.alias("subj"),
                        F.lit("co_occurs_with").alias("pred"),
                        b.alias("obj"),
                    ),
                ),
            )
        )
        return F.concat(mentioned_as, instance_of, located_in, co_occurs)

    return bind_once(non_loc_expr, _with_non_loc)


def _explode_triples(per_doc: DataFrame, ents) -> DataFrame:
    """``ents`` (the sorted-distinct entity array expression) is materialized
    into a REAL column behind a Generate boundary before the triple
    expression references it: ``_all_triples_expr`` mentions its input ~6
    times, and higher-order array expressions are neither codegen'd nor
    common-subexpression-eliminated — inlining the array-building expression
    would re-evaluate the filter/distinct/sort per reference (measured ~35%
    slower end-to-end on the expression paths)."""
    pinned = per_doc.select(*PROV, ents.alias("_ents"))
    return pinned.select(
        F.explode(_all_triples_expr(F.col("_ents"))).alias("t"), *PROV
    ).select(
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        *PROV,
    )


def materialize_triples(linked: DataFrame) -> DataFrame:
    """Linked, deduped mention ROWS → triple rows (TRIPLE_COLUMNS).

    Input may be raw linked mentions: the per-doc ``collect_set`` enforces
    (canonical, label, name) set semantics itself (reference D1,
    reflect_workflow1.py:44-53), so running ``dedup_mentions`` first is
    NOT required — skipping it saves a full shuffle of the mention table.
    Error rows (I5) are excluded here.  Cost: ONE shuffle (the doc-key
    groupBy).  When mentions never left their per-document arrays, use
    ``materialize_triples_from_doc_arrays`` instead — zero shuffles."""
    from .extract import DOC_KEY, with_doc_key

    if "error" in linked.columns:
        linked = linked.where(F.col("error").isNull())
    if not set(DOC_KEY) <= set(linked.columns):
        linked = with_doc_key(linked)
    per_doc = linked.groupBy(*DOC_KEY).agg(
        *[F.first(c).alias(c) for c in PROV],
        F.sort_array(
            F.collect_set(F.struct("canonical", "label", "name"))
        ).alias("ents"),
    )
    return _explode_triples(per_doc, F.col("ents"))


#: above this many distinct aliases the literal containment expression loses
#: to the Arrow-batched Aho-Corasick stage (O(G·n) scans vs one O(n) pass)
EXPR_GAZETTEER_MAX = 64


def materialize_triples_jvm(
    docs: DataFrame, gazetteer_entries
) -> DataFrame:
    """Whole-stage-codegen flagship path for SMALL gazetteers: the per-doc
    entity set is ``filter(gazetteer_literal, g -> contains(content,
    g.name))`` — pure JVM string containment over a literal array, no Python
    stage, no Arrow transfer, no shuffle.  Semantically identical to the
    Arrow path's distinct-(canonical, label, name) set: the reference's own
    post-filter is pure containment (EntityExtractor.py:124-130), and the
    triple set never uses span positions.

    Containment costs one memchr-style scan per alias per document —
    unbeatable below ~:data:`EXPR_GAZETTEER_MAX` aliases; past that the
    Arrow Aho-Corasick stage (one O(n) pass for any dictionary size) wins.
    """
    if not list(gazetteer_entries):
        # a zero-length F.array() is typed array<void>; the degenerate result
        # is simply no triples, with the full output schema preserved
        return docs.where(F.lit(False)).select(
            *[F.lit(None).cast("string").alias(c) for c in ("subj", "pred", "obj")],
            *PROV,
        )
    gaz = F.array(
        *[
            F.struct(
                F.lit(c).alias("canonical"),
                F.lit(lb).alias("label"),
                F.lit(a).alias("name"),
            )
            for a, c, lb in gazetteer_entries
        ]
    )
    ents = F.array_sort(
        F.array_distinct(
            F.filter(gaz, lambda g: F.contains(F.col("content"), g["name"]))
        )
    )
    return _explode_triples(docs, ents)


def materialize_triples_from_doc_ids(
    per_doc_ids: DataFrame, gazetteer_entries
) -> DataFrame:
    """Dictionary-encoded extraction output (extract.DOC_MENTION_IDS_SCHEMA:
    one row per doc with its DISTINCT mention meta-row ids) → triple rows,
    zero shuffles.

    The vocabulary rides as ONE broadcast row holding the (canonical, label,
    name) array in meta-row order (extract.build_vocab); decode is
    ``element_at`` inside the projection — a BroadcastNestedLoopJoin against
    a single row, no exchange, no per-row join probe.  The Arrow boundary
    carried 4-byte ids instead of three strings per mention; the strings are
    (re)created exactly once per distinct (doc, mention) here on the JVM
    side.  Semantically identical to materialize_triples_from_doc_arrays:
    vocab rows are unique (canonical, label, name) triples, so distinct ids
    ⇔ distinct entity structs, and array_sort after decode reproduces the
    same sorted entity array."""
    from .extract import build_vocab

    spark = per_doc_ids.sparkSession
    vocab = build_vocab(gazetteer_entries)
    vocab_row = spark.createDataFrame(
        [(vocab,)],
        "vocab array<struct<canonical:string,label:string,name:string>>",
    )
    ok = per_doc_ids.where(F.col("error").isNull() & F.col("mids").isNotNull())
    joined = ok.join(F.broadcast(vocab_row))
    ents = F.array_sort(
        F.transform(F.col("mids"), lambda m: F.element_at(F.col("vocab"), m + 1))
    )
    return _explode_triples(joined, ents)


def materialize_triples_from_doc_arrays(per_doc_mentions: DataFrame) -> DataFrame:
    """Extraction output (one row per document with its mention array,
    extract.DOC_MENTIONS_SCHEMA) → triple rows, with ZERO shuffles.

    The round-1 plan exploded the arrays into mention rows and immediately
    re-grouped them by document key — a full shuffle of the mention table
    whose only purpose was re-assembling what the extraction stage had
    already produced.  When linking is a passthrough (no ambiguous aliases),
    the per-doc entity SET is just array_sort(array_distinct(...)) over the
    mention array: identical semantics to the groupBy collect_set
    (reference D1 set semantics), evaluated in-place in the projection.
    The whole flagship pipeline then contains no exchange at all beyond the
    initial input repartition."""
    ok = per_doc_mentions.where(
        F.col("error").isNull() & F.col("mentions").isNotNull()
    )
    ents = F.array_sort(
        F.array_distinct(
            F.transform(
                F.col("mentions"),
                lambda m: F.struct(
                    m["canonical"].alias("canonical"),
                    m["label"].alias("label"),
                    m["name"].alias("name"),
                ),
            )
        )
    )
    return _explode_triples(ok, ents)


def to_ntriples(triples: DataFrame, base_iri: str = "http://example.org/") -> DataFrame:
    """Serialize (subj, pred, obj) rows as RDF N-Triples lines — the
    interchange export beside the Iceberg/parquet graph-table sink, so the
    materialized KG loads into any triple store.

    Pure codegen string assembly (one projection, no shuffle, scales
    trivially).  IRI escaping covers the characters our identifiers can
    carry (space, angle brackets, quote) via literal replaces kept
    deliberately simple so the DuckDB oracle reproduces the byte-exact
    lines; all three positions serialize as resources (subjects/objects are
    canonical entity ids, not free literals).  Columns: (ntriple)."""

    def esc(c):
        out = F.col(c)
        for ch, enc in ((" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22")):
            out = F.replace(out, F.lit(ch), F.lit(enc))
        return out

    line = F.concat(
        F.lit(f"<{base_iri}entity/"), esc("subj"),
        F.lit(f"> <{base_iri}rel/"), esc("pred"),
        F.lit(f"> <{base_iri}entity/"), esc("obj"),
        F.lit("> ."),
    )
    return triples.select(line.alias("ntriple"))
