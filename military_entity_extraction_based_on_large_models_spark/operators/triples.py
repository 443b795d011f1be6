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

Scale notes: the co-occurrence self-join keys on doc_sha; per-doc entity
counts are small and bounded, so the join fan-out is quadratic only in the
per-doc entity count, never in corpus size.  AQE skew-join covers hot docs;
the distinct() before the self-join keeps the join input minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLUMNS = ["subj", "pred", "obj", "doc_sha", "repo", "path", "commit"]

PROV = ["doc_sha", "repo", "path", "commit"]


def materialize_triples(linked: DataFrame) -> DataFrame:
    """Linked, deduped mentions → triple rows (TRIPLE_COLUMNS)."""
    ents = linked.select("canonical", "name", "label", *PROV).distinct()

    mentioned_as = ents.select(
        F.col("canonical").alias("subj"),
        F.lit("mentioned_as").alias("pred"),
        F.col("name").alias("obj"),
        *PROV,
    )
    instance_of = ents.select(
        F.col("canonical").alias("subj"),
        F.lit("instance_of").alias("pred"),
        F.col("label").alias("obj"),
        *PROV,
    ).distinct()

    # per-doc distinct canonical set, split by the reference's routing rule
    doc_ents = ents.select("canonical", "label", *PROV).distinct()
    non_loc = doc_ents.where(F.col("label") != "location")
    loc = doc_ents.where(F.col("label") == "location")

    located_in = (
        non_loc.alias("e")
        .join(loc.alias("l"), "doc_sha")
        .select(
            F.col("e.canonical").alias("subj"),
            F.lit("located_in").alias("pred"),
            F.col("l.canonical").alias("obj"),
            F.col("doc_sha"),
            F.col("e.repo").alias("repo"),
            F.col("e.path").alias("path"),
            F.col("e.commit").alias("commit"),
        )
        .distinct()
    )

    co_occurs = (
        non_loc.alias("a")
        .join(
            non_loc.alias("b"),
            (F.col("a.doc_sha") == F.col("b.doc_sha"))
            & (F.col("a.canonical") < F.col("b.canonical")),
        )
        .select(
            F.col("a.canonical").alias("subj"),
            F.lit("co_occurs_with").alias("pred"),
            F.col("b.canonical").alias("obj"),
            F.col("a.doc_sha").alias("doc_sha"),
            F.col("a.repo").alias("repo"),
            F.col("a.path").alias("path"),
            F.col("a.commit").alias("commit"),
        )
        .distinct()
    )

    return (
        mentioned_as.unionByName(instance_of)
        .unionByName(located_in)
        .unionByName(co_occurs)
    )
