"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the semantics of
``bianyh/Military-entity-extraction-based-on-large-models`` (reference at
/root/reference, read-only): military named-entity mention detection,
verification, dedup/canonicalization, and (subj, pred, obj) triple
materialization — rebuilt as vectorized, batched DataFrame stages over an
Iceberg-shaped table ``documents(repo, path, commit, lang, content)``.

The reference runs a sequential per-document LLM prompt loop
(foundation_workflow.py:67); this engine replaces it with:

* ``operators.extract``      — gazetteer span matching in a ``mapInArrow``
                               stage: whole-batch C-level find / Aho-Corasick
                               with columnar assembly (≡ EntityExtractor.py
                               P1 + the containment post-filter P2).
* ``operators.linking``      — broadcast alias-dictionary candidate generation
                               + deterministic context disambiguation
                               (≡ reflect verification I2 semantics).
* ``operators.canonicalize`` — connected components via alternating
                               large-star/small-star (driver-bounded fixpoint).
* ``operators.triples``      — explode to (subj, pred, obj) rows with
                               per-row sha256 lineage (≡ I4/P10/A1).
* ``operators.judge``        — the reference's judge/*.py P/R/F1 + IoU
                               matching semantics as pure DataFrame aggregation.
* ``operators.dedup``        — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                               embedding-cosine dedup for corpus curation.
* ``operators.similarity``   — brute-force + LSH-bucketed cosine top-k ANN.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
broadcast selection, and AQE; Python appears only inside Arrow-batched UDFs.
"""

__version__ = "0.1.0"
