"""Regenerate PLANS.md: formatted physical plans of the plans we gate on.

Each section pairs a short claim (what the plan must show, and which test
enforces it) with the actual `explain("formatted")` output at sf0.001, so a
reviewer can audit plan shape without a Spark session.

Run: python tools/dump_plans.py   (rewrites PLANS.md at the repo root)
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shape(plan_text: str) -> list[str]:
    """The operator-tree lines of a formatted plan, with the per-run node
    numbers stripped — what the PLANS.md drift gate compares (expression ids
    and plan_ids live in the detail section, which is NOT compared)."""
    import re

    lines = plan_text.splitlines()
    try:
        start = lines.index("== Physical Plan ==") + 1
    except ValueError:
        return []
    out = []
    for line in lines[start:]:
        if not line.strip():
            break
        out.append(re.sub(r"\s*\(\d+\)\s*$", "", line.rstrip()))
    return out


def _setsim_section(d):
    from military_entity_extraction_based_on_large_models_spark.functions import text as T
    from military_entity_extraction_based_on_large_models_spark.operators.setsim import (
        setsim_join,
    )

    sets = d.select("doc_id", T.shingles(F.col("text"), 3).alias("toks"))
    return setsim_join(sets, id_col="doc_id", t_num=1, t_den=2)


def _substrdup_section(d):
    from military_entity_extraction_based_on_large_models_spark.operators.substrdup import (
        duplicate_spans,
    )

    return duplicate_spans(d.select("doc_id", "text"), k=3)


def _editdist_section(d):
    from military_entity_extraction_based_on_large_models_spark.operators.editdist import (
        edit_distance_join,
    )

    names = d.select(F.substring("text", 1, 12).alias("name"))
    return edit_distance_join(names, max_dist=1)


def _negsample_section(d):
    from military_entity_extraction_based_on_large_models_spark.operators.negsample import (
        negative_samples,
    )

    tri = d.select(
        F.substring("text", 1, 6).alias("subj"),
        F.lit("r").alias("pred"),
        F.substring("text", 8, 6).alias("obj"),
    )
    return negative_samples(tri, k=2, pool_size=64)


def _linkpred_section(ev):
    from military_entity_extraction_based_on_large_models_spark.operators.linkpred import (
        node_similarity,
    )

    e = ev.select(
        F.col("user_id").cast("string").alias("src"),
        F.col("event_type").alias("dst"),
    ).distinct()
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return node_similarity(edges)


def _scd2_snapshot_section(ev):
    from military_entity_extraction_based_on_large_models_spark.operators.cdc import (
        latest_snapshot,
    )

    return latest_snapshot(
        ev, ["user_id"], "ts", "event_id", ["event_type", "value"],
        op_col="event_type", delete_op="error",
    )


def _transclose_section(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.transclose import (
        _double_round,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    return _double_round(e.withColumn("hops", F.lit(1).cast("long")))


def _cc_incremental_section(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.canonicalize import (
        connected_components,
        connected_components_incremental,
    )

    comp = connected_components(
        spark.createDataFrame(
            [("a", "b"), ("c", "d")], "src string, dst string"
        )
    )
    batch = spark.createDataFrame([("b", "c")], "src string, dst string")
    return connected_components_incremental(comp, batch)


def build_sections(spark):
    """(title, claim, DataFrame) for every gated plan — shared by the
    PLANS.md generator and tests/test_plans.py's drift gate, so the file
    cannot silently diverge from the shipped plans."""
    from military_entity_extraction_based_on_large_models_spark.operators import (
        assoc,
        boilerplate,
        codegraph,
        dedup,
        pagerank,
        ranking,
        sessions,
        similarity,
    )
    from military_entity_extraction_based_on_large_models_spark.operators.skew import (
        topk_per_group,
    )
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        asof_join,
        range_join,
    )
    from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
        kg_pipeline,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_driver_documents,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        VOCAB_GAZETTEER,
    )

    docs = read_driver_documents(spark, SF_DIR)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("cid"), "value"
    )
    intervals = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("start"),
        F.col("ts").alias("end"),
        F.col("event_id").alias("iid"),
    )

    # the registered code_import_graph corpus (same synthesis, same plan)
    import __spark_entry__ as _entry

    _cg_docs, _cg_owners = _entry._codegraph_docs_owners(spark, SF_DIR)

    return [
        (
            "Flagship KG pipeline (small gazetteer → pure-JVM containment path)",
            "Claim: at most ONE exchange (the scale_out input repartition); no "
            "Python stage; whole-stage codegen spans the filter/projection.  "
            "Gate: tests/test_plans.py::test_flagship_pipeline_zero_shuffle.",
            kg_pipeline(docs, VOCAB_GAZETTEER, context_terms={}),
        ),
        (
            "MinHash-LSH candidate pairs",
            "Claim: the signature is ONE expression evaluated once per row; "
            "bands via a single posexplode; one groupBy shuffle; columnar "
            "triangular pair generation (no self-join).  "
            "Gate: warm timings + r1 plan review (dedup.py docstrings).",
            dedup.minhash_lsh_pairs(d, text_col="text", id_col="doc_id"),
        ),
        (
            "As-of join (default per-key window)",
            "Claim: NO join operator; one content exchange for the key "
            "window; left row count preserved.  "
            "Gate: tests/test_plans.py::test_asof_join_single_exchange.",
            asof_join(purchases, clicks, on="user_id"),
        ),
        (
            "As-of join (bucket_seconds=3600 hot-key path)",
            "Claim: windows partition by (key, bucket); the carry side is an "
            "algebraic partial+final aggregate over bucket summaries plus a "
            "tiny per-key window; one equi join back on (key, bucket).",
            asof_join(purchases, clicks, on="user_id", bucket_seconds=3600),
        ),
        (
            "Range join (binned)",
            "Claim: equi SortMergeJoin/BHJ on (key, bin) — never "
            "CartesianProduct/BroadcastNestedLoopJoin.  "
            "Gate: tests/test_plans.py::test_range_join_is_equi_not_nested_loop.",
            range_join(clicks, intervals, on="user_id"),
        ),
        (
            "Skew-robust top-k per group",
            "Claim: two window phases — (keys, salt) then keys on ≤ buckets·k "
            "survivors; no single-partition window over a hot group.  "
            "Gate: tests/test_skew.py::test_topk_per_group_matches_plain_window.",
            topk_per_group(
                orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
                ["o_orderpriority"],
                [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
                k=3,
            ),
        ),
        (
            "Exact dedup representative pick",
            "Claim: partial_min + final min HashAggregate/SortAggregate — no "
            "Window (a window partition is one reducer and AQE never splits "
            "it).  Gate: tests/test_dedup.py::"
            "test_exact_dedup_plan_partial_agg_no_window.",
            dedup.exact_dedup(d.select("doc_id", "text"), text_col="text", id_col="doc_id"),
        ),
        (
            "Weighted sample (deterministic global top-k draw)",
            "Claim: TakeOrderedAndProject — map-side per-partition top-k + "
            "one k-row merge; never a global sort or one-reducer window.  "
            "Gate: tests/test_ranking.py::test_weighted_sample_plan_take_ordered.",
            ranking.weighted_sample(
                d.select("doc_id", (F.col("n_chars") + 1).alias("weight")),
                weight="weight",
                k=50,
            ),
        ),
        (
            "PageRank (one iteration)",
            "Claim: per iteration, ONE aggregation shuffle (contributions "
            "grouped by dst) plus the rank-frame join — no cartesian, no "
            "window; the rank frame never carries the edge list.  "
            "Gate: tests/test_pagerank.py parallelism-invariance (bit-equal "
            "vector at any layout).",
            pagerank.pagerank(
                ev.select(
                    F.col("user_id").cast("string").alias("src"),
                    F.col("event_id").cast("string").alias("dst"),
                ),
                n_iters=1,
            ),
        ),
        (
            "Sessionization (per-event session numbering)",
            "Claim: ONE exchange + ONE sort — the gap-detect lag and the "
            "session-numbering running sum are two Window nodes sharing the "
            "same (key, ts, tie-break) sort order; no join.  "
            "Gate: tests/test_plans.py::test_sessionize_single_exchange.",
            sessions.sessionize(ev, gap_seconds=1800),
        ),
        (
            "Corpus boilerplate removal",
            "Claim: distinct-doc unit counting is two two-phase hash "
            "aggregates; removal is an anti join on the EXACT unit string "
            "(broadcast here via AQE, shuffle at scale); reassembly is one "
            "ObjectHashAggregate (array_sort(collect_list)) — no window, no "
            "cartesian.  Gate: tests/test_boilerplate.py (equality + "
            "repartition invariance).",
            boilerplate.remove_boilerplate(
                d.select("doc_id", "text"), window_words=3, min_docs=5
            ),
        ),
        (
            "PMI edge weighting",
            "Claim: the corpus total joins as a ONE-row broadcast (the only "
            "nested-loop join); marginal joins are equi joins; no driver "
            "action.  (Plan shown with materialize=False so the full lazy "
            "tree is visible; the default lazily checkpoints the distinct "
            "pairs because they feed four aggregates.)  "
            "Gate: tests/test_assoc.py hand-formula + role-marginal tests.",
            assoc.pmi_edge_weights(
                ev.select(
                    F.col("event_type").alias("subj"),
                    F.col("user_id").cast("string").alias("obj"),
                    F.col("event_id").alias("doc_id"),
                ),
                materialize=False,
            ),
        ),
        (
            "Code import-graph → repo dependency edges",
            "Claim: import extraction is a shuffle-free codegen projection "
            "(per-lang CASE over regexp_extract_all + one explode/Generate); "
            "module→owner resolution is a BroadcastHashJoin; the per-(src,"
            "dst) edge rollup is a partial+final hash aggregate.  Gates: "
            "tests/test_codegraph.py::test_extraction_plan_is_shuffle_free, "
            "::test_owners_broadcast_plan.",
            codegraph.repo_dependency_edges(
                codegraph.extract_import_edges(_cg_docs), _cg_owners
            ),
        ),
        (
            "Exact set-similarity join (prefix filtering)",
            "Claim: candidate generation is an equi join on prefix tokens "
            "(never CartesianProduct/BroadcastNestedLoopJoin); the verify "
            "stage is two equi joins bringing the ordered arrays to the "
            "DISTINCT candidate pairs.  "
            "Gate: tests/test_setsim.py::TestPlan::test_no_cartesian + "
            "seeded brute-force equality at 4 thresholds.",
            _setsim_section(d),
        ),
        (
            "Substring-duplication spans (k-gram form)",
            "Claim: one explode + ONE gram-count aggregate (map-side "
            "partial) + one equi join of positions against the duplicated "
            "gram set (never cartesian) + the islands Window PAIR sharing a "
            "single (doc, pos) sort — nothing quadratic anywhere.  "
            "Gate: tests/test_substrdup.py::test_plan_shape + seeded "
            "brute-force equality at 3 k values.",
            _substrdup_section(d),
        ),
        (
            "SCD2 latest snapshot (algebraic route)",
            "Claim: partial_max + final max HashAggregate — no Window (the "
            "snapshot is the constantly-refreshed view; a hot key reduces "
            "map-side).  Gate: tests/test_cdc.py::TestSnapshot::"
            "test_snapshot_plan_partial_agg_no_window + equality vs the "
            "window-route history's open intervals.",
            _scd2_snapshot_section(ev),
        ),
        (
            "ANN LSH top-k (bucketed candidate join)",
            "Claim: candidate generation is an equi join on bucket ids "
            "(broadcast of the exploded probe buckets), followed by one "
            "top-k window — never an all-pairs cross join.",
            similarity.lsh_topk(
                emb,
                emb.limit(4).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                k=5,
            ),
        ),
        (
            "Edit-distance join (FastSS deletion-key blocking)",
            "Claim: deletion-neighborhood generation is a shuffle-free "
            "codegen projection (transform/substring HOFs + one Generate); "
            "candidates come from ONE equi self-join on deletion keys with "
            "a distinct-pair reduction BEFORE the levenshtein verify — "
            "never CartesianProduct/BroadcastNestedLoopJoin.  "
            "Gate: tests/test_editdist.py::test_guards_and_plan + "
            "brute-force equality at d=1/2.",
            _editdist_section(d),
        ),
        (
            "Negative sampling (md5 pool + broadcast draw join)",
            "Claim: the entity pool is TakeOrderedAndProject (map-side "
            "top-M, one M-row merge — never a global sort); its dense "
            "index is a window over ≤ pool_size rows by construction; the "
            "draw joins are broadcasts of the one-row count and the M-row "
            "pool; the filter is one anti join on the true triple set.  "
            "Gate: tests/test_negsample.py replay + twin parity.",
            _negsample_section(d),
        ),
        (
            "Node similarity / link prediction (wedge self-join)",
            "Claim: ONE equi self-join keyed on the wedge CENTER z (never "
            "CartesianProduct/BroadcastNestedLoopJoin — the Σ deg² cost is "
            "bounded by the max_degree center cap at scale); one (a, b) "
            "hash aggregate with map-side partials; the degree and "
            "edge-mark joins attach to the AGGREGATED pair frame, never "
            "the wedge stream.  "
            "Gate: tests/test_linkpred.py::test_no_cartesian_plan + "
            "python-replay equality.",
            _linkpred_section(ev),
        ),
        (
            "Transitive-closure doubling round (equi self-join + min fold)",
            "Claim: each path-doubling round is ONE equi self-join on the "
            "frontier key plus ONE (src, dst) min-hops hash aggregate — "
            "never CartesianProduct/BroadcastNestedLoopJoin; O(log diameter) "
            "rounds total, each localCheckpointed.  "
            "Gate: tests/test_transclose.py::test_round_join_plan_no_cartesian.",
            _transclose_section(spark),
        ),
        (
            "Incremental connected components (broadcast label remap)",
            "Claim: the stored labeling is scanned ONCE and its update is a "
            "BroadcastHashJoin against the O(batch) remap — never a shuffle "
            "of the corpus-sized labeling, never a cartesian.  "
            "Gate: tests/test_canonicalize.py::test_cc_incremental_remap_is_broadcast.",
            _cc_incremental_section(spark),
        ),
    ]


def main() -> None:
    from military_entity_extraction_based_on_large_models_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sections = build_sections(spark)

    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    out = [
        "# PLANS — formatted physical plans of the gated operators",
        "",
        f"Generated by `python tools/dump_plans.py` at {stamp} on sf0.001, "
        "`local[32]`, shuffle_partitions=8.  Regenerate after plan-affecting "
        "changes; the claims are enforced by the named tests, this file just "
        "makes them reviewable without a Spark session.",
        "",
    ]
    for title, claim, df in sections:
        out += [f"## {title}", "", claim, "", "```", plan(df).rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written,", len(sections), "sections")


if __name__ == "__main__":
    main()
