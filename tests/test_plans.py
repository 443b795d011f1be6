"""Plan-quality gates: the physical plans we rely on at 100 TB must actually
materialize — predicate pushdown and column pruning into the parquet scan,
broadcast joins for dimension tables, whole-stage codegen for columnar
expressions, and no per-predicate re-shuffles in triple materialization."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 49).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    # pruned scan: only the two referenced columns in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_broadcast_join_for_dimension(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    q = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in _plan(q)


def test_semi_join_strategy(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = orders.join(
        li.select("l_orderkey"), orders.o_orderkey == F.col("l_orderkey"), "left_semi"
    )
    plan = _plan(q)
    assert "LeftSemi" in plan


def test_triples_single_shuffle(spark, docs_df):
    """materialize_triples must contribute exactly ONE exchange beyond the
    extraction stage — the groupBy on the hashed doc key."""
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        dedup_mentions,
        extract_mentions,
    )
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        materialize_triples,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        MILITARY_GAZETTEER,
    )

    import re

    def n_exchanges(df):
        # count the "(k) Exchange" detail headers — one per physical exchange
        return len(re.findall(r"^\(\d+\) Exchange", _plan(df), re.M))

    deduped = dedup_mentions(extract_mentions(docs_df, MILITARY_GAZETTEER))
    triples = materialize_triples(deduped)
    assert n_exchanges(triples) == n_exchanges(deduped) + 1


def test_flagship_pipeline_zero_shuffle(spark):
    """With no ambiguous aliases, the whole extract→triples pipeline must
    contain NO exchange beyond the input repartition: the per-doc mention
    arrays never leave their partition."""
    import re

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
    triples = kg_pipeline(docs, VOCAB_GAZETTEER, context_terms={})
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", _plan(triples), re.M))
    assert n_exchanges <= 1  # only the scale_out input repartition


def test_whole_stage_codegen_for_text_features(spark):
    from military_entity_extraction_based_on_large_models_spark.functions import (
        text as T,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # punct_ratio/fingerprint are plain expressions → codegen'd; token_count
    # uses higher-order functions, which Spark evaluates outside codegen by
    # design — don't assert on those
    q = d.select(
        "doc_id",
        T.punct_ratio(F.col("text")).alias("p"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    # formatted explain marks codegen'd operators with a '*' prefix
    assert "* Project" in _plan(q)


def test_truncate_plan_stats_stops_estimate_compounding(spark):
    """localCheckpoint keeps the origin plan's size estimate; in an iterative
    join loop that estimate compounds double-exponentially (digit count
    doubles per round) until the driver hangs in BigInteger stats math.
    truncate_plan_stats must keep the estimate bounded."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.plans.parallelism import (
        truncate_plan_stats,
    )

    def digits(df):
        return len(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    comp = (
        spark.range(100)
        .select(F.col("id").alias("node"), F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    naive = comp
    pinned = comp
    for _ in range(4):
        def step(df):
            parent = df.select(
                F.col("node").alias("component"), F.col("component").alias("grand")
            )
            return df.join(parent, "component", "left").select(
                "node", F.coalesce("grand", "component").alias("component")
            )

        naive = step(naive).localCheckpoint(eager=True)
        pinned = truncate_plan_stats(step(pinned).localCheckpoint(eager=True))
    assert digits(naive) > 2 * digits(pinned)  # compounding reproduced...
    assert digits(pinned) <= 25                # ...and stopped by the pin
    assert pinned.count() == 100


def test_aggregate_is_partial_then_final(spark):
    """groupBy must plan a map-side partial aggregate before the shuffle."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(q)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_scale_out_local_relation_and_shuffle_passthrough(spark):
    """Round-3 review: the no-input-files fallback must use the plan-only
    isLocal check — local relations repartition to the target; post-shuffle
    frames pass through UNCHANGED (the old df.rdd probe executed the
    upstream shuffle as a throwaway job under AQE)."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.plans.parallelism import (
        scale_out,
    )

    target = spark.sparkContext.defaultParallelism
    rdd = spark.sparkContext.parallelize([(i,) for i in range(10)], 2)
    local = spark.createDataFrame(rdd, ["x"])
    assert local.rdd.getNumPartitions() == 2  # genuinely under-partitioned
    assert scale_out(local).rdd.getNumPartitions() == target

    shuffled = local.groupBy("x").count()
    assert scale_out(shuffled) is shuffled  # identity: no probe, no exchange


def test_range_join_is_equi_not_nested_loop(spark):
    """range_join's reason to exist: the binned composition must plan as an
    equi join (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin), never the
    BroadcastNestedLoopJoin a raw inequality join degenerates to."""
    import datetime as dt

    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame([("u", t0, 1)], ["user", "ts", "pid"])
    intervals = spark.createDataFrame(
        [("u", t0, t0 + dt.timedelta(hours=2), 7)],
        ["user", "start", "end", "iid"],
    )
    binned = _plan(range_join(points, intervals, on="user"))
    assert "NestedLoop" not in binned
    assert any(j in binned for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))

    # the degeneration the binning exists to avoid: with no equi component
    # (global intervals) Spark can only nested-loop; with only a key, the
    # merge still tests every same-key (point, interval) pair — the bin adds
    # the missing equi dimension in both cases
    raw = _plan(
        points.join(
            intervals.drop("user"),
            (intervals.start <= points.ts) & (points.ts < intervals.end),
        )
    )
    assert "NestedLoop" in raw or "CartesianProduct" in raw


def test_asof_join_single_exchange(spark):
    """asof_join must cost ONE shuffle (the key partition for the window) on
    top of the inputs — no join operator, no row multiplication."""
    import datetime as dt

    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        asof_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([("u", t0, 1)], ["user", "ts", "lid"])
    right = spark.createDataFrame([("u", t0, 2.0)], ["user", "ts", "rv"])
    plan = _plan(asof_join(left, right, on="user"))
    assert "Join" not in plan
    n_exchanges = plan.count("Exchange")
    # one content exchange; AQE may render it plus its shuffle-read twice in
    # the formatted tree, so assert the count stays tiny rather than == 1
    assert 1 <= n_exchanges <= 2, plan


def test_sessionize_single_exchange(spark):
    """Both window passes (gap-detect lag + session-numbering running sum)
    must share one (key, order) sort: ONE exchange, ONE sort, no join."""
    import datetime as dt

    from military_entity_extraction_based_on_large_models_spark.operators.sessions import (
        sessionize,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame([(1, t0, 7, 1.0)], ["event_id", "ts", "user_id", "value"])
    plan = _plan(sessionize(ev, gap_seconds=1800))
    assert "Join" not in plan
    assert 1 <= plan.count("Exchange") <= 2, plan
    # exactly one Sort node in the operator tree: a second would mean the
    # two windows stopped sharing their sort order
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    sorts = [l for l in tree.splitlines() if "Sort" in l]
    assert len(sorts) == 1, tree


def test_plans_md_shape_drift_gate(spark):
    """PLANS.md cannot silently diverge from the shipped plans (ADVICE r4 /
    VERDICT "Next round" #7): rebuild every gated plan via the generator's
    own build_sections and compare the operator-tree SHAPE (node lines with
    per-run numbers stripped — expression ids and plan_ids live in the
    detail section, which is not compared) against the committed file.
    Fails with the regeneration command when a plan-affecting change ships
    without `python tools/dump_plans.py`."""
    import os
    import re
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    import dump_plans

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")) as f:
        text = f.read()
    committed = {}
    for block in re.split(r"^## ", text, flags=re.M)[1:]:
        title = block.splitlines()[0].strip()
        m = re.search(r"```\n(.*?)```", block, re.S)
        assert m, f"PLANS.md section {title!r} has no plan block"
        committed[title] = dump_plans.shape(m.group(1))

    live = {
        title: dump_plans.shape(dump_plans.plan(df))
        for title, _claim, df in dump_plans.build_sections(spark)
    }
    assert set(live) == set(committed), (
        "PLANS.md sections out of sync — run: python tools/dump_plans.py"
    )
    for title in live:
        assert live[title] == committed[title], (
            f"plan shape drifted for {title!r} — run: python tools/dump_plans.py"
        )
