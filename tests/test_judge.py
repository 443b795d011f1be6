"""Judge operators vs the reference's matching rules (judge/judge_entity.py)."""

from __future__ import annotations

from pyspark.sql import Row

from military_entity_extraction_based_on_large_models_spark.operators import judge


def _box(xmin, ymin, xmax, ymax):
    return Row(xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax)


def _frame(spark, rows):
    from military_entity_extraction_based_on_large_models_spark.functions.geometry import (
        BOX_SCHEMA,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_key", StringType()),
            StructField("name", StringType()),
            StructField("label", StringType()),
            StructField("bnd", BOX_SCHEMA),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_matching_rules(spark):
    gold = _frame(
        spark,
        [
            ("d1", "F-16", "aircraft", _box(0, 0, 10, 10)),
            ("d1", "NATO", "other", None),                      # both-null case
            ("d2", "Leopard 2", "vehicle", _box(0, 0, 10, 10)),
            ("d3", "G36", "weapon", _box(0, 0, 10, 10)),        # unmatched gold
        ],
    )
    pred = _frame(
        spark,
        [
            ("d1", "F-16", "aircraft", _box(1, 1, 11, 11)),     # IoU≈0.68 → match
            ("d1", "NATO", "other", None),                      # null-null → match
            ("d2", "Leopard 2", "vehicle", _box(8, 8, 18, 18)), # IoU≈0.02 → no
            ("d4", "HIMARS", "weapon", None),                   # doc not in gold
        ],
    )
    m = judge.matched_pairs(pred, gold)
    got = {(r["doc_key"], r["name"]) for r in m.collect()}
    assert got == {("d1", "F-16"), ("d1", "NATO")}

    prf = judge.micro_prf(pred, gold).first()
    assert prf["tp"] == 2 and prf["pred_total"] == 4 and prf["gold_total"] == 4
    assert abs(prf["precision"] - 0.5) < 1e-12
    assert abs(prf["f1"] - 0.5) < 1e-12


def test_greedy_one_to_one(spark):
    # two identical preds, one gold → only one TP (matched-gold bitmap,
    # text_panduan.py:119-139)
    gold = _frame(spark, [("d1", "G36", "weapon", None)])
    pred = _frame(spark, [("d1", "G36", "weapon", None), ("d1", "G36", "weapon", None)])
    assert judge.matched_pairs(pred, gold).count() == 1


def test_greedy_survives_rank_shift(spark):
    """A non-matching pred earlier in coordinate order shifts ranks; the
    round-1 rank-equality join lost the true match ((p2,g1) has p_rank 2 ≠
    g_rank 1), the greedy bitmap fold must keep it (ADVICE r01)."""
    gold = _frame(spark, [("d1", "X", "weapon", _box(5, 5, 15, 15))])
    pred = _frame(
        spark,
        [
            ("d1", "X", "weapon", _box(0, 0, 2, 2)),    # rank 1, agrees nothing
            ("d1", "X", "weapon", _box(5, 5, 15, 15)),  # rank 2, exact match
        ],
    )
    m = judge.matched_pairs(pred, gold).collect()
    assert len(m) == 1
    assert m[0]["p_rank"] == 2 and m[0]["g_rank"] == 1


def test_greedy_cross_arranged_pairs(spark):
    """Cross-arranged agreement (p1 agrees g1+g2, p2 agrees g1 only): greedy
    gives p1→g1, p2 unmatched... wait — greedy gives p1 the LOWEST unmatched
    gold (g1), leaving p2 (which only agrees g1) unmatched → 1 TP; a maximum
    matching would find 2.  The reference is greedy, not maximum — assert the
    greedy outcome."""
    gold = _frame(
        spark,
        [
            ("d1", "X", "weapon", _box(0, 0, 10, 10)),   # g_rank 1
            ("d1", "X", "weapon", _box(1, 1, 11, 11)),   # g_rank 2
        ],
    )
    pred = _frame(
        spark,
        [
            ("d1", "X", "weapon", _box(0, 0, 10, 10)),   # p_rank 1: agrees both
            ("d1", "X", "weapon", _box(0, 0, 10, 11)),   # p_rank 2: agrees g1 (IoU 10/11) and g2? IoU((0,0,10,11),(1,1,11,11)) = 81/129 ≈ 0.63 → both!
        ],
    )
    m = {(r["p_rank"], r["g_rank"]) for r in judge.matched_pairs(pred, gold).collect()}
    # greedy in (p,g) lexicographic order: (1,1) matched, then (2,2)
    assert m == {(1, 1), (2, 2)}


def test_per_label_prf(spark):
    gold = _frame(
        spark,
        [("d1", "F-16", "aircraft", None), ("d1", "G36", "weapon", None)],
    )
    pred = _frame(
        spark,
        [("d1", "F-16", "aircraft", None), ("d1", "Javelin", "weapon", None)],
    )
    rows = {r["label"]: r for r in judge.per_label_prf(pred, gold).collect()}
    assert rows["aircraft"]["f1"] == 1.0
    assert rows["weapon"]["tp"] == 0 and rows["weapon"]["precision"] == 0.0


def test_per_doc_errors(spark):
    """Reference S6 report (judge_entity.py:141-160): per-doc correct /
    incorrect / missed with multiplicity (two identical preds vs one gold →
    one correct + one incorrect)."""
    gold = _frame(
        spark,
        [
            ("d1", "G36", "weapon", None),
            ("d1", "F-16", "aircraft", _box(0, 0, 10, 10)),
            ("d2", "NATO", "other", None),                    # missed entirely
        ],
    )
    pred = _frame(
        spark,
        [
            ("d1", "G36", "weapon", None),
            ("d1", "G36", "weapon", None),                    # duplicate → incorrect
            ("d1", "F-16", "aircraft", _box(1, 1, 11, 11)),   # IoU≈0.68 → correct
            ("d3", "HIMARS", "weapon", None),                 # doc absent in gold
        ],
    )
    rows = {r["doc_key"]: r for r in judge.per_doc_errors(pred, gold).collect()}
    assert set(rows) == {"d1", "d2", "d3"}
    d1 = rows["d1"]
    assert d1["correct"] == "F-16|aircraft;G36|weapon"
    assert d1["incorrect"] == "G36|weapon" and d1["n_incorrect"] == 1
    assert d1["missed"] == "" and d1["n_missed"] == 0
    d2 = rows["d2"]
    assert d2["missed"] == "NATO|other" and d2["n_correct"] == 0
    d3 = rows["d3"]
    assert d3["incorrect"] == "HIMARS|weapon" and d3["n_missed"] == 0


def test_sample_accuracy_and_max_area(spark):
    gold = _frame(
        spark,
        [
            ("d1", "F-16", "aircraft", None),
            ("d2", "G36", "weapon", _box(0, 0, 2, 2)),
            ("d2", "G36", "weapon", _box(0, 0, 50, 50)),  # max-area rep
        ],
    )
    pred = _frame(spark, [("d1", "F-16", "aircraft", None)])
    docs = spark.createDataFrame([("d1",), ("d2",), ("d3",)], ["doc_key"])
    acc = judge.sample_accuracy(pred, gold, docs).first()
    # d1 fully correct; d2 missed; d3 empty-empty correct
    assert acc["correct_samples"] == 2 and acc["total_samples"] == 3

    rep = judge.max_area_gold(gold).where("doc_key='d2'").first()
    assert rep["bnd"]["xmax"] == 50


def test_song_prf_entity_level(spark):
    # Reference counting (judge_entity_song.py:38-125): totals are the RAW
    # row counts; only gold collapses (d1/G36 rep = 0,0,50,50); a matched
    # group credits its FULL size (d1/G36 → tp += 2).
    gold = _frame(
        spark,
        [
            ("d1", "G36", "weapon", _box(0, 0, 2, 2)),
            ("d1", "G36", "weapon", _box(0, 0, 50, 50)),
            ("d1", "NATO", "other", None),          # null rep, matched
            ("d2", "F-16", "aircraft", _box(0, 0, 10, 10)),  # missed
        ],
    )
    pred = _frame(
        spark,
        [
            ("d1", "G36", "weapon", _box(1, 1, 51, 51)),   # IoU vs rep > 0.5
            ("d1", "G36", "weapon", _box(40, 40, 42, 42)), # fails vs rep; group
            # already matched by the big pred — counts only in pred_total
            ("d1", "NATO", "other", None),
            ("d3", "HIMARS", "weapon", _box(0, 0, 5, 5)),  # spurious
        ],
    )
    prf = judge.song_prf(pred, gold).first()
    # tp = 2 (G36 group size) + 1 (NATO) = 3; totals = all 4 rows each side
    assert prf["pred_total"] == 4 and prf["gold_total"] == 4
    assert prf["tp"] == 3
    assert abs(prf["precision"] - 3 / 4) < 1e-12
    assert abs(prf["recall"] - 3 / 4) < 1e-12
    assert abs(prf["f1"] - 3 / 4) < 1e-12


def test_song_prf_group_size_credit_can_exceed_pred_total(spark):
    # The reference's quirk, reproduced on purpose: one pred matching a
    # 3-member gold group yields tp=3 > pred_total=1, so precision = 3.
    gold = _frame(
        spark,
        [
            ("d1", "G36", "weapon", _box(0, 0, 10, 10)),
            ("d1", "G36", "weapon", _box(0, 0, 2, 2)),
            ("d1", "G36", "weapon", _box(5, 5, 6, 6)),
        ],
    )
    pred = _frame(spark, [("d1", "G36", "weapon", _box(0, 0, 10, 10))])
    prf = judge.song_prf(pred, gold).first()
    assert prf["tp"] == 3 and prf["pred_total"] == 1 and prf["gold_total"] == 3
    assert prf["precision"] == 3.0 and prf["recall"] == 1.0


def test_song_accuracy_gold_side_rule(spark):
    # judge_song.py:32-107: universe = gold docs; spurious preds ignored;
    # a doc is correct iff every gold group's max-area rep is matched.
    gold = _frame(
        spark,
        [
            ("d1", "G36", "weapon", _box(0, 0, 2, 2)),
            ("d1", "G36", "weapon", _box(0, 0, 50, 50)),
            ("d1", "NATO", "other", None),
            ("d2", "F-16", "aircraft", _box(0, 0, 10, 10)),  # unmatched
        ],
    )
    pred = _frame(
        spark,
        [
            ("d1", "G36", "weapon", _box(1, 1, 51, 51)),
            ("d1", "NATO", "other", None),
            ("d1", "HIMARS", "weapon", _box(0, 0, 5, 5)),  # spurious: no penalty
            ("d3", "HIMARS", "weapon", None),              # doc not in universe
        ],
    )
    acc = judge.song_accuracy(pred, gold).first()
    assert acc["correct_samples"] == 1 and acc["total_samples"] == 2
    assert abs(acc["accuracy"] - 0.5) < 1e-12
