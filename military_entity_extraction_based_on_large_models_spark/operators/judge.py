"""Evaluation as DataFrames — the reference's judge/*.py semantics.

Reproduced exactly (SURVEY.md §2.4 J2-J4, §2.5 A2-A7, §3 EP3):

* predictions and golds join full-outer on the document key; a missing side
  is an empty set (judge_entity.py:47-48 ``pred_data.get(id, [])``).
* an entity matches iff (name, label) are equal AND the boxes agree:
  both null, or IoU > 0.5 (judge_entity.py:80-105, threshold at :96).
* greedy 1-1 matching (matched-gold bitmap, text_panduan.py:119-139) is
  reproduced exactly: agreement pairs are ranked deterministically on both
  sides, then a JVM-side ``aggregate`` fold walks the pairs in (pred rank,
  gold rank) order and keeps a pair iff neither side is already matched —
  precisely the reference's "first unmatched gold wins" bitmap loop.  (The
  round-1 rank-equality join under-counted cross-arranged pairs: preds
  [A',B'] vs golds [B,A] greedy-match 2 TPs but rank-equality found 0.)
  The only divergence from the reference is the iteration order: the
  reference walks original list order, which the relational frames don't
  carry; we canonicalize to coordinate order on both sides.
* micro P/R/F1 counters: P = TP/|pred|, R = TP/|gold|
  (judge_entity.py:123-125); per-label breakdown (text_panduan.py:131-169).
* max-area representative matching (judge_song.py:49-68): keep the max-area
  gold box per (doc, name, label) via ``max_by`` and match against it.

Inputs are frames with columns (doc_key, name, label, bnd) where bnd is the
nullable box struct (functions.geometry.BOX_SCHEMA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import area, iou

IOU_THRESHOLD = 0.5  # judge/judge.py:78, judge_entity.py:96


def _boxes_agree(pred_bnd, gold_bnd):
    both_null = pred_bnd.isNull() & gold_bnd.isNull()
    both_set = pred_bnd.isNotNull() & gold_bnd.isNotNull()
    return both_null | (both_set & (iou(pred_bnd, gold_bnd) > IOU_THRESHOLD))


def _rank_order(prefix: str):
    return [
        F.coalesce(F.col(f"{prefix}.{c}"), F.lit(-1))
        for c in ("xmin", "ymin", "xmax", "ymax")
    ]


KEYS = ["doc_key", "name", "label"]


def _ranked_pred(pred: DataFrame) -> DataFrame:
    """Pred rows ranked deterministically within (doc_key, name, label) by box
    coordinates — the shared rank space of matched_pairs and per_doc_errors."""
    return pred.select(
        *KEYS, F.col("bnd").alias("p_bnd")
    ).withColumn(
        "p_rank",
        F.row_number().over(
            Window.partitionBy(*KEYS).orderBy(*_rank_order("p_bnd"))
        ),
    )


def _ranked_gold(gold: DataFrame) -> DataFrame:
    return gold.select(
        *KEYS, F.col("bnd").alias("g_bnd")
    ).withColumn(
        "g_rank",
        F.row_number().over(
            Window.partitionBy(*KEYS).orderBy(*_rank_order("g_bnd"))
        ),
    )


def matched_pairs(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Greedy 1-1 matched (pred, gold) pairs under the reference's rule
    (matched-gold bitmap loop, text_panduan.py:119-139; judge_entity.py:68-105).

    Plan: rank both sides deterministically within (doc_key, name, label) by
    box coordinates; equi-join and keep box-agreeing (p_rank, g_rank) pairs;
    collect each group's pairs sorted lexicographically and fold them with a
    built-in ``aggregate`` expression that keeps a pair iff neither rank has
    matched yet — pred ranks are visited in order and each takes the lowest
    unmatched agreeing gold, exactly the reference's greedy semantics.  The
    fold runs JVM-side (no Python); groups are per-(doc, entity) and tiny, so
    the O(k²) membership scans are negligible and the only shuffle is the
    groupBy on the join keys.

    Returns (doc_key, name, label, p_rank, g_rank).
    """
    keys = KEYS
    p = _ranked_pred(pred)
    g = _ranked_gold(gold)
    agree = (
        p.join(g, keys)
        .where(_boxes_agree(F.col("p_bnd"), F.col("g_bnd")))
        .select(*keys, "p_rank", "g_rank")
    )
    pairs = agree.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct("p_rank", "g_rank"))).alias("_prs")
    )
    init = F.struct(
        F.array().cast("array<int>").alias("mp"),
        F.array().cast("array<int>").alias("mg"),
        F.array().cast("array<struct<p_rank:int,g_rank:int>>").alias("out"),
    )

    def _greedy_step(acc, pair):
        free = ~F.array_contains(acc["mp"], pair["p_rank"]) & ~F.array_contains(
            acc["mg"], pair["g_rank"]
        )
        return F.when(
            free,
            F.struct(
                F.array_append(acc["mp"], pair["p_rank"]).alias("mp"),
                F.array_append(acc["mg"], pair["g_rank"]).alias("mg"),
                F.array_append(acc["out"], pair).alias("out"),
            ),
        ).otherwise(acc)

    return pairs.select(
        *keys,
        F.explode(F.aggregate("_prs", init, _greedy_step)["out"]).alias("_m"),
    ).select(*keys, F.col("_m.p_rank").alias("p_rank"), F.col("_m.g_rank").alias("g_rank"))


def per_doc_errors(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-document error-analysis report — the reference's S6 sink
    (judge_entity.py:141-160: per-doc correct / incorrect / missed entity
    lists), the first thing a user debugging extraction quality reads.

    For every document in pred ∪ gold:

    * ``correct``   — matched predictions ("name|label", sorted, ';'-joined);
    * ``incorrect`` — predictions no greedy match claimed (spurious);
    * ``missed``    — gold entities no prediction matched;

    plus their counts.  Membership is decided by (doc, name, label, rank)
    semi/anti-joins against ``matched_pairs``, so multiplicity is honored: two
    identical preds vs one gold yield one correct and one incorrect, exactly
    as the reference's bitmap loop reports.  Eval-surface query — the greedy
    fold lineage is referenced by all three branches; Catalyst reuses the
    exchange, and groups are per-doc tiny.
    """
    m = matched_pairs(pred, gold)
    p = _ranked_pred(pred)
    g = _ranked_gold(gold)
    ent = F.concat_ws("|", "name", "label")

    def _agg(df: DataFrame, col: str) -> DataFrame:
        return df.groupBy("doc_key").agg(
            F.array_join(F.sort_array(F.collect_list(ent)), ";").alias(col),
            F.count(F.lit(1)).alias(f"n_{col}"),
        )

    correct = _agg(p.join(m, [*KEYS, "p_rank"], "left_semi"), "correct")
    incorrect = _agg(p.join(m, [*KEYS, "p_rank"], "left_anti"), "incorrect")
    missed = _agg(g.join(m, [*KEYS, "g_rank"], "left_anti"), "missed")
    docs = (
        pred.select("doc_key").unionByName(gold.select("doc_key")).distinct()
    )
    out = (
        docs.join(correct, "doc_key", "left")
        .join(incorrect, "doc_key", "left")
        .join(missed, "doc_key", "left")
    )
    return out.select(
        "doc_key",
        *[F.coalesce(c, F.lit("")).alias(c) for c in ("correct", "incorrect", "missed")],
        *[
            F.coalesce(f"n_{c}", F.lit(0)).alias(f"n_{c}")
            for c in ("correct", "incorrect", "missed")
        ],
    )


def micro_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """One-row frame (tp, pred_total, gold_total, precision, recall, f1) —
    counter definitions from judge_entity.py:123-125.

    Single lazy aggregation (one Spark job on collect): pred / gold / matched
    rows are tagged and unioned, then summed once — the round-1 version drove
    three separate count() actions and re-ran the matched-pairs lineage.
    """
    def _tag(df: DataFrame, p: int, g: int, m: int) -> DataFrame:
        return df.select(
            F.lit(p).alias("_p"), F.lit(g).alias("_g"), F.lit(m).alias("_m")
        )

    tagged = (
        _tag(pred, 1, 0, 0)
        .unionByName(_tag(gold, 0, 1, 0))
        .unionByName(_tag(matched_pairs(pred, gold), 0, 0, 1))
    )
    counts = tagged.agg(
        F.coalesce(F.sum("_m"), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("_p"), F.lit(0)).alias("pred_total"),
        F.coalesce(F.sum("_g"), F.lit(0)).alias("gold_total"),
    )
    prec = F.when(
        F.col("pred_total") > 0, F.col("tp") / F.col("pred_total")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("gold_total") > 0, F.col("tp") / F.col("gold_total")
    ).otherwise(F.lit(0.0))
    out = counts.select(
        "tp",
        "pred_total",
        "gold_total",
        prec.alias("precision"),
        rec.alias("recall"),
    )
    return out.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def per_label_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-label (label, tp, pred_total, gold_total, precision, recall, f1) —
    text_panduan.py:131-198 as one grouped aggregation."""
    tp = matched_pairs(pred, gold).groupBy("label").agg(F.count(F.lit(1)).alias("tp"))
    pt = pred.groupBy("label").agg(F.count(F.lit(1)).alias("pred_total"))
    gt = gold.groupBy("label").agg(F.count(F.lit(1)).alias("gold_total"))
    out = (
        pt.join(gt, "label", "full_outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("pred_total", F.lit(0)).alias("pred_total"),
            F.coalesce("gold_total", F.lit(0)).alias("gold_total"),
        )
    )
    p = F.when(F.col("pred_total") > 0, F.col("tp") / F.col("pred_total")).otherwise(F.lit(0.0))
    r = F.when(F.col("gold_total") > 0, F.col("tp") / F.col("gold_total")).otherwise(F.lit(0.0))
    out = out.withColumn("precision", p).withColumn("recall", r)
    return out.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def sample_accuracy(pred: DataFrame, gold: DataFrame, docs: DataFrame) -> DataFrame:
    """All-or-nothing per-document accuracy (judge/judge.py:30-99): a doc is
    correct iff every gold entity is matched and no spurious prediction
    exists.  ``docs`` provides the full doc_key universe (J2 outer join)."""
    m = matched_pairs(pred, gold)
    per_doc = (
        docs.select("doc_key")
        .distinct()
        .join(pred.groupBy("doc_key").agg(F.count(F.lit(1)).alias("n_pred")), "doc_key", "left")
        .join(gold.groupBy("doc_key").agg(F.count(F.lit(1)).alias("n_gold")), "doc_key", "left")
        .join(m.groupBy("doc_key").agg(F.count(F.lit(1)).alias("n_match")), "doc_key", "left")
        .fillna(0, ["n_pred", "n_gold", "n_match"])
    )
    correct = (F.col("n_match") == F.col("n_gold")) & (F.col("n_match") == F.col("n_pred"))
    return per_doc.agg(
        F.sum(correct.cast("int")).alias("correct_samples"),
        F.count(F.lit(1)).alias("total_samples"),
        (F.sum(correct.cast("int")) / F.count(F.lit(1))).alias("accuracy"),
    )


def _gold_reps(gold: DataFrame) -> DataFrame:
    """Max-area representative per gold (doc, name, label) group WITH the
    group size — the song judges' shared gold collapse (judge_song.py:55-69,
    judge_entity_song.py:78-92: a null bnd counts as area 0, NOT excluded).
    The reference breaks equal-area ties first-in-list-order; frames carry no
    list order, so ties break on box coordinates (nulls rank as -1) —
    deterministic and oracle-replicable.  Returns
    (doc_key, name, label, g_bnd, n_grp)."""
    with_area = gold.withColumn(
        "_area",
        F.when(F.col("bnd").isNotNull(), area(F.col("bnd"))).otherwise(F.lit(0)),
    )
    w = Window.partitionBy(*KEYS).orderBy(F.col("_area").desc(), *_rank_order("bnd"))
    return (
        with_area.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*KEYS)))
        .where(F.col("_rn") == 1)
        .select(*KEYS, F.col("bnd").alias("g_bnd"), F.col("_n").alias("n_grp"))
    )


def _matched_song_groups(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Gold (doc, name, label) groups matched under the song rule: the group
    is matched iff ANY prediction with the same (name, label) in the doc
    agrees with the group's max-area representative — both boxes null, or
    IoU > 0.5 (judge_song.py:71-89, judge_entity_song.py:94-101; a failed
    pred does NOT consume the group, a later pred can still match it).
    Returns one row per matched group: (doc_key, name, label, n_grp)."""
    reps = _gold_reps(gold)
    p = pred.select(*KEYS, F.col("bnd").alias("p_bnd"))
    return (
        reps.join(p, KEYS)
        .where(_boxes_agree(F.col("p_bnd"), F.col("g_bnd")))
        .select(*KEYS, "n_grp")
        .distinct()
    )


def song_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Entity-level max-area P/R/F1 — the reference's counting reproduced
    exactly (judge_entity_song.py:38-125): pred_total and gold_total count ALL
    rows uncollapsed (:52, :57); only the GOLD side collapses to its max-area
    representative per (doc, name, label) (:78-92, null bnd = area 0); a group
    is matched iff ANY pred in the group agrees with the representative
    (:94-101); tp credits the FULL gold group size (:105,
    ``true_positives += len(candidates)``).  Precision = tp / pred_total can
    therefore exceed 1 when matched gold groups out-size the pred list — the
    reference's arithmetic, reproduced rather than cleaned up (the r4 version
    collapsed both sides and counted one rep per group; ADVICE r4 flagged the
    divergence)."""
    matched = _matched_song_groups(pred, gold)

    def _tag(df: DataFrame, p: int, g: int, m) -> DataFrame:
        return df.select(
            F.lit(p).alias("_p"), F.lit(g).alias("_g"), m.alias("_m")
        )

    tagged = (
        _tag(pred, 1, 0, F.lit(0).cast("bigint"))
        .unionByName(_tag(gold, 0, 1, F.lit(0).cast("bigint")))
        .unionByName(_tag(matched, 0, 0, F.col("n_grp").cast("bigint")))
    )
    counts = tagged.agg(
        F.coalesce(F.sum("_m"), F.lit(0)).alias("tp"),
        F.coalesce(F.sum("_p"), F.lit(0)).alias("pred_total"),
        F.coalesce(F.sum("_g"), F.lit(0)).alias("gold_total"),
    )
    prec = F.when(
        F.col("pred_total") > 0, F.col("tp") / F.col("pred_total")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("gold_total") > 0, F.col("tp") / F.col("gold_total")
    ).otherwise(F.lit(0.0))
    out = counts.select(
        "tp", "pred_total", "gold_total",
        prec.alias("precision"), rec.alias("recall"),
    )
    return out.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )


def song_accuracy(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """All-or-nothing per-document accuracy under the song rule — the
    reference's counting reproduced exactly (judge_song.py:32-107, workflow3's
    111/120 = 0.925 judge): the universe is the GOLD-side documents
    (``total_samples = len(true_data)``, :39); a doc is correct iff every gold
    (name, label) group's max-area representative is matched by some pred
    (:92); spurious predictions are IGNORED (:79 ``continue`` on unknown keys
    — no penalty, unlike sample_accuracy's exact-match rule).  Docs with an
    empty gold entity list are not representable as frame rows; the reference
    counts them correct unconditionally (:92 vacuous set equality), so
    omitting them only shifts both counters' absolute values, never a
    represented doc's verdict."""
    reps = _gold_reps(gold)
    matched = _matched_song_groups(pred, gold).select(*KEYS)
    per_doc = (
        reps.join(matched.withColumn("_hit", F.lit(1)), KEYS, "left")
        .groupBy("doc_key")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )
    correct = (F.col("n_matched") == F.col("n_groups")).cast("int")
    return per_doc.agg(
        F.sum(correct).alias("correct_samples"),
        F.count(F.lit(1)).alias("total_samples"),
        (F.sum(correct) / F.count(F.lit(1))).alias("accuracy"),
    )


def max_area_gold(gold: DataFrame) -> DataFrame:
    """Representative box per (doc, name, label): max area wins
    (judge_song.py:49-68); null boxes rank as area -1 so a null representative
    survives only in all-null groups.  Ties break on coordinates via
    row_number — fully deterministic, so the DuckDB oracle can reproduce the
    exact row (``max_by`` leaves ties engine-defined)."""
    with_area = gold.withColumn(
        "_area", F.when(F.col("bnd").isNotNull(), area(F.col("bnd"))).otherwise(F.lit(-1))
    )
    w = Window.partitionBy("doc_key", "name", "label").orderBy(
        F.col("_area").desc(), *_rank_order("bnd")
    )
    return (
        with_area.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_key", "name", "label", "bnd")
    )
