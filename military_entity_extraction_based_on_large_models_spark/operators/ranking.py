"""Relevance ranking and deterministic weighted sampling over the corpus.

``bm25_scores`` — Okapi BM25 (Robertson & Walker's probabilistic ranking,
the standard lexical retrieval baseline) as pure DataFrame aggregations:

* one explode+groupBy builds per-(doc, term) frequencies — the same shape
  as the word-count trainer; document length and average document length
  fall out of the same pass;
* the query set is a tiny literal frame (terms exploded), broadcast-joined
  against the posting rows — the corpus side never re-shuffles per query;
* per-term contributions are rounded to micro-units and summed as BIGINTs:
  a float sum over a term group is ORDER-dependent in its last ulp, which
  would break cross-engine determinism (the same device as the HLL
  harmonic sum and the quantized-gradient trainer).  idf uses ln — not
  correctly-rounded in either engine — so contributions are rounded to
  6 dp FIRST, putting >1000 ulps of slack between the rounding boundary
  and any plausible libm divergence.

``weighted_sample`` — deterministic weight-biased top-k selection: each
row gets priority u/w where u is a 52-bit uniform derived from md5 (the
HLL register device) and w its integer weight; the k smallest priorities
win.  Inclusion probability grows with weight and the whole draw is
reproducible bit-for-bit in any engine BECAUSE the key avoids
transcendentals: true Efraimidis-Spirakis proportional-to-size sampling
keys on -ln(u)/w, and libm ln's last ulp is engine-specific — this
operator deliberately trades exact PPS inclusion probabilities for exact
cross-engine determinism, and says so.  (IEEE division IS correctly
rounded, so u/w is bit-identical everywhere.)

``stratified_sample`` — deterministic k-per-stratum sampling: the same
md5-uniform priority, but INTEGER (no division at all — a uniform draw
needs no weight scaling), ranked per stratum through
``skew.topk_per_group_auto``, so a hot stratum (one language dominating a
web crawl is the norm, not the exception) automatically engages the salted
two-phase window instead of serializing on one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens

BM25_K1 = 1.2
BM25_B = 0.75
_MICRO = 1_000_000


def bm25_scores(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 → (query_id, doc_id, score,
    rank).  ``queries`` is [(query_id, query_text)] — tiny, broadcast.

    Scale shape: ONE corpus tokenize+groupBy (posting list), one broadcast
    join against the exploded query terms, one partial+final aggregation
    per (query, doc), one top-k window per query (queries are few; for a
    hot query use skew.topk_per_group).  idf = ln(1 + (N - df + ½)/(df + ½))
    — the non-negative BM25+ variant."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("_t")
    )
    # one pass: per-doc length + exploded terms
    posts = (
        toks.select("doc_id", F.size("_t").alias("dl"), F.explode("_t").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size("_t")).alias("total_len")
    )
    df_t = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qrows = []
    for qid, qtext in queries:
        import re

        for t in dict.fromkeys(re.findall(r"[^\W_]+", qtext.lower())):
            qrows.append((int(qid), t))
    qterms = spark.createDataFrame(qrows, "query_id int, term string")

    j = (
        posts.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t.join(F.broadcast(qterms), "term").select("term", "df")), "term")
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl
    )
    contrib_micro = F.round(idf * tf / denom * F.lit(_MICRO)).cast("long")
    scored = (
        j.select("query_id", "doc_id", contrib_micro.alias("_c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("_s"))
        .select(
            "query_id",
            "doc_id",
            (F.col("_s").cast("double") / F.lit(float(_MICRO))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def bm25_sql(
    relation: str,
    queries: Sequence[tuple[int, str]],
    word_toks_sql: str,
    id_col: str = "doc_id",
    k: int = 10,
) -> str:
    """Generated DuckDB twin of ``bm25_scores`` (same constants, same
    micro-unit integer sum, same tie-break)."""
    import re

    qvals = []
    for qid, qtext in queries:
        for t in dict.fromkeys(re.findall(r"[^\W_]+", qtext.lower())):
            qvals.append(f"({int(qid)}, '{t}')")
    qrel = ", ".join(qvals)
    # string→DOUBLE casts: DuckDB types plain decimal literals as DECIMAL,
    # whose division rounds differently than the Spark doubles (same trap
    # as stats.hll_ndv_sql)
    half, k1, b, one = (
        "CAST('0.5' AS DOUBLE)",
        f"CAST('{BM25_K1!r}' AS DOUBLE)",
        f"CAST('{BM25_B!r}' AS DOUBLE)",
        "CAST('1.0' AS DOUBLE)",
    )
    return f"""
        WITH toks AS (
          SELECT {id_col} AS doc_id, {word_toks_sql} AS t FROM {relation}
        ), posts AS (
          SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
        ), tfreq AS (
          SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
          FROM posts GROUP BY doc_id, dl, term
        ), corpus AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len(t)) AS BIGINT) AS total_len
          FROM toks
        ), dft AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfreq GROUP BY term
        ), q(query_id, term) AS (VALUES {qrel}),
        contrib AS (
          SELECT q.query_id, f.doc_id,
                 CAST(round(
                   ln({one} + (c.n_docs - d.df + {half}) / (d.df + {half}))
                   * CAST(f.tf AS DOUBLE)
                   / (CAST(f.tf AS DOUBLE) + {k1} * ({one} - {b}
                      + {b} * f.dl / (CAST(c.total_len AS DOUBLE) / c.n_docs)))
                   * {_MICRO}) AS BIGINT) AS c_micro
          FROM tfreq f
          JOIN q ON q.term = f.term
          JOIN dft d ON d.term = f.term
          CROSS JOIN corpus c
        ), scored AS (
          SELECT query_id, doc_id,
                 CAST(sum(c_micro) AS DOUBLE) / {float(_MICRO)} AS score
          FROM contrib GROUP BY query_id, doc_id
        ), ranked AS (
          SELECT query_id, doc_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, doc_id ASC) AS INT) AS rank
          FROM scored
        )
        SELECT query_id, doc_id, round(score, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def weighted_sample(
    df: DataFrame,
    weight: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weight-biased sample of ``k`` rows → original columns +
    ``priority``.  ``weight`` must be a positive integer column; heavier
    rows are proportionally more likely to make the cut (monotone, not
    exact PPS — see module doc for the determinism trade).  Written as
    ``orderBy(priority, id).limit(k)`` ON PURPOSE: Spark plans that as
    TakeOrderedAndProject — a map-side per-partition top-k + one k-row
    merge, never a global sort or a one-reducer window (the plan shape is
    test-asserted)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    v = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    pr = v.cast("double") / F.col(weight).cast("double")
    return (
        df.withColumn("priority", pr)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    k: int,
    id_col: str = "doc_id",
    seed: str = "strat",
    hot_rows_threshold: int | None = None,
) -> DataFrame:
    """Deterministic ``k``-per-stratum sample → original columns +
    ``priority`` (BIGINT md5-uniform — all-integer, engine-exact) +
    ``rank``.  Ranking runs through ``skew.topk_per_group_auto``: below the
    hot-stratum threshold it is one plain window; a dominant stratum flips
    it to the salted two-phase plan, and the switch cannot change results
    (total order on (priority, id))."""
    from .skew import topk_per_group_auto

    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    pr = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    kwargs = {}
    if hot_rows_threshold is not None:
        kwargs["hot_rows_threshold"] = hot_rows_threshold
    return topk_per_group_auto(
        df.withColumn("priority", pr),
        list(strata),
        [F.col("priority").asc(), F.col(id_col).asc()],
        k,
        **kwargs,
    )
