"""Similarity search over embedding columns.

* brute_force_topk — exact cosine top-k: queries (small) are broadcast
  against the corpus; per-corpus-partition scoring, then a global top-k via
  window row_number.  Correct baseline at any scale where |queries| is
  broadcastable.
* lsh_topk — random-hyperplane-bucketed approximate variant: corpus and
  queries are sketched (same deterministic hyperplanes as
  dedup.embedding_neardup_pairs); candidates come only from buckets within
  Hamming distance ≤ r of the query's sketch (multi-probe), then exact
  rescoring.  At 100 TB this is the scale path: the join is
  bucket-equi, not a cross join.

All vector math is built-in higher-order functions (functions.vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..plans.parallelism import scale_out


def _plane_term(k: int):
    """Factory closure (no default params — PySpark would reinterpret the
    lambda arity): ± sign of component j under pseudo-plane k."""
    return lambda x, j: x.cast("double") * F.when(
        F.pmod(F.xxhash64(j, F.lit(k)), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def _sketch(vec_col, n_planes: int, planes=None, proj_digits=None):
    """Sign-sketch bucket id of a vector.

    Default: pseudo-planes whose ±1 signs come from xxhash64 — zero setup,
    but not replicable outside Spark.  With ``planes`` (list of explicit
    coefficient rows — the production shape: a real Gaussian/±1 projection
    matrix), the sketch is plain column arithmetic over plan-side constants,
    exactly reproducible in ANSI SQL; ``proj_digits`` quantizes each
    projection before the sign test so fp summation order can't flip a
    near-zero sign across engines (same device as ivf_topk_centroids'
    ``score_digits``)."""
    sk = F.lit(0)
    n = len(planes) if planes is not None else n_planes
    for k in range(n):
        if planes is not None:
            lits = F.array(*[F.lit(float(x)) for x in planes[k]])
            proj = F.aggregate(
                F.zip_with(vec_col, lits, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        else:
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    _plane_term(k),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        if proj_digits is not None:
            proj = F.round(proj, proj_digits)
        sk = sk + F.when(proj > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return sk


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors per query.

    (query_id, neighbor_id, cosine, rank); ties broken by neighbor_id asc so
    results are deterministic.  ``queries`` must be small — it is broadcast,
    making the "cross" join a map-side nested loop with no corpus shuffle;
    the only shuffle is the final per-query top-k.
    """
    # norms hoisted OUT of the pair loop: V.cosine inline would re-fold
    # norm(cv) once per (row, query) pair and norm(qv) once per corpus row
    # — 3 array folds per pair.  Computing each side's norm once before the
    # join leaves one dot-fold per pair (same expressions, same fp op
    # order, so cosine values — and thus ranks — are bit-identical).
    c = scale_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("_nc", V.norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("_nq", V.norm(F.col("qv")))
    denom = F.col("_nc") * F.col("_nq")
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.when(denom > 0, V.dot(F.col("cv"), F.col("qv")) / denom).otherwise(
            F.lit(0.0)
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bits: int = 4,
    probe_hamming: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k with a deterministic ORTHANT coarse
    quantizer: cell id = sign bits of the first ``bits`` components (2^bits
    inverted lists).  Candidates come from the query's cell plus cells within
    Hamming distance ``probe_hamming``; exact cosine rescoring inside.

    Unlike the hashed-hyperplane sketch (``lsh_topk``), the quantizer is
    plain column arithmetic — the whole approximation is exactly
    reproducible in ANSI SQL, so the driver oracle checks this scale path
    end-to-end (rank-for-rank), not just its row count.  Scale shape is the
    IVF standard: the candidate join is equi on the cell id; a trained
    k-means codebook would slot in as a broadcast centroid table without
    changing the plan.
    """
    def cell(vec):
        c = F.lit(0)
        for j in range(bits):
            c = c + F.when(vec[j] > 0, F.lit(1 << j)).otherwise(F.lit(0))
        return c

    c = scale_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("bucket", cell(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("cell", cell(F.col("qv")))
    probes = [F.col("cell")]
    if probe_hamming >= 1:
        probes += [F.col("cell").bitwiseXOR(F.lit(1 << b)) for b in range(bits)]
    if probe_hamming >= 2:
        probes += [
            F.col("cell").bitwiseXOR(F.lit((1 << a) | (1 << b)))
            for a in range(bits)
            for b in range(a + 1, bits)
        ]
    if probe_hamming > 2:
        raise ValueError("ivf_topk supports probe_hamming <= 2")
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    cand = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", V.cosine(F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _centroid_dists(vec_col, centroids: list[list[float]], score_digits=None):
    """Array of (score, cid) structs, one per centroid, where score is the
    argmin-equivalent L2 surrogate −2·v·c + |c|² (|v|² is constant per row).

    ``score_digits`` optionally rounds the score before comparison: with
    engines free to reorder fp summation, quantized scores make the argmin
    (ties → lowest cid) reproducible bit-for-bit across engines — how the
    driver oracle replicates the assignment in ANSI SQL."""
    out = []
    for cid, c in enumerate(centroids):
        lits = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(vec_col, lits, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm2 = float(sum(x * x for x in c))
        d = F.lit(-2.0) * dot + F.lit(norm2)
        if score_digits is not None:
            d = F.round(d, score_digits)
        out.append(F.struct(d.alias("d"), F.lit(cid).alias("cid")))
    return F.array(*out)


def nearest_cell(vec_col, centroids: list[list[float]], score_digits=None):
    """Codebook cell id of a vector: argmin centroid distance, ties to the
    lowest cid (struct ordering compares d then cid)."""
    return F.array_min(_centroid_dists(vec_col, centroids, score_digits))["cid"]


def ivf_topk_centroids(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    score_digits=None,
) -> DataFrame:
    """IVF top-k with an explicit centroid codebook (trained k-means or
    fixed): every corpus vector is assigned to its nearest centroid (the
    inverted list), each query probes its ``nprobe`` nearest cells, and exact
    cosine rescoring runs inside the candidate set only.

    Same 100 TB shape as ``ivf_topk``: the candidate join is equi on the cell
    id, the codebook is a plan-side constant (broadcast-equivalent — the
    centroid literals ship inside the serialized plan, no join needed to
    assign), and the only shuffle is the per-query top-k.  With deterministic
    centroids the whole approximation is reproducible in ANSI SQL
    (rank-for-rank), which is how the driver oracle checks it
    (``score_digits`` quantizes the assignment scores for cross-engine
    reproducibility).
    """
    c = scale_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("bucket", nearest_cell(F.col("cv"), centroids, score_digits))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn(
        "bucket",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        _centroid_dists(F.col("qv"), centroids, score_digits)
                    ),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ),
    )
    cand = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", V.cosine(F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def sample_init(
    df: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Seeded deterministic init centroids for ``train_kmeans``: the k vectors
    whose ``xxhash64(id, seed)`` is smallest — a uniform pseudo-random sample
    that every retry and every engine reproduces exactly (no ``df.sample``,
    whose output is partition-layout-dependent; ties on the hash break by id).

    Scale shape: one top-k (TakeOrderedAndProject — per-partition heap then a
    k-row merge at the driver), collecting k×dim floats.  This is the one-call
    "train on a sample at 100 TB" path: ``train_kmeans(df, sample_init(df, k))``.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64("_id", F.lit(seed)).asc(), F.col("_id").asc())
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors, found {len(rows)}")
    return [list(map(float, r["_v"])) for r in rows]


def train_kmeans(
    df: DataFrame,
    init_centroids: list[list[float]],
    iters: int = 3,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's iterations for the IVF codebook.

    Assignment is the same plan-side ``nearest_cell`` expression the search
    uses (no join); the update step is one shuffle per iteration —
    posexplode the vectors and average per (cell, component), then collect
    the k×dim centroid table (tiny) to the driver.  Empty cells keep their
    previous centroid.  At 100 TB you train on a sample (``df.sample``)
    upstream; the returned codebook feeds ``ivf_topk_centroids`` unchanged.
    """
    centroids = [list(map(float, c)) for c in init_centroids]
    dim = len(centroids[0])
    for _ in range(iters):
        # two-step select: a Generate (posexplode) in the same projection as
        # the struct-field access strips the struct's field aliases
        assigned = df.select(
            nearest_cell(F.col(vec_col), centroids).alias("cell"),
            F.col(vec_col).alias("_v"),
        ).select("cell", F.posexplode("_v").alias("pos", "x"))
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        # dimension guards (caller error, not data): vectors LONGER than the
        # centroids emit pos beyond dim; vectors SHORTER make every zip_with
        # distance NULL (argmin then degenerates to cid 0), observable as
        # max pos < dim-1
        if rows:
            max_pos = max(r["pos"] for r in rows)
            if max_pos >= dim:
                raise ValueError(
                    f"{vec_col} vectors have >= {max_pos + 1} components "
                    f"but centroids are {dim}-dim"
                )
            if max_pos + 1 < dim:
                raise ValueError(
                    f"{vec_col} vectors are shorter ({max_pos + 1}) than "
                    f"the {dim}-dim centroids"
                )
        nxt = [list(c) for c in centroids]
        for r in rows:
            if r["cell"] is None:  # defensive: NULL assignment cell
                raise ValueError(
                    f"nearest_cell returned NULL for a {vec_col} vector"
                )
            nxt[r["cell"]][r["pos"]] = float(r["m"])
        centroids = nxt
    return centroids


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    probe_hamming: int = 1,
    planes=None,
    proj_digits=None,
) -> DataFrame:
    """Approximate top-k: sign-sketch bucketing + multi-probe (flip up to
    ``probe_hamming`` sketch bits), exact cosine rescoring inside buckets.

    Recall < 1.0 by construction; the scale win is that the candidate join is
    equi on the bucket id.  Query sketches are exploded into probe buckets
    (1 + n_planes·probe_hamming rows each) and broadcast.

    ``planes`` (optional explicit projection matrix, list of coefficient
    rows) switches the sketch to plan-side-constant arithmetic — same plan,
    but the approximation becomes exactly reproducible in ANSI SQL, which is
    how the driver oracle checks this path rank-for-rank (see ``_sketch``).
    """
    if planes is not None:
        n_planes = len(planes)
    c = scale_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("bucket", _sketch(F.col("cv"), n_planes, planes, proj_digits))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("sketch", _sketch(F.col("qv"), n_planes, planes, proj_digits))
    probes = [F.col("sketch")]
    if probe_hamming >= 1:
        probes += [
            F.col("sketch").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)
        ]
    if probe_hamming >= 2:
        probes += [
            F.col("sketch").bitwiseXOR(F.lit((1 << a) | (1 << b)))
            for a in range(n_planes)
            for b in range(a + 1, n_planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    cand = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", V.cosine(F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
