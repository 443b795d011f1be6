"""Corpus-level boilerplate removal (C4 / RefinedWeb-style).

The public web-curation pipelines drop any LINE that repeats verbatim
across enough documents (navigation chrome, cookie banners, license
footers).  This corpus has no line structure (the same reason the
repetition features operate on n-grams — see functions/text.dup_ngram_frac),
so the removable unit here is the NON-OVERLAPPING word window: document
text is split into consecutive ``window_words``-word units, a unit seen in
at least ``min_docs`` distinct documents is boilerplate, and each document
is reassembled from its surviving units in order.

Scale shape (100 TB):

* non-overlapping windows keep the exploded frame at ~1× the corpus token
  volume (overlapping shingles would be ×w);
* the distinct-doc count per unit is a two-phase hash aggregate
  (map-side partial on (unit, doc), then per-unit count);
* the boilerplate table is NOT assumed small — the removal is a shuffle
  LEFT ANTI join on the unit string, which AQE turns into a broadcast
  when the table is in fact tiny.  The join key is the exact string, not
  a hash: an anti join on a 64-bit hash would silently delete innocent
  units on collision, and at 100 TB collisions are an expectation, not a
  tail risk;
* reassembly is one per-doc aggregate: array_sort(collect_list(struct(pos,
  unit))) → array_join — no window, no second sort pass.

Everything is a pure column expression (JVM codegen, no Python), and every
step replays exactly in DuckDB (``boilerplate_sql``), so the driver's
hash gate covers the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bind_once, tokens


def doc_units(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 8,
) -> DataFrame:
    """Explode each document into (id, pos, unit): consecutive
    non-overlapping ``window_words``-word windows; the final unit keeps the
    shorter tail.  Empty documents produce zero units."""
    w = int(window_words)

    # bind_once: tokenize exactly once per row — with the token expression
    # inlined in the window lambda every unit re-ran the full split
    # (quadratic in document length; the lm.doc_bigrams bug class)
    def _units(tk):
        n = F.size(tk)
        idx = F.when(
            n > 0,
            F.sequence(F.lit(0), F.floor((n - 1) / F.lit(w)).cast("int")),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.array_join(F.slice(tk, i * w + 1, w), " ")
        )

    units = bind_once(tokens(F.col(text_col)), _units)
    return docs.select(
        id_col, F.posexplode(units).alias("pos", "unit")
    )


def boilerplate_units(
    units: DataFrame, id_col: str = "doc_id", min_docs: int = 3
) -> DataFrame:
    """Units appearing in ≥ ``min_docs`` DISTINCT documents → (unit,
    n_docs).  Distinct-doc counting, not occurrence counting: a unit that
    one document repeats a hundred times is repetition (a per-doc quality
    feature), not corpus boilerplate."""
    return (
        units.select("unit", id_col)
        .distinct()
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= int(min_docs))
    )


def remove_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """→ (id, clean_text, n_kept, n_removed) for EVERY input document —
    a fully-boilerplate document survives as an empty string with its
    removal count, so downstream length filters see it."""
    w = int(window_words)
    units = doc_units(docs, text_col, id_col, w)
    boiler = boilerplate_units(units, id_col, min_docs)
    kept = units.join(boiler.select("unit"), "unit", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    totals = docs.select(
        id_col,
        F.when(n > 0, F.floor((n - 1) / F.lit(w)).cast("int") + 1)
        .otherwise(F.lit(0))
        .alias("_n_units"),
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("_n_units") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


def boilerplate_sql(
    table: str,
    ws_regex: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 8,
    min_docs: int = 3,
) -> str:
    """DuckDB twin of ``remove_boilerplate``.  ``ws_regex`` is the
    RE2-compatible whitespace class shared with the Spark tokenizer
    (functions/text.WS_CLASS — explicit because Java's \\s ⊋ RE2's \\s).
    DuckDB list slices are 1-based inclusive and clip at the list end,
    matching F.slice's shorter-tail behavior."""
    w = int(window_words)
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(
                   string_split_regex({text_col}, '{ws_regex}+'),
                   x -> x <> ''
                 ) AS tk
          FROM {table}
        ), base AS (
          SELECT {id_col}, tk,
                 cast(floor((len(tk) - 1) / {w}.0) AS int) AS maxi
          FROM toks
        ), units AS (
          SELECT {id_col}, i AS pos,
                 array_to_string(tk[i*{w}+1 : i*{w}+{w}], ' ') AS unit
          FROM base, unnest(range(0, maxi + 1)) AS u(i)
        ), boiler AS (
          SELECT unit FROM units
          GROUP BY unit
          HAVING count(DISTINCT {id_col}) >= {int(min_docs)}
        ), kept AS (
          SELECT * FROM units
          WHERE unit NOT IN (SELECT unit FROM boiler)
        ), agg AS (
          SELECT {id_col},
                 string_agg(unit, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM kept GROUP BY {id_col}
        )
        SELECT b.{id_col},
               coalesce(a.clean_text, '') AS clean_text,
               cast(coalesce(a.n_kept, 0) AS bigint) AS n_kept,
               cast((b.maxi + 1) - coalesce(a.n_kept, 0) AS bigint)
                 AS n_removed
        FROM base b LEFT JOIN agg a USING ({id_col})
    """
