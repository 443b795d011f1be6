"""Code-corpus hygiene: license detection and secrets scanning.

The two screens every code-LLM data pipeline runs before training (The
Stack / StarCoder keep only permissive-licensed files and redact
credentials; BigCode's governance docs make both steps mandatory):

* **License detection** — lexical, header-based: an SPDX tag
  (``SPDX-License-Identifier: X``) wins outright; otherwise a priority
  CASE chain of prose markers ("Permission is hereby granted" → MIT,
  "Apache License" → Apache-2.0, …).  This is deliberately the cheap
  header heuristic, not a Minerva/askalono similarity matcher — at
  corpus scale the header pass classifies the overwhelming majority and
  runs as ONE codegen projection; files it cannot classify surface as
  ``unknown`` for a heavier downstream pass.

* **Secrets scanning** — anchored literal-prefix credential shapes (AWS
  access key ids, GitHub personal access tokens, PEM private-key
  blocks).  Counting is the audit surface; ``scrub_secrets`` is the
  redaction pass (chained ``regexp_replace`` with typed placeholders,
  the functions/text.scrub_pii convention).

Regex dialect: the shared Java-regex / RE2 subset (functions/text.py
convention — no ``\\b``, no ``\\d``, no bounded ``{m,n}``; fixed repeats
are spelled out), so the DuckDB oracle runs IDENTICAL patterns and the
driver hash gate checks the detection semantics themselves.

Scale shape: both scans are shuffle-free codegen projections over the
content column; the only shuffles are the final tiny per-(repo, …)
aggregates, map-side combined.  The license filter composes as a
broadcast semi-join of the (repo → license) dimension against the file
stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPDX_PATTERN = "SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)"

# priority-ordered prose markers; first match wins.  Patterns stay in the
# shared dialect: literal text + explicit classes only.
LICENSE_PROSE: list[tuple[str, str]] = [
    ("MIT", "Permission is hereby granted, free of charge"),
    ("MIT", "MIT License"),
    ("Apache-2.0", "Apache License"),
    ("GPL-3.0-or-later", "GNU General Public License"),
    ("MPL-2.0", "Mozilla Public License"),
    ("BSD-3-Clause", "Redistribution and use in source and binary forms"),
    ("BSD-3-Clause", "BSD 3-Clause License"),
]

SECRET_PATTERNS: dict[str, str] = {
    "aws_access_key": "AKIA" + "[0-9A-Z]" * 16,
    "github_token": "ghp_" + "[A-Za-z0-9]" * 36,
    "private_key_block": "-----BEGIN [A-Z ]*PRIVATE KEY-----",
}


def detect_license(content: Column) -> Column:
    """License id for one file: SPDX tag verbatim, else first prose
    marker, else 'unknown'.  Pure codegen (one regexp_extract + rlike
    CASE chain)."""
    spdx = F.regexp_extract(content, SPDX_PATTERN, 1)
    out = F.when(spdx != "", spdx)
    for lic, pat in LICENSE_PROSE:
        out = out.when(content.rlike(pat), F.lit(lic))
    return out.otherwise(F.lit("unknown"))


def repo_licenses(
    docs: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
) -> DataFrame:
    """(repo, license, n_files) — the per-repo license census."""
    return (
        docs.select(
            F.col(repo_col).alias("repo"),
            detect_license(F.col(content_col)).alias("license"),
        )
        .groupBy("repo", "license")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )


def dominant_repo_license(
    docs: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
) -> DataFrame:
    """(repo, license) — the most common per-file license per repo,
    deterministic ties (max n_files, then lexicographically-min license:
    one min(struct) aggregate, the exact_dedup shape — no window)."""
    census = repo_licenses(docs, repo_col, content_col)
    pick = F.min(
        F.struct((-F.col("n_files")).alias("_neg"), F.col("license"))
    ).alias("_p")
    return (
        census.groupBy("repo")
        .agg(pick)
        .select("repo", F.col("_p.license").alias("license"))
    )


def filter_by_license(
    docs: DataFrame,
    allowed: list[str],
    repo_col: str = "repo",
    content_col: str = "content",
) -> DataFrame:
    """Keep files whose repo's dominant license is in ``allowed`` — the
    Stack-style permissive filter, as a broadcast semi-join of the tiny
    (repo, license) dimension against the file stream."""
    dim = dominant_repo_license(docs, repo_col, content_col).where(
        F.col("license").isin(allowed)
    )
    return docs.join(
        F.broadcast(dim.select(F.col("repo").alias(repo_col))),
        repo_col,
        "left_semi",
    )


def secret_hits(content: Column) -> Column:
    """array<struct<kind,n>> of per-pattern match counts (n >= 0) — built
    once per row, shuffle-free."""
    return F.array(
        *[
            F.struct(
                F.lit(kind).alias("kind"),
                F.size(
                    F.regexp_extract_all(content, F.lit(pat), F.lit(0))
                ).cast("long").alias("n"),
            )
            for kind, pat in SECRET_PATTERNS.items()
        ]
    )


def secret_counts(
    docs: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
) -> DataFrame:
    """(repo, kind, n_files, n_hits) — per-repo audit of leaked-credential
    shapes; only (repo, kind) groups with at least one hit are emitted."""
    hits = docs.select(
        F.col(repo_col).alias("repo"),
        F.explode(secret_hits(F.col(content_col))).alias("h"),
    ).where(F.col("h.n") > 0)
    return (
        hits.groupBy("repo", F.col("h.kind").alias("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("h.n").alias("n_hits"),
        )
    )


def scrub_secrets(content: Column) -> Column:
    """Redact every secret shape with a typed placeholder — chained
    codegen regexp_replace, the scrub_pii convention."""
    out = content
    for kind, pat in SECRET_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<SECRET:{kind}>")
    return out


# ---------------------------------------------------------------------------
# File-level quality screen (The Stack / StarCoder filter family): the
# line-shape and character-class statistics every code-LLM curation run
# computes per file before training — long-line and low-alphanumeric files
# are overwhelmingly minified bundles, data blobs, or generated code.
# Thresholds follow the published The Stack v1 defaults (max line 1000,
# avg line 100, alnum fraction >= 0.25); all ratios are integer
# micro-units (BIGINT) so the stats replay bit-exactly cross-engine —
# the doc_bm25 determinism convention.
# ---------------------------------------------------------------------------


def file_quality_stats(
    docs: DataFrame,
    content_col: str = "content",
    max_line_chars: int = 1000,
    max_avg_line_chars: int = 100,
    min_alnum_frac_micro: int = 250_000,
) -> DataFrame:
    """Append per-file quality stats + the keep/drop decision.

    Columns added: ``n_lines``, ``max_line_len``, ``avg_line_len_micro``
    (chars·1e6 per line, integer DIV), ``alnum_frac_micro``, ``keep``.

    Shuffle-free codegen projection: one split + HOF max, one
    regexp_replace-difference count — no UDF, no aggregate.  Line count
    uses Java split-limit −1 semantics (trailing empty lines kept),
    matching DuckDB's string_split.  Ratios are BIGINT micro-units via
    integer DIV (both operands nonnegative), never a float divide.
    """
    c = F.col(content_col)
    lines = F.split(c, "\n", -1)
    n_lines = F.size(lines).cast("bigint")
    # total chars minus the newline separators — exact, no second pass
    sum_len = (F.length(c) - (F.size(lines) - F.lit(1))).cast("bigint")
    max_line = F.array_max(
        F.transform(lines, lambda x: F.length(x))
    ).cast("bigint")
    alnum = (
        F.length(c) - F.length(F.regexp_replace(c, "[A-Za-z0-9]", ""))
    ).cast("bigint")
    staged = docs.select(
        "*",
        n_lines.alias("n_lines"),
        max_line.alias("max_line_len"),
        sum_len.alias("_sum_len"),
        alnum.alias("_alnum"),
        F.length(c).cast("bigint").alias("_total"),
    )
    avg_micro = F.expr("(_sum_len * 1000000) DIV n_lines").cast("bigint")
    frac_micro = (
        F.when(F.col("_total") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("(_alnum * 1000000) DIV _total").cast("bigint"))
    )
    keep = (
        (F.col("max_line_len") <= F.lit(int(max_line_chars)))
        & (F.col("avg_line_len_micro")
           <= F.lit(int(max_avg_line_chars) * 1_000_000))
        & (F.col("alnum_frac_micro") >= F.lit(int(min_alnum_frac_micro)))
    )
    return (
        staged.withColumn("avg_line_len_micro", avg_micro)
        .withColumn("alnum_frac_micro", frac_micro)
        .withColumn("keep", keep)
        .drop("_sum_len", "_alnum", "_total")
    )
