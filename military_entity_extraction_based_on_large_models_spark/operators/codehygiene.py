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
