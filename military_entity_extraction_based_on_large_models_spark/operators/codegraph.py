"""Import-graph extraction over a source-code corpus → repo dependency KG.

The input_hint corpus is source code — (repo, path, commit, lang, content)
— and the most code-native KG a construction pipeline can emit from it is
the *dependency graph*: which repo imports which.  This module extracts
import/include/require statements per language with anchored regexes,
normalizes the imported module names, resolves modules to their owning
repo through a join against a module-ownership table, and materializes
(src_repo, depends_on, dst_repo) edges with link counts.  The edge list
composes directly with the existing graph family (operators.pagerank for
"most-depended-on repo", canonicalize for component grouping,
graph_degrees for hub diagnostics).

Scale shape (100 TB corpus):

* extraction is pure whole-stage-codegen column work —
  ``regexp_extract_all`` + explode, zero shuffles, no Python;
* the module→owner resolution is the ONLY shuffle, and it is an equi
  join: broadcast when the ownership table is bounded (the common case —
  modules ≪ files), AQE shuffle join otherwise (``broadcast_owners=False``);
* the per-(src,dst) aggregation is partially aggregated map-side; a
  mega-repo that imports everything fans into distinct dst groups, so
  there is no single hot reducer key by construction.

Regex dialect: patterns are restricted to the shared Java-regex / RE2
subset (no ``\\b``, no ``\\d``, no bounded ``{m,n}`` — the cross-engine
convention from functions/text.py), so a DuckDB oracle can run the
IDENTICAL patterns and the driver hash gate checks the extraction
semantics themselves, not just the plumbing.

Known, documented syntactic limits (this is lexical extraction, not
parsing): ``import a, b`` captures only ``a``; relative ``from . import
x`` is skipped (module must start with a letter/underscore); a
``require('x')`` inside a string literal still matches (the py/c/js
line-comment negatives ARE handled by the line anchors).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-language import patterns; capture group 1 is the raw module text.
# Anchored patterns use (?m) so ^ matches at every line start — a line
# commented with '#' or '//' cannot match an anchored pattern.
LANG_IMPORT_PATTERNS: dict[str, list[str]] = {
    "py": [
        r"(?m)^[ \t]*import[ \t]+([A-Za-z_][A-Za-z0-9_.]*)",
        r"(?m)^[ \t]*from[ \t]+([A-Za-z_][A-Za-z0-9_.]*)[ \t]+import",
    ],
    "c": [
        r'(?m)^[ \t]*#[ \t]*include[ \t]*[<"]([A-Za-z0-9_./]+)[>"]',
    ],
    "js": [
        r"require\([ \t]*'([^']+)'[ \t]*\)",
        r'require\([ \t]*"([^"]+)"[ \t]*\)',
        r"(?m)^[ \t]*import[ \t][^;\n]*[ \t]from[ \t]+'([^']+)'",
        r'(?m)^[ \t]*import[ \t][^;\n]*[ \t]from[ \t]+"([^"]+)"',
        r"(?m)^[ \t]*import[ \t]+'([^']+)'",
    ],
}

# Normalization applied to every extracted module: drop a C header
# extension and a leading ./ relative prefix.  Shared-dialect regexes.
_STRIP_EXT = r"\.(h|hpp)$"
_STRIP_REL = r"^\./"


def _normalize_module(col):
    return F.regexp_replace(F.regexp_replace(col, _STRIP_REL, ""), _STRIP_EXT, "")


def extract_import_edges(
    docs: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang",
    repo_col: str = "repo",
    path_col: str = "path",
    patterns: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(repo, path, lang, module) — one row per import OCCURRENCE.

    Files whose language has no patterns, and files with no imports,
    produce no rows.  Occurrences are kept (a file requiring the same
    module twice yields two rows); callers that want file-level edges
    apply ``.distinct()``.  The plan is shuffle-free: a codegen projection
    (per-lang CASE over ``regexp_extract_all``) plus one explode.
    """
    pats = LANG_IMPORT_PATTERNS if patterns is None else patterns
    matches = None
    for lang, plist in pats.items():
        arr = F.concat(
            *[
                F.regexp_extract_all(F.col(content_col), F.lit(p), 1)
                for p in plist
            ]
        )
        branch = (F.col(lang_col) == lang, arr)
        matches = (
            F.when(*branch) if matches is None else matches.when(*branch)
        )
    matches = matches.otherwise(F.array().cast("array<string>"))
    return (
        docs.select(
            F.col(repo_col).alias("repo"),
            F.col(path_col).alias("path"),
            F.col(lang_col).alias("lang"),
            F.explode(matches).alias("_raw_module"),
        )
        .withColumn("module", _normalize_module(F.col("_raw_module")))
        .drop("_raw_module")
    )


# Comment syntax per language for normalize_code.  Block comments are
# stripped with a non-greedy dotall pattern (identical semantics in Java
# regex and RE2); line comments with an end-of-line run.  Whitespace is
# collapsed with an EXPLICIT class — Java \s includes \x0B, RE2's does
# not, so \s is banned by the shared-dialect convention.
_BLOCK_COMMENT = r"(?s)/\*.*?\*/"
_LINE_COMMENT: dict[str, str] = {
    "py": r"(?m)#[^\n]*",
    "c": r"(?m)//[^\n]*",
    "js": r"(?m)//[^\n]*",
}
_WS_RUN = r"[ \t\r\n]+"


def normalize_code(content, lang):
    """Canonical form of a source file for exact-dedup grouping: strip
    comments (per-language line syntax; /* */ blocks for c/js), collapse
    every whitespace run to one space, trim.  The Stack/StarCoder-style
    near-clone key — two files differing only in comments or formatting
    normalize identically.  Pure codegen regexp_replace chain; patterns
    stay in the shared Java-regex/RE2 subset so a DuckDB oracle replays
    the normalization byte-for-byte (with the 'g' flag — DuckDB replaces
    first-match by default, Spark replaces all).

    Documented lexical limit: a comment marker inside a string literal is
    treated as a comment (this is canonicalization for dedup grouping,
    not parsing — false merges need the REST of the file identical too).
    """
    lang = F.col(lang) if isinstance(lang, str) else lang
    stripped = None
    for lg, pat in _LINE_COMMENT.items():
        no_line = F.regexp_replace(content, pat, "")
        if lg in ("c", "js"):
            no_line = F.regexp_replace(no_line, _BLOCK_COMMENT, "")
        branch = (lang == lg, no_line)
        stripped = F.when(*branch) if stripped is None else stripped.when(*branch)
    stripped = stripped.otherwise(content)
    return F.trim(F.regexp_replace(stripped, _WS_RUN, " "))


def dedup_normalized_code(
    docs: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang",
    repo_col: str = "repo",
    path_col: str = "path",
) -> DataFrame:
    """Exact dedup on the :func:`normalize_code` key → one row per clone
    class: (lang, norm_sha, rep_repo, rep_path, n_files, n_repos).

    Representative = min (repo, path) pair — deterministic, engine-
    independent lexicographic order.  Scale shape: one partial+final hash
    aggregate on (lang, sha) — the same degenerate-class-proof shape as
    operators/dedup.exact_dedup (a million identical vendored files cost
    one row per map task); the raw normalized string never shuffles, only
    its sha plus the min struct.
    """
    lang = F.col(lang_col)
    keyed = docs.select(
        lang.alias("lang"),
        F.sha2(normalize_code(F.col(content_col), lang), 256).alias("norm_sha"),
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
    )
    rep = F.min(F.struct("repo", "path")).alias("rep")
    return (
        keyed.groupBy("lang", "norm_sha")
        .agg(
            rep,
            F.count(F.lit(1)).alias("n_files"),
            F.countDistinct("repo").alias("n_repos"),
        )
        .select(
            "lang",
            "norm_sha",
            F.col("rep.repo").alias("rep_repo"),
            F.col("rep.path").alias("rep_path"),
            "n_files",
            "n_repos",
        )
    )


def owners_from_paths(
    docs: DataFrame,
    repo_col: str = "repo",
    path_col: str = "path",
    lang_col: str = "lang",
    strip_prefixes: tuple[str, ...] = ("src/", "lib/", "include/"),
) -> DataFrame:
    """Derive the module-ownership table from the corpus itself: which
    repo DEFINES each importable module name, from file paths alone — so
    the dependency-graph family needs no external input (corpus →
    owners_from_paths → extract_import_edges → repo_dependency_edges).

    Path → module per language, mirroring how the import extractors
    normalize (so derived names join against extracted names):

    * py: ``a/b/c.py`` → ``a.b.c``; ``a/b/__init__.py`` → ``a.b``
    * c:  ``foo/api.h`` / ``.hpp`` → ``foo/api`` (the include path, the
      same form extract_import_edges leaves after extension strip)
    * js: ``a/b/mod.js`` → ``a/b/mod`` (require/import path form)

    One conventional source root prefix (``strip_prefixes``, first match
    wins, applied once) is dropped first: ``src/pkg/m.py`` defines
    ``pkg.m``.  Ambiguity is the caller's domain: if two repos define the
    same module, BOTH rows survive and a downstream join fans out —
    deduplicate with a policy (e.g. min repo) if the corpus has vendored
    copies.  Output: (module, repo), distinct.  Pure codegen projection +
    one distinct; patterns in the shared Java-regex/RE2 subset.
    """
    lang = F.col(lang_col)
    p = F.col(path_col)
    p = F.regexp_replace(p, r"^\./", "")
    if strip_prefixes:
        # one alternation applied ONCE, so nested roots strip only the
        # first matching prefix: src/lib/x.py → lib.x, never x
        alt = "^(?:" + "|".join(re.escape(pre) for pre in strip_prefixes) + ")"
        p = F.regexp_replace(p, alt, "")
    ext = F.regexp_replace(p, r"\.(py|c|h|hpp|js)$", "")
    module = (
        F.when(
            lang == "py",
            F.regexp_replace(
                F.regexp_replace(ext, r"/__init__$", ""), "/", "."
            ),
        )
        .when(lang.isin("c", "js"), ext)
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        docs.select(
            module.alias("module"), F.col(repo_col).alias("repo")
        )
        .where(F.col("module").isNotNull())
        .distinct()
    )


def repo_dependency_edges(
    imports: DataFrame,
    owners: DataFrame,
    broadcast_owners: bool = True,
) -> DataFrame:
    """Resolve imported modules to their owning repo and aggregate the
    repo→repo dependency edge list.

    ``imports``: output of :func:`extract_import_edges` (repo, path,
    module).  ``owners``: (module, repo) ownership table — derive it from
    the corpus itself with :func:`owners_from_paths`, or supply a curated
    registry (PyPI/npm name → repo); broadcast by default since
    it is typically orders of magnitude smaller than the import
    occurrence stream, set ``broadcast_owners=False`` to let AQE plan a
    shuffle join when it is not.

    Unresolved modules (stdlib, third-party, not in ``owners``) drop via
    the inner join; intra-repo imports drop via the self-edge filter.
    Output: (src_repo, dst_repo, n_links, n_modules) where n_links counts
    import occurrences and n_modules counts distinct imported modules.
    """
    own = owners.select(
        F.col("module").alias("_own_module"), F.col("repo").alias("dst_repo")
    )
    if broadcast_owners:
        own = F.broadcast(own)
    resolved = imports.join(
        own, imports["module"] == own["_own_module"], "inner"
    ).where(F.col("repo") != F.col("dst_repo"))
    return (
        resolved.groupBy(F.col("repo").alias("src_repo"), "dst_repo")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("module").alias("n_modules"),
        )
    )


# ---------------------------------------------------------------------------
# Function-definition + call-site extraction → cross-repo call edges.
# The second relation family of the code KG beside imports: "repo A calls
# function f defined in repo B".  Same lexical-extraction contract as the
# import patterns (anchored shared-dialect regexes, commented lines
# excluded by the line anchors, NOT a parser), same scale shape (pure
# codegen projection + explode; the def table is the bounded dimension
# side of one broadcast join).
# ---------------------------------------------------------------------------

# capture group 1 = the defined name.  Anchors exclude commented lines.
LANG_DEF_PATTERNS: dict[str, list[str]] = {
    "py": [
        r"(?m)^[ \t]*def[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\(",
        r"(?m)^[ \t]*class[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
    ],
    "c": [
        # 'type name(' at column 0 — lexical: a 'return f(x);' at column 0
        # would also match; the call-edge join's cross-repo filter absorbs
        # such artifacts (see cross_repo_call_edges)
        r"(?m)^[A-Za-z_][A-Za-z0-9_]*[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\(",
    ],
    "js": [
        r"(?m)^[ \t]*function[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)",
        r"(?m)^[ \t]*const[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)[ \t]*=[ \t]*\(",
    ],
}

# every identifier immediately followed by '(' — the call-site superset
# (definitions themselves match too; resolution + the cross-repo filter
# drop them, since a def resolves to its OWN repo)
CALL_PATTERN = r"([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("


def extract_function_defs(
    docs: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang",
    repo_col: str = "repo",
    path_col: str = "path",
    patterns: dict[str, list[str]] | None = None,
) -> DataFrame:
    """(repo, path, lang, func) — one row per definition OCCURRENCE.

    Shuffle-free: per-lang CASE over ``regexp_extract_all`` + one
    explode, exactly the import-extraction plan.
    """
    pats = LANG_DEF_PATTERNS if patterns is None else patterns
    matches = None
    for lang, plist in pats.items():
        arr = F.concat(
            *[
                F.regexp_extract_all(F.col(content_col), F.lit(p), 1)
                for p in plist
            ]
        )
        branch = (F.col(lang_col) == lang, arr)
        matches = F.when(*branch) if matches is None else matches.when(*branch)
    matches = matches.otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
        F.col(lang_col).alias("lang"),
        F.explode(matches).alias("func"),
    )


def extract_call_sites(
    docs: DataFrame,
    content_col: str = "content",
    repo_col: str = "repo",
    path_col: str = "path",
) -> DataFrame:
    """(repo, path, func) — one row per ``identifier(`` occurrence.

    Language-independent lexical superset; join against a definition
    table to resolve (``cross_repo_call_edges``).
    """
    return docs.select(
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
        F.explode(
            F.regexp_extract_all(F.col(content_col), F.lit(CALL_PATTERN), 1)
        ).alias("func"),
    )


def cross_repo_call_edges(
    calls: DataFrame,
    defs: DataFrame,
    broadcast_defs: bool = True,
) -> DataFrame:
    """(src_repo, dst_repo, func, n_calls) — call-site occurrences resolved
    against the distinct (func, repo) definition table, keeping only
    CROSS-repo edges.

    The cross-repo filter is also what absorbs the lexical artifacts of
    the extraction layer: a definition line matches CALL_PATTERN but
    resolves to its own repo and drops here.  A function defined in
    several repos resolves to every defining repo (candidate semantics —
    one edge per plausible owner), same contract as module ownership.
    The def dimension is distinct-collapsed and broadcast by default;
    pass ``broadcast_defs=False`` when the definition universe is not
    bounded (AQE plans the shuffle join).
    """
    dim = defs.select(
        F.col("func").alias("_def_func"), F.col("repo").alias("dst_repo")
    ).distinct()
    if broadcast_defs:
        dim = F.broadcast(dim)
    resolved = calls.join(
        dim, calls["func"] == dim["_def_func"], "inner"
    ).where(F.col("repo") != F.col("dst_repo"))
    return (
        resolved.groupBy(F.col("repo").alias("src_repo"), "dst_repo", "func")
        .agg(F.count(F.lit(1)).alias("n_calls"))
    )


# ---------------------------------------------------------------------------
# Class-inheritance edges — the third relation family of the code KG
# (imports = module dependency, calls = function dependency, inherits =
# type dependency).  Same lexical contract: one anchored shared-dialect
# regex per language with TWO capture groups (child, parent), commented
# lines excluded by the anchors; multi-inheritance `class X(A, B)`
# captures only A (the `import a, b` lexical-limit ruling).
# ---------------------------------------------------------------------------

LANG_INHERIT_PATTERNS: dict[str, str] = {
    "py": r"(?m)^[ \t]*class[ \t]+([A-Za-z_][A-Za-z0-9_]*)"
          r"[ \t]*\(([A-Za-z_][A-Za-z0-9_.]*)",
    "js": r"(?m)^[ \t]*class[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)"
          r"[ \t]+extends[ \t]+([A-Za-z_$][A-Za-z0-9_$.]*)",
}

# resolve parents against CLASS definitions only (feed to
# extract_function_defs(patterns=...) — the def extractor is pattern-generic)
LANG_CLASS_DEF_PATTERNS: dict[str, list[str]] = {
    "py": [r"(?m)^[ \t]*class[ \t]+([A-Za-z_][A-Za-z0-9_]*)"],
    "js": [r"(?m)^[ \t]*class[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)"],
}


def extract_class_inherits(
    docs: DataFrame,
    content_col: str = "content",
    lang_col: str = "lang",
    repo_col: str = "repo",
    path_col: str = "path",
) -> DataFrame:
    """(repo, path, lang, child, parent) — one row per inheritance site.

    Shuffle-free: both capture groups extracted from the SAME pattern, so
    the arrays align positionally; zip_with pairs them, one explode.
    Languages without an inheritance pattern (c) contribute nothing.
    """
    pairs = None
    for lang, pat in LANG_INHERIT_PATTERNS.items():
        zipped = F.zip_with(
            F.regexp_extract_all(F.col(content_col), F.lit(pat), 1),
            F.regexp_extract_all(F.col(content_col), F.lit(pat), 2),
            lambda c, p: F.struct(c.alias("child"), p.alias("parent")),
        )
        branch = (F.col(lang_col) == lang, zipped)
        pairs = F.when(*branch) if pairs is None else pairs.when(*branch)
    pairs = pairs.otherwise(
        F.array().cast("array<struct<child:string,parent:string>>")
    )
    return docs.select(
        F.col(repo_col).alias("repo"),
        F.col(path_col).alias("path"),
        F.col(lang_col).alias("lang"),
        F.explode(pairs).alias("_e"),
    ).select("repo", "path", "lang", "_e.child", "_e.parent")


def cross_repo_inherit_edges(
    inherits: DataFrame,
    class_defs: DataFrame,
    broadcast_defs: bool = True,
) -> DataFrame:
    """(src_repo, dst_repo, child, parent, n_inherits) — inheritance sites
    whose parent class is defined in a DIFFERENT repo, resolved against
    the broadcast distinct (func, repo) class-definition table.

    Same candidate semantics as cross_repo_call_edges: a class defined in
    several repos yields one edge per plausible owner; own-repo
    resolutions drop.
    """
    dim = class_defs.select(
        F.col("func").alias("_def_cls"), F.col("repo").alias("dst_repo")
    ).distinct()
    if broadcast_defs:
        dim = F.broadcast(dim)
    resolved = inherits.join(
        dim, inherits["parent"] == dim["_def_cls"], "inner"
    ).where(F.col("repo") != F.col("dst_repo"))
    return (
        resolved.groupBy(
            F.col("repo").alias("src_repo"), "dst_repo", "child", "parent"
        )
        .agg(F.count(F.lit(1)).alias("n_inherits"))
    )
