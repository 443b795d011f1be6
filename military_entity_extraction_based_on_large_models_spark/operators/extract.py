"""Mention detection: Aho-Corasick gazetteer span matching as an Arrow stage.

Reference semantics reproduced (see SURVEY.md §2.2 P1/P2, §2.6 I5):

* extract-only-literal-substrings — the reference's post-filter drops any
  entity whose name is not a substring of the text
  (EntityExtractor.py:124-130); a span matcher satisfies this by construction.
* identity key (name, label) — dedup first-wins set semantics
  (reflect_workflow1.py:44-53) becomes ``dropDuplicates``/``array_distinct``.
* row-level error containment — any per-document failure yields an empty
  result plus an error string, never a task failure
  (foundation_workflow.py:116-118).

Scale design: the gazetteer ships to executors once (Spark broadcast); the
Aho-Corasick automaton is built lazily ONCE PER EXECUTOR PROCESS (module-level
cache keyed by gazetteer fingerprint), not per batch and never per row.  The
stage is ``mapInPandas`` because fan-out is variable (0..n mentions per doc);
matching is O(len(content)) per document independent of gazetteer size, so the
stage scales linearly in input bytes and is embarrassingly parallel — no
shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from collections import deque
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


class AhoCorasick:
    """Multi-pattern string matcher (classic Aho-Corasick, public algorithm).

    ``find()`` yields ``(end, pattern_index)`` for every occurrence of every
    pattern — including overlapping and nested occurrences, matching the
    reference's pure-containment semantics (``name in text``).
    """

    def __init__(self, patterns: Sequence[str]):
        # goto: list of dict char -> state
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, pat in enumerate(patterns):
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[state][ch] = nxt
                state = nxt
            self.out[state].append(idx)
        # BFS failure links
        self.fail = [0] * len(self.goto)
        queue: deque[int] = deque()
        for st in self.goto[0].values():
            queue.append(st)
        while queue:
            state = queue.popleft()
            for ch, nxt in self.goto[state].items():
                queue.append(nxt)
                f = self.fail[state]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def find(self, text: str) -> Iterator[tuple[int, int]]:
        state = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for pat_idx in out[state]:
                    yield i + 1, pat_idx


class _Automaton:
    """Executor-side automaton bundle: matcher + pattern metadata."""

    def __init__(self, entries: Sequence[tuple[str, str, str]]):
        # entries: (alias, canonical, label); one pattern per distinct alias,
        # with the (canonical, label) fan-out kept alongside.
        alias_to_meta: dict[str, list[tuple[str, str]]] = {}
        for alias, canonical, label in entries:
            alias_to_meta.setdefault(alias, []).append((canonical, label))
        self.patterns = list(alias_to_meta.keys())
        self.meta = [alias_to_meta[a] for a in self.patterns]
        self.lens = [len(a) for a in self.patterns]
        self.ac = AhoCorasick(self.patterns)

    def match(self, text: str) -> Iterator[tuple[int, int, str, str, str]]:
        """Yield (begin, end, alias, canonical, label) for every occurrence."""
        for end, pat_idx in self.ac.find(text):
            begin = end - self.lens[pat_idx]
            alias = self.patterns[pat_idx]
            for canonical, label in self.meta[pat_idx]:
                yield begin, end, alias, canonical, label


# Per-executor-process automaton cache (module global survives across Arrow
# batches and tasks within one python worker — the setup cost is paid once).
_AUTOMATON_CACHE: dict[str, _Automaton] = {}


def _gazetteer_fingerprint(entries: Sequence[tuple[str, str, str]]) -> str:
    h = hashlib.sha256()
    for row in sorted(entries):
        h.update("\x1f".join(row).encode("utf-8"))
    return h.hexdigest()


def _get_automaton(key: str, entries: Sequence[tuple[str, str, str]]) -> _Automaton:
    auto = _AUTOMATON_CACHE.get(key)
    if auto is None:
        auto = _Automaton(entries)
        _AUTOMATON_CACHE[key] = auto
    return auto


MENTION_SCHEMA = StructType(
    [
        StructField("doc_sha", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("name", StringType()),
        StructField("label", StringType()),
        StructField("canonical", StringType()),
        StructField("begin", IntegerType()),
        StructField("end", IntegerType()),
        StructField("context", StringType()),
        StructField("error", StringType()),
    ]
)

CONTEXT_WINDOW = 40  # chars each side; ≡ P6 deterministic description snippet


def extract_mentions(
    docs: DataFrame,
    gazetteer_entries: Sequence[tuple[str, str, str]],
    context_window: int = CONTEXT_WINDOW,
) -> DataFrame:
    """documents → mention rows (doc_sha, repo, path, commit, name, label,
    canonical, begin, end, context, error).

    One output row per (occurrence × candidate canonical); downstream stages
    dedup by the reference identity key (doc, name, label) and resolve
    ambiguous canonicals (operators.linking).
    """
    entries = [tuple(e) for e in gazetteer_entries]
    key = _gazetteer_fingerprint(entries)
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(entries)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        auto = _get_automaton(key, bc.value)
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MENTION_SCHEMA.fields}
            for doc_sha, repo, path, commit, content in zip(
                pdf["doc_sha"], pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                try:
                    text = content or ""
                    for begin, end, alias, canonical, label in auto.match(text):
                        out["doc_sha"].append(doc_sha)
                        out["repo"].append(repo)
                        out["path"].append(path)
                        out["commit"].append(commit)
                        out["name"].append(alias)
                        out["label"].append(label)
                        out["canonical"].append(canonical)
                        out["begin"].append(begin)
                        out["end"].append(end)
                        lo = max(0, begin - context_window)
                        out["context"].append(text[lo : end + context_window])
                        out["error"].append(None)
                except Exception as exc:  # I5: row-level containment, never task failure
                    out["doc_sha"].append(doc_sha)
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["commit"].append(commit)
                    out["name"].append(None)
                    out["label"].append(None)
                    out["canonical"].append(None)
                    out["begin"].append(None)
                    out["end"].append(None)
                    out["context"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    from ..plans.parallelism import scale_out

    needed = scale_out(docs.select("doc_sha", "repo", "path", "commit", "content"))
    return needed.mapInPandas(run, schema=MENTION_SCHEMA)


def dedup_mentions(mentions: DataFrame) -> DataFrame:
    """Reference D1: set semantics on (doc, name, label)
    (remove_duplicate_entities, reflect_workflow1.py:44-53).  Keeps the
    earliest span per key — deterministic analogue of first-wins order —
    via min(begin); map-side partial aggregation keeps the shuffle small.
    """
    return (
        mentions.where(F.col("error").isNull())
        .groupBy("doc_sha", "repo", "path", "commit", "name", "label")
        .agg(
            F.min("begin").alias("begin"),
            F.min_by("end", "begin").alias("end"),
            F.min_by("canonical", "begin").alias("canonical"),
            F.min_by("context", "begin").alias("context"),
        )
    )
