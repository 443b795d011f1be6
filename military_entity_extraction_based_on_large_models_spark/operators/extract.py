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
matcher is built lazily ONCE PER EXECUTOR PROCESS (module-level cache keyed
by gazetteer fingerprint), not per batch and never per row.  The stage is
``mapInArrow`` (round-2 rewrite, was mapInPandas): each Arrow batch is
matched as ONE concatenated string (C-level str.find / one Aho-Corasick
pass), per-match doc mapping is numpy, mention columns are assembled with
vocabulary ``take`` — no per-mention Python tuples, and the provenance
columns pass through zero-copy.  Matching is O(len(content)) per batch
independent of gazetteer size, embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import hashlib
from collections import deque
from collections.abc import Iterator, Sequence

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# a control char that never appears in gazetteer aliases: batch texts are
# joined on it, so no alias match can span two documents
_BATCH_SEP = "\x1e"


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


# Below this many distinct aliases, per-alias C-implemented str.find scans
# beat the pure-Python Aho-Corasick char loop by ~10×: find() runs at memchr
# speed and the interpreter only touches actual matches.  Past the threshold
# the O(G·n) C work loses to the O(n) automaton.
FIND_SCAN_MAX_PATTERNS = 4096


def build_alias_meta(
    entries: Sequence[tuple[str, str, str]],
) -> dict[str, list[tuple[str, str]]]:
    """alias -> deduped [(canonical, label), ...] — THE canonical flattening
    order.  Shared by the executor automaton and the driver-side vocabulary
    (the dictionary-encoded path joins executor-emitted meta-row ids against
    a vocab built here, so both sides must enumerate identically)."""
    alias_to_meta: dict[str, list[tuple[str, str]]] = {}
    for alias, canonical, label in entries:
        if _BATCH_SEP in alias:
            raise ValueError("gazetteer aliases may not contain \\x1e")
        if not alias:
            # str.find("") matches at EVERY position: one empty dictionary
            # row would turn extraction into a quadratic job emitting
            # out-of-range spans — fail fast instead
            raise ValueError("gazetteer aliases must be non-empty")
        metas = alias_to_meta.setdefault(alias, [])
        if (canonical, label) not in metas:  # exact-duplicate entries collapse
            metas.append((canonical, label))
    return alias_to_meta


def build_vocab(
    entries: Sequence[tuple[str, str, str]],
) -> list[tuple[str, str, str]]:
    """Meta-row id -> (canonical, label, name), in automaton order."""
    out = []
    for alias, metas in build_alias_meta(entries).items():
        for canonical, label in metas:
            out.append((canonical, label, alias))
    return out


class _Automaton:
    """Executor-side matcher bundle: patterns + (canonical, label) metadata.

    Strategy is picked once at construction: str.find scanning for small
    dictionaries, Aho-Corasick for large ones.  Both enumerate EVERY
    occurrence of every alias (overlaps and nesting included), matching the
    reference's pure-containment semantics (``name in text``)."""

    def __init__(self, entries: Sequence[tuple[str, str, str]]):
        # entries: (alias, canonical, label); one pattern per distinct alias,
        # with the (canonical, label) fan-out kept alongside.
        alias_to_meta = build_alias_meta(entries)
        self.patterns = list(alias_to_meta.keys())
        self.meta = [alias_to_meta[a] for a in self.patterns]
        self.lens = [len(a) for a in self.patterns]
        self.use_find = len(self.patterns) <= FIND_SCAN_MAX_PATTERNS
        self.ac = None if self.use_find else AhoCorasick(self.patterns)
        # flattened meta vocabularies for the columnar batch matcher: one
        # "meta row" per (alias, canonical, label) triple; per-pattern lists
        # of meta-row ids drive the ambiguous-alias fan-out
        self.meta_ids: list[list[int]] = []
        vocab_name: list[str] = []
        vocab_label: list[str] = []
        vocab_canonical: list[str] = []
        vocab_plen: list[int] = []
        for alias, metas in zip(self.patterns, self.meta):
            ids = []
            for canonical, label in metas:
                ids.append(len(vocab_name))
                vocab_name.append(alias)
                vocab_label.append(label)
                vocab_canonical.append(canonical)
                vocab_plen.append(len(alias))
            self.meta_ids.append(ids)
        self.vocab_name = pa.array(vocab_name, pa.string())
        self.vocab_label = pa.array(vocab_label, pa.string())
        self.vocab_canonical = pa.array(vocab_canonical, pa.string())
        self.vocab_plen = np.asarray(vocab_plen, dtype=np.int64)

    def match(self, text: str) -> Iterator[tuple[int, int, str, str, str]]:
        """Yield (begin, end, alias, canonical, label) for every occurrence."""
        if self.use_find:
            find = text.find
            for alias, plen, metas in zip(self.patterns, self.lens, self.meta):
                i = find(alias)
                while i >= 0:
                    end = i + plen
                    for canonical, label in metas:
                        yield i, end, alias, canonical, label
                    i = find(alias, i + 1)
            return
        for end, pat_idx in self.ac.find(text):
            begin = end - self.lens[pat_idx]
            alias = self.patterns[pat_idx]
            for canonical, label in self.meta[pat_idx]:
                yield begin, end, alias, canonical, label

    def match_rows(self, text: str, context_window: int | None) -> list[tuple]:
        """Hot-path variant: build the mention-struct tuples directly
        (no generator frames, aliases with a single meta take the fast
        branch).  Row shape matches MENTION_STRUCT field order."""
        rows: list[tuple] = []
        append = rows.append
        if self.use_find:
            find = text.find
            for alias, plen, metas in zip(self.patterns, self.lens, self.meta):
                i = find(alias)
                if i < 0:
                    continue
                single = metas[0] if len(metas) == 1 else None
                while i >= 0:
                    end = i + plen
                    ctx = (
                        text[0 if i < context_window else i - context_window : end + context_window]
                        if context_window is not None
                        else None
                    )
                    if single is not None:
                        append((alias, single[1], single[0], i, ctx))
                    else:
                        for canonical, label in metas:
                            append((alias, label, canonical, i, ctx))
                    i = find(alias, i + 1)
            return rows
        for begin, end, alias, canonical, label in self.match(text):
            ctx = (
                text[max(0, begin - context_window) : end + context_window]
                if context_window is not None
                else None
            )
            append((alias, label, canonical, begin, ctx))
        return rows


    def match_batch_columns(self, texts: list[str], context_window: int | None):
        """Columnar whole-batch matcher: all documents of one Arrow batch are
        joined into one string, each alias is located with C-level str.find
        (or one Aho-Corasick pass for large dictionaries), and the per-match
        doc/offset mapping is pure numpy.  No per-mention Python tuples — the
        interpreter only runs O(aliases + matches) steps per batch instead of
        O(docs × aliases).

        Returns (meta_ids, begins, counts, contexts):
        meta-row ids + int32 begins sorted by document, per-document match
        counts, and context slices (None when context_window is None).
        """
        n = len(texts)
        big = _BATCH_SEP.join(texts)
        lens = np.fromiter((len(t) + 1 for t in texts), np.int64, count=n)
        offs = np.zeros(n, np.int64)
        if n > 1:
            np.cumsum(lens[:-1], out=offs[1:])
        mid_chunks: list[np.ndarray] = []
        pos_chunks: list[np.ndarray] = []
        if self.use_find:
            find = big.find
            for pat_idx, alias in enumerate(self.patterns):
                pos = []
                i = find(alias)
                while i >= 0:
                    pos.append(i)
                    i = find(alias, i + 1)
                if not pos:
                    continue
                parr = np.asarray(pos, np.int64)
                for mid in self.meta_ids[pat_idx]:
                    mid_chunks.append(np.full(len(parr), mid, np.int64))
                    pos_chunks.append(parr)
        else:
            by_pattern: dict[int, list[int]] = {}
            for end, pat_idx in self.ac.find(big):
                by_pattern.setdefault(pat_idx, []).append(end - self.lens[pat_idx])
            for pat_idx, pos in by_pattern.items():
                parr = np.asarray(pos, np.int64)
                for mid in self.meta_ids[pat_idx]:
                    mid_chunks.append(np.full(len(parr), mid, np.int64))
                    pos_chunks.append(parr)
        if not mid_chunks:
            empty = np.empty(0, np.int64)
            ctxs = [] if context_window is not None else None
            return empty, empty.astype(np.int32), np.zeros(n, np.int64), ctxs
        mid_all = np.concatenate(mid_chunks)
        pos_all = np.concatenate(pos_chunks)
        doc_all = np.searchsorted(offs, pos_all, "right") - 1
        order = np.argsort(doc_all, kind="stable")
        mid_all, pos_all, doc_all = mid_all[order], pos_all[order], doc_all[order]
        begins = (pos_all - offs[doc_all]).astype(np.int32)
        counts = np.bincount(doc_all, minlength=n)
        ctxs = None
        if context_window is not None:
            lo = np.maximum(offs[doc_all], pos_all - context_window)
            hi = np.minimum(
                offs[doc_all] + lens[doc_all] - 1,
                pos_all + self.vocab_plen[mid_all] + context_window,
            )
            ctxs = [big[a:b] for a, b in zip(lo.tolist(), hi.tolist())]
        return mid_all, begins, counts, ctxs


# Per-executor-process automaton cache (module global survives across Arrow
# batches and tasks within one python worker — the setup cost is paid once).
_AUTOMATON_CACHE: dict[str, _Automaton] = {}


def _gazetteer_fingerprint(entries: Sequence[tuple[str, str, str]]) -> str:
    """ORDER-SENSITIVE cache key.  The automaton's meta-row id enumeration
    follows entry insertion order, and the dictionary-encoded path decodes
    executor-emitted ids against a driver-side vocab built from the caller's
    entry order — a sorted (order-insensitive) key would let a
    reordered-but-equal gazetteer reuse a cached automaton whose id
    enumeration no longer matches the decode vocab (round-3 review)."""
    h = hashlib.sha256()
    for row in entries:
        h.update("\x1f".join(row).encode("utf-8"))
        h.update(b"\x1e")  # row terminator: without it the per-row updates
        # concatenate and distinct gazetteers can hash identically
    return h.hexdigest()


def _get_automaton(key: str, entries: Sequence[tuple[str, str, str]]) -> _Automaton:
    auto = _AUTOMATON_CACHE.get(key)
    if auto is None:
        auto = _Automaton(entries)
        _AUTOMATON_CACHE[key] = auto
    return auto


_BROADCAST_CACHE: dict = {}


def _broadcast_gazetteer(spark, key: str, entries):
    """Driver-side broadcast cache keyed by (application, gazetteer
    fingerprint): without it, every extraction call — one per micro-batch in
    the streaming path — pinned a fresh never-destroyed broadcast in the
    driver BlockManager (round-3 review)."""
    cache_key = (spark.sparkContext.applicationId, key)
    bc = _BROADCAST_CACHE.get(cache_key)
    if bc is None:
        bc = spark.sparkContext.broadcast(entries)
        _BROADCAST_CACHE[cache_key] = bc
    return bc


MENTION_STRUCT = StructType(
    [
        StructField("name", StringType()),
        StructField("label", StringType()),
        StructField("canonical", StringType()),
        StructField("begin", IntegerType()),
        StructField("context", StringType()),
    ]
)

DOC_MENTIONS_SCHEMA = StructType(
    [
        StructField("doc_sha", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("mentions", ArrayType(MENTION_STRUCT)),
        StructField("error", StringType()),
    ]
)

CONTEXT_WINDOW = 40  # chars each side; ≡ P6 deterministic description snippet

_MENTION_PA = pa.struct(
    [
        ("name", pa.string()),
        ("label", pa.string()),
        ("canonical", pa.string()),
        ("begin", pa.int32()),
        ("context", pa.string()),
    ]
)
_OUT_NAMES = ["doc_sha", "repo", "path", "commit", "mentions", "error"]


def _mentions_batch(
    auto: _Automaton, batch: pa.RecordBatch, cw: int | None
) -> pa.RecordBatch:
    """One Arrow batch of documents → one Arrow batch of per-doc mention
    arrays, assembled columnar: mention strings come from vocabulary
    ``take`` (C++), provenance columns pass through zero-copy, and the only
    Python-object work is the str.find position loops (plus context slices
    when requested)."""
    texts = [t if t is not None else "" for t in batch.column("content").to_pylist()]
    n = len(texts)
    try:
        mids, begins, counts, ctxs = auto.match_batch_columns(texts, cw)
        idx = pa.array(mids, pa.int64())
        struct = pa.StructArray.from_arrays(
            [
                auto.vocab_name.take(idx),
                auto.vocab_label.take(idx),
                auto.vocab_canonical.take(idx),
                pa.array(begins, pa.int32()),
                pa.array(ctxs, pa.string())
                if ctxs is not None
                else pa.nulls(len(mids), pa.string()),
            ],
            fields=list(_MENTION_PA),
        )
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        mentions = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        errors = pa.nulls(n, pa.string())
    except Exception:
        # I5 row-level containment: isolate the failing document(s) with the
        # per-doc matcher; failures become (mentions=None, error=str) rows
        mention_lists: list[list[dict] | None] = []
        errs: list[str | None] = []
        for content in texts:
            try:
                rows = auto.match_rows(content, cw)
                mention_lists.append(
                    [
                        {
                            "name": r[0], "label": r[1], "canonical": r[2],
                            "begin": r[3], "context": r[4],
                        }
                        for r in rows
                    ]
                )
                errs.append(None)
            except Exception as exc:
                mention_lists.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        mentions = pa.array(mention_lists, pa.list_(_MENTION_PA))
        errors = pa.array(errs, pa.string())
    return pa.RecordBatch.from_arrays(
        [
            batch.column("doc_sha"),
            batch.column("repo"),
            batch.column("path"),
            batch.column("commit"),
            mentions,
            errors,
        ],
        names=_OUT_NAMES,
    )


def extract_doc_mentions(
    docs: DataFrame,
    gazetteer_entries: Sequence[tuple[str, str, str]],
    context_window: int = CONTEXT_WINDOW,
    emit_context: bool = True,
) -> DataFrame:
    """documents → ONE row per document with its mention array
    (DOC_MENTIONS_SCHEMA) — the pre-explode form.

    This is the natural unit for per-document consumers (triple
    materialization reads the per-doc entity set directly from this frame
    with ZERO shuffles); ``extract_mentions`` is the exploded row view for
    mention-level consumers (linking, dedup).
    """
    entries = [tuple(e) for e in gazetteer_entries]
    key = _gazetteer_fingerprint(entries)
    spark = docs.sparkSession
    bc = _broadcast_gazetteer(spark, key, entries)
    cw = context_window if emit_context else None

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        auto = _get_automaton(key, bc.value)
        for batch in batches:
            yield _mentions_batch(auto, batch, cw)

    from ..plans.parallelism import scale_out

    needed = scale_out(docs.select("doc_sha", "repo", "path", "commit", "content"))
    return needed.mapInArrow(run, schema=DOC_MENTIONS_SCHEMA)


DOC_MENTION_IDS_SCHEMA = StructType(
    [
        StructField("doc_sha", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("mids", ArrayType(IntegerType())),
        StructField("error", StringType()),
    ]
)


def _mention_ids_batch(
    auto: _Automaton, batch: pa.RecordBatch
) -> pa.RecordBatch:
    """One Arrow batch of documents → per-doc arrays of DISTINCT meta-row ids
    (the dictionary-encoded form): the strings never cross the Arrow
    boundary — 4 bytes per distinct mention instead of three strings.
    Distinctness is established here with one vectorized np.unique over
    (doc, mid) pairs, so consumers need no array_distinct."""
    texts = [t if t is not None else "" for t in batch.column("content").to_pylist()]
    n = len(texts)
    nv = len(auto.vocab_plen)
    try:
        mids, _begins, counts, _ = auto.match_batch_columns(texts, None)
        if len(mids):
            # recover doc ids from counts, unique (doc, mid) pairs in one pass
            docs_per_match = np.repeat(np.arange(n, dtype=np.int64), counts)
            uniq = np.unique(docs_per_match * nv + mids)
            doc_u = uniq // nv
            mid_u = (uniq % nv).astype(np.int32)
            counts_u = np.bincount(doc_u, minlength=n)
        else:
            mid_u = np.empty(0, np.int32)
            counts_u = np.zeros(n, np.int64)
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(counts_u, out=offsets[1:])
        mid_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(mid_u, pa.int32())
        )
        errors = pa.nulls(n, pa.string())
    except Exception:
        # I5 row-level containment: isolate the failing document(s)
        per_doc: list[list[int] | None] = []
        errs: list[str | None] = []
        for content in texts:
            try:
                m, _b, _c, _ = auto.match_batch_columns([content], None)
                per_doc.append(sorted({int(x) for x in m}))
                errs.append(None)
            except Exception as exc:
                per_doc.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        mid_list = pa.array(per_doc, pa.list_(pa.int32()))
        errors = pa.array(errs, pa.string())
    return pa.RecordBatch.from_arrays(
        [
            batch.column("doc_sha"),
            batch.column("repo"),
            batch.column("path"),
            batch.column("commit"),
            mid_list,
            errors,
        ],
        names=["doc_sha", "repo", "path", "commit", "mids", "error"],
    )


def extract_doc_mention_ids(
    docs: DataFrame,
    gazetteer_entries: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """documents → one row per document with its DISTINCT mention meta-row id
    array (DOC_MENTION_IDS_SCHEMA) — the dictionary-encoded extraction form
    for large dictionaries.

    ``build_vocab(gazetteer_entries)`` decodes ids back to
    (canonical, label, name) JVM-side (see
    triples.materialize_triples_from_doc_ids); span positions and context are
    deliberately absent — this is the entity-SET form the flagship triple
    path consumes.  Versus ``extract_doc_mentions`` the Arrow payload drops
    from three strings per occurrence to 4 bytes per distinct mention.
    """
    entries = [tuple(e) for e in gazetteer_entries]
    key = _gazetteer_fingerprint(entries)
    spark = docs.sparkSession
    bc = _broadcast_gazetteer(spark, key, entries)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        auto = _get_automaton(key, bc.value)
        for batch in batches:
            yield _mention_ids_batch(auto, batch)

    from ..plans.parallelism import scale_out

    needed = scale_out(docs.select("doc_sha", "repo", "path", "commit", "content"))
    return needed.mapInArrow(run, schema=DOC_MENTION_IDS_SCHEMA)


def extract_mentions(
    docs: DataFrame,
    gazetteer_entries: Sequence[tuple[str, str, str]],
    context_window: int = CONTEXT_WINDOW,
    emit_context: bool = True,
) -> DataFrame:
    """documents → mention rows (doc_sha, repo, path, commit, name, label,
    canonical, begin, end, context, error).

    One output row per (occurrence × candidate canonical); downstream stages
    dedup by the reference identity key (doc, name, label) and resolve
    ambiguous canonicals (operators.linking).

    Python emits ONE row per document carrying a mention array; the fan-out
    to mention rows is a JVM-side explode.  This keeps the provenance strings
    out of the Python hot loop (they would otherwise be duplicated per
    mention through pandas→Arrow) — ~2× less Python work per document.
    Zero-mention documents vanish in the explode; error rows (I5 row-level
    containment) survive via explode_outer + the error-or-mention filter.

    ``end`` is derived JVM-side (begin + length(name)); ``emit_context=False``
    skips the context snippet entirely (linking needs it only when the
    gazetteer has ambiguous aliases) — fewer bytes through Arrow and the
    downstream dedup shuffle.
    """
    per_doc = extract_doc_mentions(
        docs, gazetteer_entries, context_window, emit_context
    )
    exploded = per_doc.select(
        "doc_sha",
        "repo",
        "path",
        "commit",
        F.explode_outer("mentions").alias("m"),
        "error",
    ).where(F.col("m").isNotNull() | F.col("error").isNotNull())
    return exploded.select(
        "doc_sha",
        "repo",
        "path",
        "commit",
        F.col("m.name").alias("name"),
        F.col("m.label").alias("label"),
        F.col("m.canonical").alias("canonical"),
        F.col("m.begin").alias("begin"),
        (F.col("m.begin") + F.length("m.name")).alias("end"),
        F.col("m.context").alias("context"),
        "error",
    )


DOC_KEY = ["doc_key1", "doc_key2"]


def with_doc_key(df: DataFrame) -> DataFrame:
    """Compact 128-bit document identity (two seeded xxhash64s over the full
    provenance).  Grouping/joining on two longs is far cheaper than on the
    ~150 bytes of (doc_sha, repo, path, commit) strings, and 128 bits keeps
    the collision probability negligible even at 10^12 documents (a single
    64-bit key would collide with ~3% probability there)."""
    prov = [F.col("doc_sha"), F.col("repo"), F.col("path"), F.col("commit")]
    return df.withColumn("doc_key1", F.xxhash64(F.lit(1), *prov)).withColumn(
        "doc_key2", F.xxhash64(F.lit(2), *prov)
    )


def dedup_mentions(mentions: DataFrame) -> DataFrame:
    """Reference D1: set semantics on (doc, name, label)
    (remove_duplicate_entities, reflect_workflow1.py:44-53).  Keeps the
    earliest span per key — deterministic analogue of first-wins order —
    via min(begin); map-side partial aggregation keeps the shuffle small.

    Shuffle key is the compact hashed doc key; provenance strings ride along
    via first() (constant within a group).
    """
    keyed = with_doc_key(mentions.where(F.col("error").isNull()))
    agged = keyed.groupBy(*DOC_KEY, "name", "label").agg(
        F.first("doc_sha").alias("doc_sha"),
        F.first("repo").alias("repo"),
        F.first("path").alias("path"),
        F.first("commit").alias("commit"),
        # ONE ordered struct-min: earliest span, ties broken by canonical
        # then context — a deterministic total order.  (min_by per column
        # left begin-ties engine-defined: an alias fanning out to two
        # canonicals at the same span could flip canonical between runs.)
        F.min(F.struct("begin", "canonical", "context")).alias("_m"),
    )
    return agged.select(
        *DOC_KEY,
        "name",
        "label",
        "doc_sha",
        "repo",
        "path",
        "commit",
        F.col("_m.begin").alias("begin"),
        F.col("_m.canonical").alias("canonical"),
        F.col("_m.context").alias("context"),
    ).withColumn("end", F.col("begin") + F.length("name"))
