"""Deterministic synthetic corpus + pure-Python oracle (FIXTURES.md §§1-4).

The corpus is a pure function of (seed, n_docs).  It embeds the reference
corpus's hard cases (SURVEY.md §7.3):

* ~30% zero-entity documents (sample_entity.json ids 139/217/26 analogue);
* duplicate mentions of one alias in one doc (G36k ×3 in val_entity.json 517);
* a hot alias ("Eurofighter") in ~20% of docs — hot-entity skew;
* mega-repo skew: 1% of repos own ~50% of rows;
* the ambiguous "Tiger" alias with disambiguating context words;
* substring-nested aliases ("Tornado" inside "Tornado GR4").

The oracle reimplements the cascade semantics in pure Python — substring
span matching (≡ EntityExtractor.py:124-130 containment), (name,label) dedup
(≡ reflect_workflow1.py:44-53), context disambiguation, and triple fan-out —
independently of Spark, so P/R vs the pipeline measures fidelity exactly
(judge counter definitions from judge/judge_entity.py:123-125).
"""

from __future__ import annotations

import hashlib
import random

from .gazetteer import CONTEXT_TERMS, MILITARY_GAZETTEER

FILLER = (
    "patrol exercise report communique observed deployment logistics convoy "
    "northern sector morning briefing allied forces readiness assessment"
).split()

TIGER_HELI_CTX = "helicopter squadron rotor flight"
TIGER_TANK_CTX = "tank battalion armor tracks ground"


def synth_documents(seed: int = 42, n_docs: int = 400) -> list[dict]:
    """Deterministic corpus rows in input_hint shape (repo, path, commit,
    lang, content)."""
    rng = random.Random(seed)
    aliases = [a for a, _, _ in MILITARY_GAZETTEER if a != "Tiger"]
    n_repos = max(10, n_docs // 20)
    mega = [f"repo-{i:04d}" for i in range(max(1, n_repos // 100 + 1))]
    rest = [f"repo-{i:04d}" for i in range(len(mega), n_repos)]
    docs = []
    for i in range(n_docs):
        repo = rng.choice(mega) if rng.random() < 0.5 else rng.choice(rest)
        path = f"src/d{i // 50}/doc_{i}.txt"
        roll = rng.random()
        words: list[str] = rng.sample(FILLER, k=rng.randint(4, 9))
        if roll < 0.30:
            pass  # zero-entity doc
        else:
            k = rng.randint(1, 4)
            picked = rng.sample(aliases, k=k)
            if rng.random() < 0.20:
                picked.append("Eurofighter")  # hot key
            if rng.random() < 0.10:
                picked.append(picked[0])  # duplicate mention
            if rng.random() < 0.15:
                # ambiguous alias with its disambiguating words adjacent, so
                # the Spark ±40-char context window and the whole-document
                # oracle score identically
                ctx = TIGER_HELI_CTX if rng.random() < 0.5 else TIGER_TANK_CTX
                picked.append(f"Tiger {ctx}")
            for alias in picked:
                words.insert(rng.randrange(len(words) + 1), alias)
        content = " ".join(words)
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
        docs.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": "en",
                "content": content,
            }
        )
    return docs


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def oracle_mentions(docs: list[dict]) -> set[tuple[str, str, str]]:
    """Pure-Python expected mention set {(doc_sha, name, label)} under the
    reference's containment semantics (`name in text`)."""
    out = set()
    for d in docs:
        sha = _sha256(d["content"])
        for alias, _canonical, label in MILITARY_GAZETTEER:
            if alias in d["content"]:
                out.add((sha, alias, label))
    return out


def _context_score(content: str, canonical: str) -> int:
    terms = set(CONTEXT_TERMS.get(canonical, ()))
    toks = set(t.lower() for t in content.replace("\n", " ").split())
    return len(toks & terms)


def oracle_linked(docs: list[dict]) -> set[tuple[str, str, str, str]]:
    """Expected linked set {(doc_sha, name, label, canonical)} after context
    disambiguation — one canonical per (doc, occurrence-name).

    Mirrors operators.linking: score desc, canonical asc tiebreak, applied
    per (name) over the WHOLE-document context (the Spark side scores a
    ±40-char window; the fixture generator keeps disambiguating words inside
    that window is NOT guaranteed, so tests on ambiguous cases use docs where
    context words sit adjacent — see tests/test_linking.py).
    """
    by_alias: dict[str, list[tuple[str, str]]] = {}
    for alias, canonical, label in MILITARY_GAZETTEER:
        by_alias.setdefault(alias, []).append((canonical, label))
    out = set()
    for d in docs:
        sha = _sha256(d["content"])
        for alias, cands in by_alias.items():
            if alias not in d["content"]:
                continue
            best = sorted(
                cands,
                key=lambda cl: (-_context_score(d["content"], cl[0]), cl[0]),
            )[0]
            out.add((sha, alias, best[1], best[0]))
    return out


def oracle_triples(docs: list[dict]) -> set[tuple[str, str, str, str]]:
    """Expected triple set {(subj, pred, obj, doc_sha)} — pure function of
    oracle_linked + the materialization rules in operators.triples."""
    linked = oracle_linked(docs)
    by_doc: dict[str, set[tuple[str, str, str]]] = {}
    for sha, name, label, canonical in linked:
        by_doc.setdefault(sha, set()).add((name, label, canonical))
    out = set()
    for sha, ents in by_doc.items():
        doc_ents = {(c, l) for _n, l, c in ents}
        for name, label, canonical in ents:
            out.add((canonical, "mentioned_as", name, sha))
            out.add((canonical, "instance_of", label, sha))
        non_loc = sorted(c for c, l in doc_ents if l != "location")
        locs = sorted(c for c, l in doc_ents if l == "location")
        for c in non_loc:
            for loc in locs:
                out.add((c, "located_in", loc, sha))
        for i, a in enumerate(non_loc):
            for b in non_loc[i + 1 :]:
                out.add((a, "co_occurs_with", b, sha))
    return out


def judge_prf(
    pred: set, gold: set
) -> tuple[float, float, float]:
    """P/R/F1 with the reference's counter definitions
    (judge/judge_entity.py:123-125): P=TP/|pred|, R=TP/|gold|."""
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return p, r, f1
