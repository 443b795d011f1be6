"""Gazetteer (alias dictionary) — the engine's replacement for LLM knowledge.

The reference's text extractor is a fine-tuned GLM4-9B whose post-filter keeps
only entities that are literal substrings of the source text
(EntityExtractor.py:124-130) under the six-label taxonomy declared in its
prompt (EntityExtractor.py:50-64: vehicle, aircraft, vessel, weapon, location,
other).  A gazetteer + span matcher satisfies that contract by construction
and is deterministic, so correctness is exactly reproducible without model
weights (which the reference repo does not ship — .MISSING_LARGE_BLOBS).

Two dictionaries:

* :func:`military_gazetteer` — military entities per the reference's domain;
  used by the KG pipeline tests over the synthetic input_hint corpus.
  Includes the hard cases the reference data exhibits: aliases sharing a
  canonical (linking), an ambiguous "Tiger"-style alias mapping to two
  canonicals under two labels (val_entity.json ids 432 vehicle vs 498
  aircraft), and aliases that are substrings of other aliases
  ("Tornado" vs "Tornado GR4").
* :func:`vocab_gazetteer` — a small dictionary over the driver testdata's
  ``documents.text`` vocabulary, so the same operators are exercised (and
  DuckDB-oracle-checked) on /root/testdata.

Both are plain Python lists of (alias, canonical, label) — small enough to
broadcast; the extraction stage ships them to executors once via
``SparkContext.broadcast`` and builds the Aho-Corasick automaton lazily per
executor process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LABELS = ("vehicle", "aircraft", "vessel", "weapon", "location", "other")

# (alias, canonical, label). Several aliases per canonical; one ambiguous
# alias ("Tiger") with two canonicals; substring-nested aliases.
MILITARY_GAZETTEER: list[tuple[str, str, str]] = [
    # aircraft
    ("F-16", "ent_f16", "aircraft"),
    ("F-16 Fighting Falcon", "ent_f16", "aircraft"),
    ("Fighting Falcon", "ent_f16", "aircraft"),
    ("Eurofighter", "ent_eurofighter", "aircraft"),          # hot-key alias
    ("Eurofighter Typhoon", "ent_eurofighter", "aircraft"),
    ("Tornado", "ent_tornado", "aircraft"),
    ("Tornado GR4", "ent_tornado_gr4", "aircraft"),
    ("A400M", "ent_a400m", "aircraft"),
    ("Atlas", "ent_a400m", "aircraft"),
    ("Tiger", "ent_tiger_heli", "aircraft"),                  # ambiguous ↓
    ("Apache", "ent_ah64", "aircraft"),
    ("AH-64", "ent_ah64", "aircraft"),
    # vehicle
    ("Tiger", "ent_tiger_tank", "vehicle"),                   # ambiguous ↑
    ("Leopard 2", "ent_leopard2", "vehicle"),
    ("Leopard 2A6", "ent_leopard2a6", "vehicle"),
    ("Abrams", "ent_m1abrams", "vehicle"),
    ("M1 Abrams", "ent_m1abrams", "vehicle"),
    ("Bradley", "ent_bradley", "vehicle"),
    ("Humvee", "ent_humvee", "vehicle"),
    # vessel
    ("Nimitz", "ent_nimitz", "vessel"),
    ("USS Nimitz", "ent_nimitz", "vessel"),
    ("Type 45", "ent_type45", "vessel"),
    ("Daring", "ent_type45", "vessel"),
    ("Gerald R. Ford", "ent_ford", "vessel"),
    # weapon
    ("Javelin", "ent_javelin", "weapon"),
    ("FGM-148", "ent_javelin", "weapon"),
    ("Tomahawk", "ent_tomahawk", "weapon"),
    ("HIMARS", "ent_himars", "weapon"),
    ("G36", "ent_g36", "weapon"),
    ("G36k", "ent_g36", "weapon"),                            # dup-mention case
    ("Patriot", "ent_patriot", "weapon"),
    # location
    ("Ramstein", "loc_ramstein", "location"),
    ("Ramstein Air Base", "loc_ramstein", "location"),
    ("Baltic Sea", "loc_baltic", "location"),
    ("Kandahar", "loc_kandahar", "location"),
    ("Norfolk", "loc_norfolk", "location"),
    ("Red Sea", "loc_redsea", "location"),
    # other (units / events)
    ("NATO", "org_nato", "other"),
    ("82nd Airborne", "unit_82nd", "other"),
    ("Operation Anaconda", "event_anaconda", "other"),
    ("Carrier Strike Group", "unit_csg", "other"),
]

# Dictionary over the driver testdata vocabulary (documents.text is a word
# salad over ~30 query-engine words; multi-word aliases pin span matching).
VOCAB_GAZETTEER: list[tuple[str, str, str]] = [
    ("spark", "ent_spark", "other"),
    ("hash scan", "ent_hash_scan", "weapon"),
    ("merge part", "ent_merge_part", "vehicle"),
    ("window", "ent_window", "aircraft"),
    ("sort merge", "ent_sort_merge", "vehicle"),
    ("table scan", "ent_table_scan", "weapon"),
    ("stream", "ent_stream", "vessel"),
    ("vector join", "ent_vector_join", "aircraft"),
    ("customer", "loc_customer", "location"),
    ("batch batch", "ent_batch2", "other"),
]

GAZETTEER_COLUMNS = ["alias", "canonical", "label"]

# Deterministic context terms per canonical: used by the linking stage to
# disambiguate ambiguous aliases (score = overlap with document tokens).
# This replaces the reference's VLM verification call (ImageEntityExtractor
# .py:169-185 reflect_correct) with a deterministic, columnar analogue.
CONTEXT_TERMS: dict[str, list[str]] = {
    "ent_tiger_heli": ["helicopter", "rotor", "squadron", "airborne", "flight"],
    "ent_tiger_tank": ["tank", "armor", "tracks", "battalion", "ground"],
}


def military_gazetteer(spark: SparkSession) -> DataFrame:
    """Gazetteer as a (small, broadcastable) DataFrame."""
    return spark.createDataFrame(MILITARY_GAZETTEER, GAZETTEER_COLUMNS)


def vocab_gazetteer(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(VOCAB_GAZETTEER, GAZETTEER_COLUMNS)


def gazetteer_values_sql(entries: list[tuple[str, str, str]]) -> str:
    """Render a gazetteer as an inline SQL VALUES relation for the DuckDB
    oracle: ``(VALUES (...), ...) AS g(alias, canonical, label)``."""
    rows = ", ".join(
        "('{}', '{}', '{}')".format(a.replace("'", "''"), c, l)
        for a, c, l in entries
    )
    return f"(VALUES {rows}) AS g(alias, canonical, label)"
