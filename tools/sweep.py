"""Robustness + timing sweep: run EVERY query surface (registered + retired)
at a given sf_dir, appending one JSON line per query to a JSONL file as it
goes (crash-safe progress).  The r4 verdict's "Next round" #3: all 70+
surfaces at 10× the bench scale, with the sf0.01 → 0.1 → 1 timing curve
recorded in BENCH.md.

Run: python tools/sweep.py <sf_dir> <out.jsonl> [only_prefix]
Env: SWEEP_SKIP=a,b,c skips named queries (for documented-quadratic
fixtures whose expected curve is recorded in BENCH.md instead of timed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = sys.argv[3] if len(sys.argv) > 3 else None

    import __spark_entry__ as entry
    from military_entity_extraction_based_on_large_models_spark.session import get_spark

    spark = get_spark(app_name="sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    skip = set(filter(None, os.environ.get("SWEEP_SKIP", "").split(",")))
    surfaces = {**entry.queries(), **entry.retired_queries()}
    with open(out_path, "a") as f:
        for name, fn in surfaces.items():
            if only and not name.startswith(only):
                continue
            if name in skip:
                f.write(json.dumps({"q": name, "skipped": True}) + "\n")
                continue
            t0 = time.time()
            try:
                n = fn(spark, sf_dir).count()
                rec = {"q": name, "rows": n, "sec": round(time.time() - t0, 2)}
            except Exception as e:  # noqa: BLE001 — robustness sweep records, not raises
                rec = {
                    "q": name,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                    "sec": round(time.time() - t0, 2),
                }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec, flush=True)


if __name__ == "__main__":
    main()
