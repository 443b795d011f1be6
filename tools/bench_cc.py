"""Connected-components scale benchmark (the BENCH.md 2.1M-edge workload).

Graph: 1M-node pseudo-random graph (2M edges) + a 100k-spoke hot hub +
a 1000-node chain — the same shape as the round-1 measurement (400 s at
pinned local[16] with the round-1 salted min-label loop; 69 s with the
round-2 large-star/small-star rewrite).

Run pinned:  taskset -c 0-15 python tools/bench_cc.py 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.canonicalize import (
    connected_components,
)
from military_entity_extraction_based_on_large_models_spark.session import get_spark


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        app_name=f"cc-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    n_nodes, n_rand = 1_000_000, 2_000_000
    rand = spark.range(n_rand).select(
        F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes))).alias("src"),
        F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes))).alias("dst"),
    )
    hub = spark.range(100_000).select(
        F.lit("hub").alias("src"),
        F.concat(F.lit("s"), F.col("id")).alias("dst"),
    )
    chain = spark.range(1_000).select(
        F.concat(F.lit("c"), F.col("id")).alias("src"),
        F.concat(F.lit("c"), F.col("id") + 1).alias("dst"),
    )
    edges = rand.unionByName(hub).unionByName(chain).localCheckpoint(eager=True)
    n_edges = edges.count()

    active_filter = os.environ.get("SPARK_GRAFT_CC_ACTIVE_FILTER") == "1"
    t0 = time.time()
    comp = connected_components(edges, active_filter=active_filter)
    n_nodes_out = comp.count()
    n_comps = comp.select("component").distinct().count()
    wall = time.time() - t0

    chain_comps = comp.where(F.col("node").startswith("c")).select("component").distinct().count()
    hub_comp = comp.where(F.col("node") == "hub").first()["component"]
    spokes_ok = (
        comp.where(F.col("node").startswith("s"))
        .where(F.col("component") != hub_comp)
        .count()
    )
    print(
        {
            "active_filter": active_filter,
            "cpus": cpus,
            "edges": n_edges,
            "nodes": n_nodes_out,
            "components": n_comps,
            "wall_sec": round(wall, 1),
            "edges_per_sec": int(n_edges / wall),
            "chain_is_one_component": chain_comps == 1,
            "hub_spokes_misassigned": spokes_ok,
        }
    )


if __name__ == "__main__":
    main()
