"""Operator-level scaling evidence for the host-graph PageRank.

Generates a deterministic 10^7-edge host graph over 10^5 hosts —
arithmetic edge derivation, with 30% of edges funneled into one hot
host (the skew a real crawl graph has: a few authority hosts absorb
most in-links) — and runs ``pagerank_int`` at two parallelism levels
in separate JVMs, reporting walls, edge-throughput, and the N->4N
scaling efficiency.

What this evidences (the graph.py design premises, empirically):
- the rank table (10^5 hosts) broadcasts — no executor OOM, no SMJ;
- each superstep is ONE shuffle whose hot-host key is absorbed by
  map-side partial aggregation (the skew shows up as nothing);
- wall scales with cores at the same bandwidth-unbound operating
  point the crawl campaign uses (1->4 cores by default).

Usage: python tools/scale_pagerank.py [n_edges] [n_hosts] [cores_a] [cores_b]
Defaults: 10_000_000 edges, 100_000 hosts, 1, 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from urlmap_spark.session import get_spark
from urlmap_spark.operators.graph import pagerank_int

n_edges, n_hosts, cores, iters = {n_edges}, {n_hosts}, {cores}, {iters}
spark = get_spark(master=f"local[{{cores}}]", app_name="scale_pagerank")
spark.sparkContext.setLogLevel("ERROR")

# deterministic host graph: uniform src; dst uniform except 30% of
# edges funnel into host 0 (authority-host skew)
e = (
    spark.range(n_edges).repartition(max(cores * 4, 8))
    .select(
        F.concat(F.lit("h"), F.pmod(F.col("id") * 2654435761, F.lit(n_hosts)),
                 F.lit(".test")).alias("src_host"),
        F.concat(F.lit("h"),
                 F.when(F.pmod(F.col("id"), F.lit(10)) < 3, F.lit(0))
                  .otherwise(F.pmod(F.col("id") * 40503 + 17, F.lit(n_hosts))),
                 F.lit(".test")).alias("dst_host"),
        (F.pmod(F.col("id"), F.lit(7)) + 1).alias("cnt"),
    )
    .localCheckpoint()  # materialize: time pagerank, not generation
)
t0 = time.time()
ranks = pagerank_int(e, iters=iters).localCheckpoint()  # ONE materialization
n = ranks.count()
top = ranks.orderBy(F.desc("rank_int")).limit(1).collect()[0]
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall_s": round(wall, 2), "hosts": n,
                   "top_host": top["host"], "top_rank": top["rank_int"],
                   "edge_iters_per_s": round(n_edges * iters / wall)}}))
spark.stop()
"""


def run_leg(n_edges: int, n_hosts: int, cores: int, iters: int) -> dict:
    code = _LEG.format(repo=REPO, n_edges=n_edges, n_hosts=n_hosts,
                       cores=cores, iters=iters)
    t0 = time.time()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    leg = json.loads(line)
    leg["jvm_wall_s"] = round(time.time() - t0, 2)
    return leg


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cores_a = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cores_b = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    iters = 3
    print(f"pagerank_int scaling: {n_edges} edges, {n_hosts} hosts, "
          f"{iters} iters, local[{cores_a}] vs local[{cores_b}]", flush=True)
    a = run_leg(n_edges, n_hosts, cores_a, iters)
    print(f"  local[{cores_a}]: {json.dumps(a)}", flush=True)
    b = run_leg(n_edges, n_hosts, cores_b, iters)
    print(f"  local[{cores_b}]: {json.dumps(b)}", flush=True)
    assert a["hosts"] == b["hosts"], "node sets differ between legs!"
    assert (a["top_host"], a["top_rank"]) == (b["top_host"], b["top_rank"]), \
        "fixed-point ranks differ across parallelism — determinism broken!"
    speedup = a["wall_s"] / b["wall_s"]
    eff = speedup / (cores_b / cores_a)
    print(json.dumps({"speedup": round(speedup, 3),
                      "efficiency": round(eff, 3),
                      "cores": [cores_a, cores_b]}))


if __name__ == "__main__":
    main()
