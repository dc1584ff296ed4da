"""N vs 4N scaling for the ANALYTICS jobs (complements
tools/bench_scaling.py, which covers the crawl's schedule/fetch/
extract stages — together they evidence the north rule's two-cluster-
size criterion across every job family this engine ships).

Method (see the variance notes in BENCH/BASELINE.md): each (cores,
pass) runs in a FRESH subprocess; python workers are warmed on every
core and the Arrow path warmed before timing; passes alternate
4→16→4→16 so drift hits both sides; per-stage BEST of the passes is
reported. Keep the machine idle.

Stages (one per plan family):
  contamination  ngram_contamination — explode + hash join
  lsh_pairs      minhash_lsh_pairs   — signature + band shuffle join
  xent           unigram_xent        — two-pass agg + broadcast join

Usage: python tools/bench_scaling_analytics.py [passes]
Writes a JSON line to stdout; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from edgar_crawler_spark.session import get_spark
from edgar_crawler_spark.queries import QUERIES
cores = int(sys.argv[1])
sf = %(sf)r
spark = get_spark("scal-an", cores=cores, shuffle_partitions=cores)

def force(df):
    df.write.format("noop").mode("overwrite").save()

# warm: a python-worker task on every core, then the Arrow path
spark.range(cores * 4).repartition(cores).mapInPandas(
    lambda it: it, "id long").write.format("noop").mode("overwrite").save()
force(QUERIES["count_by_type"].fn(spark, sf))
force(QUERIES["token_stats"].fn(spark, sf))

out = {}
for key, qname in [("contamination", "ngram_contamination"),
                   ("lsh_pairs", "minhash_lsh_pairs"),
                   ("xent", "unigram_xent")]:
    t0 = time.perf_counter()
    force(QUERIES[qname].fn(spark, sf))
    out[key] = time.perf_counter() - t0
print(json.dumps(out))
"""


def run_child(cores: int, sf: str) -> dict:
    code = CHILD % {"repo": REPO, "sf": sf}
    r = subprocess.run(
        [sys.executable, "-c", code, str(cores)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    best = {4: {}, 16: {}}
    for p in range(passes):
        for cores in (4, 16):
            res = run_child(cores, sf)
            for k, v in res.items():
                cur = best[cores].get(k)
                best[cores][k] = v if cur is None else min(cur, v)
            print(f"pass {p} cores {cores}: "
                  + " ".join(f"{k}={v:.2f}s" for k, v in res.items()),
                  file=sys.stderr)
    out = {"sf": sf, "cores": {str(c): best[c] for c in (4, 16)}}
    for k in best[4]:
        speedup = best[4][k] / best[16][k]
        out[f"efficiency_{k}"] = round(speedup / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
