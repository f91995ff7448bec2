"""Multi-executor topology evidence on one box (complements
scripts/scaling_bench.py, the sanctioned N-vs-4N parallelism proxy).

Two measurements, both CPU-affinity-bound so executor compute can't
borrow idle cores:

1. **Topology neutrality** — the SAME job, same 10 pinned cores:
   ``local[8]`` (one JVM) vs ``local-cluster[2,4,3072]`` (driver +
   cluster master/worker daemons + 2 REAL executor JVMs, package shipped
   via addPyFile, cross-JVM shuffle for the context stage).  Round-5
   runs: ratio 1.06 / 0.90 / 1.57 across three replications (see
   BENCH/BASELINE.md) — the swing is the box's documented bimodal
   state, and the cluster side never measured below 0.90x of the
   single JVM: no topology penalty detectable above box noise, so the
   core-count scaling pairs in
   scaling_bench.py transfer to the multi-executor topology.
   (At unrealistically small 2-core executors, per-JVM fixed overhead
   does bite — 4x2-core executors measured ~0.66 of local[8]; real
   clusters run 4-16 core executors.)

2. **Executor-count pair** — 1 executor vs 4 executors (4 cores, 3 GiB
   each, +2 infra cores for the driver/master/worker daemons, which on a
   real cluster are separate machines).  The 4-executor side spans 16
   cores of this ONE socket and therefore runs into the documented
   memory-bandwidth knee (no-Spark kernel ceiling at 8->32 cores:
   0.63-0.82 across rounds) — a falloff a real 4N-executor cluster,
   whose executors own their own sockets, does not have.  Reported for
   transparency alongside #1; the sanctioned below-knee pairs live in
   scaling_bench.py.

Usage: python scripts/cluster_scaling.py [n_turns]   (default 300000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import pyspark
os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
from pyspark.sql import functions as F
import __spark_entry__ as em
from localmod_spark.operators.context import add_context
from localmod_spark.operators.score import score_turns
from localmod_spark.session import get_spark
from localmod_spark.sources.transcripts import synth_transcripts

master = {master!r}
n_turns = {n_turns}
# same session builder as scaling_bench.py (get_spark: Kryo, UTC, AQE,
# arrow on) so cross-script throughput comparisons are apples-to-apples;
# shuffle partitions scale with the job cores like the sibling script
spark = get_spark(app_name="cluster_scaling", master=master,
                  shuffle_partitions=max({job_cores}, 8),
                  arrow_batch_rows=10000,
                  extra_conf={{"spark.ui.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
em._ship_package(spark)  # separate executor JVMs: the package zip must ship
turns = synth_transcripts(spark, n_turns, slices=24).persist()
turns.count()

def job():
    scored = add_context(score_turns(turns))
    scored.agg(F.count(F.lit(1)).alias("n"),
               *[F.count(c).alias(f"c{{i}}") for i, c in enumerate(scored.columns)]
               ).collect()

job()  # full-pass warmup: every executor spawns+imports its Python workers
best = 1e18
for _ in range(2):
    t0 = time.time(); job(); best = min(best, time.time() - t0)
members = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
print("RESULT " + json.dumps({{"master": master, "jvm_members": members,
                               "wall_sec": round(best, 3),
                               "turns_per_sec": round(n_turns / best, 1)}}))
spark.stop()
"""


def run_at(master: str, n_cores: int, n_turns: int, job_cores: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, master=master, n_turns=n_turns,
                              job_cores=job_cores)
    cpus = ",".join(str(c) for c in range(n_cores))
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from {master}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    # 1: topology neutrality — identical cores, one JVM vs real executors
    one_jvm = run_at("local[8]", 10, n_turns, job_cores=8)
    two_exec = run_at("local-cluster[2,4,3072]", 10, n_turns, job_cores=8)
    neutrality = round(two_exec["turns_per_sec"] / one_jvm["turns_per_sec"], 3)
    # 2: executor-count pair (1 -> 4 executors; big side crosses the
    # socket's bandwidth knee — see module docstring)
    small = run_at("local-cluster[1,4,3072]", 6, n_turns, job_cores=4)
    big = run_at("local-cluster[4,4,3072]", 18, n_turns, job_cores=16)
    eff = round(big["turns_per_sec"] / (4 * small["turns_per_sec"]), 3)
    print(json.dumps({
        "n_turns": n_turns,
        "topology_neutrality": {
            "local8_tps": one_jvm["turns_per_sec"],
            "two_executors_tps": two_exec["turns_per_sec"],
            "ratio": neutrality,
        },
        "executor_pair_1_to_4": {
            "one_executor": small, "four_executors": big,
            "efficiency": eff,
            "note": "big side spans 16/32 cores of one socket — bounded "
                    "by the documented memory-bandwidth knee, not the job",
        },
    }))


if __name__ == "__main__":
    main()
