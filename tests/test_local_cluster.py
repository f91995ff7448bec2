"""TRUE multi-executor evidence (north rule: "run ... on a multi-executor
cluster"): local-cluster[2,2,1024] spawns two REAL executor JVMs with
their own memory, exercising the addPyFile package-shipping path and
cross-JVM shuffles that local[*] cannot — and the moderation pipeline
must produce byte-identical results on that topology.

Runs in a SUBPROCESS because SparkContext is a per-process singleton and
the shared test session already owns a local[4] context.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import pyspark
os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
from pyspark.sql import SparkSession
import __spark_entry__ as em
from localmod_spark.operators.context import add_context
from localmod_spark.operators.score import score_turns
from localmod_spark.sources.transcripts import synth_transcripts

def run(master):
    spark = (SparkSession.builder.master(master)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    em._ship_package(spark)  # executors are separate JVMs - zip must ship
    turns = synth_transcripts(spark, 4000, slices=4)
    out = add_context(score_turns(turns))
    rows = {(r.conv_id, r.turn_idx): (r.keep, r.scrubbed_text, r.turn_rank)
            for r in out.collect()}
    # check AFTER the job: executor registration is asynchronous, but by
    # now every JVM that ran tasks has reported its block manager
    members = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    spark.stop()
    # a stopped context must be fully torn down before the next master
    SparkSession.builder._options = {}
    return members, rows

members, lc = run("local-cluster[2,2,1024]")
assert members >= 3, f"expected 2 executor JVMs + driver, got {members}"
assert len(lc) == 4000
_, ref = run("local[2]")
print("MEMBERS", members)
print("RESULT_MATCH" if lc == ref else "RESULT_MISMATCH")
"""


@pytest.mark.slow
def test_pipeline_matches_local_mode_on_real_executors():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=600, cwd="/tmp",
    )
    assert "RESULT_MATCH" in out.stdout and "RESULT_MISMATCH" not in out.stdout, (
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
    )
