"""spark-submit entry (S3): end-to-end smoke via a real subprocess —
the plain-script launch path (fresh JVM, package self-shipped, JSON
summary on stdout), resume on re-invocation, and env-driven thresholds."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "localmod_spark", "plans", "submit_job.py")


@pytest.mark.slow
def test_submit_job_smoke_and_resume(tmp_path):
    out = str(tmp_path / "job_out")
    env = {**os.environ, "LOCALMOD_SPAM_THRESHOLD": "0.3"}

    def run():
        p = subprocess.run(
            [sys.executable, SCRIPT, "--synthetic", "2000", "--output", out,
             "--waves", "2", "--max-concurrent-waves", "2", "--no-context"],
            capture_output=True, text=True, timeout=420, env=env, cwd="/tmp",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert sorted(first["waves_run"]) == [0, 1]
    assert first["rows_written"] == 2000

    second = run()  # the ledger must make the rerun a no-op
    assert second["waves_run"] == []
    assert second["waves_skipped"] == [0, 1]
    assert os.path.isdir(out + "/data/wave=0") and os.path.isdir(out + "/_lineage")


@pytest.mark.slow
def test_submit_job_selection_smoke_and_resume(tmp_path):
    out = str(tmp_path / "sel_out")

    def run():
        p = subprocess.run(
            [sys.executable, SCRIPT, "--job", "select", "--synthetic", "400",
             "--output", out],
            capture_output=True, text=True, timeout=420, cwd="/tmp",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["stages_run"] == ["valid", "bands", "pairs", "clusters", "selected"]
    assert first["selected_rows"] > 0

    second = run()
    assert second["stages_run"] == []
    assert second["selected_rows"] == first["selected_rows"]
    assert os.path.isdir(out + "/bands") and os.path.isdir(out + "/_lineage")


@pytest.mark.slow
def test_literal_spark_submit_py_files(tmp_path):
    """The north rule's literal launch shape: `spark-submit --py-files
    localmod_spark.zip plans/submit_job.py ...`.  spark-submit puts the
    SCRIPT's directory (plans/), not the repo root, on the driver path,
    so `import localmod_spark` resolves from the shipped ZIP — the same
    artifact a cluster deployment distributes to executors."""
    import shutil
    import tempfile

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("no spark-submit launcher in this pyspark install")
    zip_path = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), f"lm_pyfiles_{os.getpid()}"),
        "zip", root_dir=REPO, base_dir="localmod_spark",
    )
    # submit a COPY of the entry script from outside the repo: submit_job
    # falls back to inserting its own repo root on sys.path when it can
    # see one (plain-python launches), which would mask a broken zip —
    # from a bare temp dir the driver import can only come from --py-files
    script = str(tmp_path / "submit_job.py")
    shutil.copyfile(SCRIPT, script)
    out = str(tmp_path / "submit_out")
    p = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         script, "--synthetic", "1000", "--output", out, "--waves", "2",
         "--no-context"],
        capture_output=True, text=True, timeout=420, cwd="/tmp",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["rows_written"] == 1000
    assert sorted(summary["waves_run"]) == [0, 1]
    assert os.path.isdir(out + "/data/wave=1") and os.path.isdir(out + "/_lineage")


def test_submit_job_export_smoke_and_resume(tmp_path):
    out = str(tmp_path / "exp_out")

    def run():
        p = subprocess.run(
            [sys.executable, SCRIPT, "--job", "export", "--synthetic", "400",
             "--output", out, "--mix-weights", "en=1.0",
             "--token-budget", "2000", "--shards", "4"],
            capture_output=True, text=True, timeout=420, cwd="/tmp",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    first = run()
    assert first["stages_run"] == ["mixed", "shards"]
    assert first["shard_rows"] > 0 and first["n_shards"] == 4

    second = run()
    assert second["stages_run"] == []
    assert second["shard_rows"] == first["shard_rows"]
    assert os.path.isdir(out + "/shards") and os.path.isdir(out + "/_lineage")


@pytest.mark.slow
def test_submit_job_bloom_build_and_extend(tmp_path):
    art = str(tmp_path / "bloom_art")

    def run(n_synth, extra):
        p = subprocess.run(
            [sys.executable, SCRIPT, "--job", "bloom", "--key-col", "conv_id",
             "--synthetic", str(n_synth), "--output", art, *extra],
            capture_output=True, text=True, timeout=420, cwd="/tmp",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    # keyed on conv_id: 300 synth turns = 3 hot + 11 uniform conversations
    built = run(300, ["--bloom-bits", str(1 << 14), "--bloom-k", "3"])
    assert built["n_keys"] == 14 and not built["extended"]
    assert 0 < built["fill_ratio"] < 1
    assert os.path.isdir(art + "/words") and os.path.isdir(art + "/_bloom_params")

    # extend in place with a LARGER input (new conv ids) and NO bloom params
    # on the CLI: the artifact's own (bits, k) must win over the 1<<23/k=5
    # defaults, the new keys must set new bits, and the distinct-per-batch
    # key count accumulates (14 + 21 — batch overlap is not deduped)
    extended = run(500, ["--extend"])
    assert extended["extended"] and extended["num_bits"] == 1 << 14
    assert extended["n_keys"] == built["n_keys"] + 21
    assert extended["fill_ratio"] > built["fill_ratio"]


@pytest.mark.slow
def test_submit_job_conv_rollup_flag(tmp_path):
    out = str(tmp_path / "roll_out")
    p = subprocess.run(
        [sys.executable, SCRIPT, "--synthetic", "600", "--output", out,
         "--waves", "2", "--no-context", "--conv-max-flag-share", "0.2"],
        capture_output=True, text=True, timeout=420, cwd="/tmp",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    import glob

    import pandas as pd

    files = glob.glob(out + "/data/wave=*/*.parquet")
    cols = set(pd.read_parquet(files[0]).columns)
    assert {"conv_keep", "drop_reason"} <= cols


@pytest.mark.slow
def test_submit_job_ingest_drains_backlog_exactly_once(tmp_path):
    """--job ingest: drain a parquet backlog through the bloom gate; a
    second invocation with one new file (containing one redelivered key)
    admits only the genuinely new key."""
    src = tmp_path / "src"
    out = str(tmp_path / "ingest_out")

    def write_src(name, texts):
        import pandas as pd

        (src / name).mkdir(parents=True, exist_ok=True)
        pd.DataFrame(
            {"msg_id": [f"{name}-{i}" for i in range(len(texts))], "text": texts}
        ).to_parquet(src / name / "part-0.parquet", index=False)

    def run():
        p = subprocess.run(
            [sys.executable, SCRIPT, "--job", "ingest", "--input", f"{src}/*",
             "--output", out, "--bloom-bits", str(1 << 14), "--bloom-k", "3",
             "--files-per-batch", "1", "--score-admitted"],
            capture_output=True, text=True, timeout=420, cwd="/tmp",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    write_src("f0", ["alpha", "beta"])
    write_src("f1", ["beta", "gamma"])
    first = run()
    assert first["admitted_rows"] == 3 and first["n_keys"] == 3

    write_src("f2", ["gamma", "delta"])
    second = run()
    assert second["admitted_rows"] == 4 and second["n_keys"] == 4

    import glob

    import pandas as pd

    files = glob.glob(out + "/run=*/batch=*/*.parquet")
    landed = pd.concat([pd.read_parquet(f) for f in files])
    assert sorted(landed["text"].tolist()) == ["alpha", "beta", "delta", "gamma"]
    # --score-admitted: gate -> score -> land, moderation columns present
    assert {"keep", "scrubbed_text", "severity"} <= set(landed.columns)
