"""Structured-streaming variant: same scoring plan over readStream."""

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.score import score_turns
from localmod_spark.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts
from localmod_spark.streaming import conv_flag_counts_stream, score_stream


@pytest.fixture(scope="module")
def stream_source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    synth_transcripts(spark, 600, slices=2).write.mode("overwrite").parquet(d)
    return d


def test_streaming_scores_match_batch(spark, stream_source_dir, tmp_path_factory):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source_dir)
    scored = score_stream(stream)
    assert scored.isStreaming
    q = (
        scored.select("conv_id", "turn_idx", "keep", "scrubbed_text")
        .writeStream.format("memory")
        .queryName("scored_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx): (r.keep, r.scrubbed_text)
        for r in spark.sql("select * from scored_mem").collect()
    }
    batch = {
        (r.conv_id, r.turn_idx): (r.keep, r.scrubbed_text)
        for r in score_turns(spark.read.parquet(stream_source_dir))
        .select("conv_id", "turn_idx", "keep", "scrubbed_text")
        .collect()
    }
    assert got == batch and len(got) == 600


def test_streaming_windowed_conv_counts(spark, stream_source_dir):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(stream_source_dir)
    agg = conv_flag_counts_stream(score_stream(stream), watermark="1 hour", window="1 hour")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("conv_counts_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from conv_counts_mem")
    total = out.agg(F.sum("n_turns")).collect()[0][0]
    assert total == 600
    assert out.where("n_flagged > n_turns").count() == 0
