"""Sources: testdata table readers + deterministic transcript synthesis."""

from localmod_spark.sources.tables import load_table
from localmod_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    FIXTURE_TEXTS,
    CORPUS,
    synth_transcripts,
)

__all__ = [
    "load_table",
    "TRANSCRIPT_SCHEMA",
    "FIXTURE_TEXTS",
    "CORPUS",
    "synth_transcripts",
]
