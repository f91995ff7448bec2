"""Standalone vectorized (pandas/Arrow) column functions.

Each wraps one kernel capability as a Series→Series pandas UDF for use
outside the fused pipeline stage (ad-hoc queries, single-purpose jobs).
All pattern state lives in kernel module globals → compiled once per
Python worker.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from localmod_spark.kernel.langid import detect_language
from localmod_spark.kernel.pii import pii_scrub
from localmod_spark.kernel.quality import quality_flagged, quality_score, quality_stats

PII_SCRUB_TYPE = StructType(
    [
        StructField("scrubbed_text", StringType(), True),
        StructField("n_redactions", IntegerType(), False),
    ]
)


@F.pandas_udf(PII_SCRUB_TYPE)
def pii_scrub_udf(texts: pd.Series) -> pd.DataFrame:
    """Byte-exact PII scrub (`src/localmod/classifiers/pii.py:215-229`)."""
    scrubbed, counts = [], []
    for t in texts:
        if t is None or pd.isna(t):
            scrubbed.append(None)
            counts.append(0)
        else:
            s, hits = pii_scrub(t)
            scrubbed.append(s)
            counts.append(len(hits))
    return pd.DataFrame({"scrubbed_text": scrubbed, "n_redactions": counts})


LANGID_TYPE = StructType(
    [
        StructField("lang", StringType(), False),
        StructField("lang_conf", DoubleType(), False),
    ]
)


@F.pandas_udf(LANGID_TYPE)
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    langs, confs = [], []
    for t in texts.fillna(""):
        lg, c = detect_language(t)
        langs.append(lg)
        confs.append(c)
    return pd.DataFrame({"lang": langs, "lang_conf": confs})


QUALITY_TYPE = StructType(
    [
        StructField("perplexity", DoubleType(), False),
        StructField("quality_score", DoubleType(), False),
        StructField("quality_flagged", BooleanType(), False),
        StructField("n_tokens", IntegerType(), False),
    ]
)


@F.pandas_udf(QUALITY_TYPE)
def quality_udf(texts: pd.Series) -> pd.DataFrame:
    ppl, qs, qf, nt = [], [], [], []
    for t in texts.fillna(""):
        st = quality_stats(t)
        ppl.append(st.perplexity)
        qs.append(quality_score(st))
        qf.append(bool(quality_flagged(st)))
        nt.append(st.n_tokens)
    return pd.DataFrame(
        {"perplexity": ppl, "quality_score": qs, "quality_flagged": qf, "n_tokens": nt}
    )


def perplexity_udf_with_kn_trigram(logprob_table):
    """Factory: perplexity under a corpus-trained interpolated-KN TRIGRAM
    LM (``operators.textstats.train_char_kn_trigram_lm``) — the dense
    (28², 28) table (~170 KB) ships in the UDF closure, the same
    lazy-artifact pattern as the bigram variant below."""
    import numpy as np

    from localmod_spark.kernel.quality import char_perplexity_trigram

    flat = np.asarray(logprob_table, dtype=np.float64).reshape(-1)

    @F.pandas_udf(DoubleType())
    def _ppl(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [char_perplexity_trigram(t, flat) for t in texts.fillna("")]
        )

    return _ppl


def perplexity_udf_with_lm(logprob_table):
    """Factory: a perplexity UDF scored under a CORPUS-TRAINED bigram LM
    (the output of ``operators.textstats.train_char_bigram_lm``) instead
    of the static seed LM.  The (28×28) table is a model parameter — it
    travels to executors inside the UDF closure (a few KB), exactly the
    lazy-artifact pattern of SURVEY §7.4/S5."""
    import numpy as np

    from localmod_spark.kernel.quality import char_perplexity

    flat = np.asarray(logprob_table, dtype=np.float64).reshape(-1)

    @F.pandas_udf(DoubleType())
    def _ppl(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [char_perplexity(t, logprob_flat=flat) for t in texts.fillna("")]
        )

    return _ppl


@F.pandas_udf(StringType())
def normalize_text_udf(texts: pd.Series) -> pd.Series:
    """Vectorized canonical normalization (kernel/normalize.py) — the
    dedup-key form: NFC + control strip + space collapse + space trim.
    Null-preserving."""
    from localmod_spark.kernel.normalize import normalize_text

    return texts.map(lambda t: None if t is None else normalize_text(t))
