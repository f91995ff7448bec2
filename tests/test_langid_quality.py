"""Language-ID and quality-scoring kernels (north-rule additions)."""

import pytest

from localmod_spark.kernel.langid import detect_language
from localmod_spark.kernel.quality import (
    char_perplexity,
    quality_flagged,
    quality_score,
    quality_stats,
)


def test_script_detection():
    assert detect_language("这是一个中文句子，有足够的字符。")[0] == "zh"
    assert detect_language("Это русское предложение для теста.")[0] == "ru"
    assert detect_language("هذه جملة عربية للاختبار والتقييم")[0] == "ar"
    assert detect_language("これは日本語の文です。")[0] == "ja"
    assert detect_language("한국어 문장입니다 테스트")[0] == "ko"


def test_latin_profiles():
    assert detect_language("the cat sat on the mat and it was happy there")[0] == "en"
    assert detect_language("el perro corre por la calle y no se detiene porque está feliz")[0] == "es"
    assert detect_language("der Hund läuft über die Straße und die Kinder spielen im Park")[0] == "de"
    assert detect_language("le chien court dans la rue et les enfants jouent dans le parc")[0] == "fr"


def test_unknown_cases():
    assert detect_language("")[0] == "und"
    assert detect_language("12345 67890 %%%")[0] == "und"


def test_confidence_bounds():
    for t in ["the the the", "xyzzy plugh", "这是中文"]:
        lang, conf = detect_language(t)
        assert 0.0 <= conf <= 1.0


def test_perplexity_orders_text_quality():
    prose = char_perplexity("the quick brown fox jumps over the lazy dog")
    gibberish = char_perplexity("zqxj wvkq zzzz qqqq xjxj kvkv")
    assert prose < gibberish
    assert char_perplexity("") == 0.0
    assert char_perplexity("a") == 0.0


def test_quality_stats_counts():
    s = quality_stats("hello world hello world")
    assert s.n_tokens == 4
    assert s.top_token_frac == 0.5
    assert s.dup_bigram_frac > 0.0  # "hello world" bigram repeats


def test_quality_conservative_on_fixtures():
    # ordinary fixture prose must not trip the quality flag
    for t in [
        "Hello, how are you today?",
        "The weather is nice outside.",
        "Hello world. " * 1000,
        "",
    ]:
        assert not quality_flagged(quality_stats(t)), t


def test_quality_flags_degenerate():
    assert quality_flagged(quality_stats("a" * 500))  # one 500-char word
    assert quality_flagged(
        quality_stats("zzqqxxjj " * 30)  # high perplexity, many tokens
    )


def test_quality_score_bounds():
    for t in ["nice text here", "zzz qqq xxx", "", "a" * 100]:
        assert 0.0 <= quality_score(quality_stats(t)) <= 1.0


def test_train_char_bigram_lm_matches_seed_table(spark):
    """Training on exactly the seed corpus must reproduce the static
    import-time table bit-for-bit (same counts → same smoothing/log)."""
    import numpy as np

    from localmod_spark.kernel.quality import _LOGPROB, _SEED_CORPUS
    from localmod_spark.operators.textstats import train_char_bigram_lm

    df = spark.createDataFrame([(0, _SEED_CORPUS)], "doc_id long, text string")
    trained = train_char_bigram_lm(df)
    assert np.array_equal(trained, _LOGPROB)


def test_trained_lm_scores_its_own_domain_lower(spark):
    """An LM trained on a digit-heavy corpus should assign digit-heavy
    text lower perplexity than the English seed LM does — and vice versa."""
    from localmod_spark.kernel.quality import char_perplexity
    from localmod_spark.operators.textstats import train_char_bigram_lm

    digit_rows = [(i, "404 500 301 2024 12 31 99 1000 42 7 365 86400 " * 3) for i in range(40)]
    df = spark.createDataFrame(digit_rows, "doc_id long, text string")
    digit_lm = train_char_bigram_lm(df).reshape(-1)
    probe = "2024 12 31 86400 99"
    assert char_perplexity(probe, logprob_flat=digit_lm) < char_perplexity(probe)
    english = "the quick brown fox jumps over the lazy dog"
    assert char_perplexity(english) < char_perplexity(english, logprob_flat=digit_lm)


def test_perplexity_udf_with_trained_lm_through_spark(spark):
    """Train on the corpus, ship the table in a UDF closure, and assert
    the Spark-side values equal the kernel's under the same table."""
    from localmod_spark.functions.text import perplexity_udf_with_lm
    from localmod_spark.kernel.quality import char_perplexity
    from localmod_spark.operators.textstats import train_char_bigram_lm

    rows = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "zzzz qqqq xxxx 9999 @@@@",
        "a plain sentence about markets and weather",
    ] * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    table = train_char_bigram_lm(df)
    udf = perplexity_udf_with_lm(table)
    from pyspark.sql import functions as F
    got = {r.doc_id: r.p for r in df.withColumn("p", udf(F.col("text"))).collect()}
    flat = table.reshape(-1)
    for i, t in rows:
        assert got[i] == pytest.approx(char_perplexity(t, logprob_flat=flat), abs=1e-12)


# ---------------------------------------------------------- KN trigram ----


def test_kn_table_rows_are_distributions():
    """Every context's probabilities must sum to exactly 1 — the KN
    interpolation is a proper distribution, observed context or not."""
    import numpy as np

    from localmod_spark.kernel.quality import _SEED_CORPUS, kn_logprob_table, trigram_counts

    table = kn_logprob_table(trigram_counts(_SEED_CORPUS))
    sums = np.exp(table).sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-9)
    assert np.isfinite(table).all()  # nothing is ever zero-probability


def test_kn_trigram_separates_english_from_noise():
    import random

    from localmod_spark.kernel.quality import (
        _SEED_CORPUS,
        char_perplexity_trigram,
        kn_logprob_table,
        trigram_counts,
    )

    flat = kn_logprob_table(trigram_counts(_SEED_CORPUS)).reshape(-1)
    english = "the morning train was late but the meeting still went well"
    rng = random.Random(3)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(len(english)))
    p_en = char_perplexity_trigram(english, flat)
    p_noise = char_perplexity_trigram(noise, flat)
    assert 0 < p_en < p_noise
    # trigram context beats bigram on in-domain text
    from localmod_spark.kernel.quality import char_perplexity

    assert p_en < char_perplexity(english)


def test_kn_trigram_short_text_and_determinism():
    from localmod_spark.kernel.quality import (
        _SEED_CORPUS,
        char_perplexity_trigram,
        kn_logprob_table,
        trigram_counts,
    )

    flat = kn_logprob_table(trigram_counts(_SEED_CORPUS)).reshape(-1)
    assert char_perplexity_trigram("ab", flat) == 0.0
    a = char_perplexity_trigram("hello world", flat)
    b = char_perplexity_trigram("hello world", flat)
    assert a == b > 0


def test_distributed_kn_train_equals_local(spark):
    """Counts are additive: the Spark-trained table must equal a local
    train on the same texts bit for bit, at any partitioning."""
    import numpy as np

    from localmod_spark.kernel.quality import kn_logprob_table, trigram_counts
    from localmod_spark.operators.textstats import train_char_kn_trigram_lm

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "practice improves almost every skill from cooking to coding",
        "questions deserve clear answers",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").repartition(3)
    spark_table = train_char_kn_trigram_lm(df)
    local = np.zeros((28, 28, 28))
    for t in texts:
        local += trigram_counts(t)
    np.testing.assert_array_equal(spark_table, kn_logprob_table(local))


def test_kn_trigram_udf_matches_kernel(spark):
    import pyspark.sql.functions as F

    from localmod_spark.functions.text import perplexity_udf_with_kn_trigram
    from localmod_spark.kernel.quality import (
        _SEED_CORPUS,
        char_perplexity_trigram,
        kn_logprob_table,
        trigram_counts,
    )

    table = kn_logprob_table(trigram_counts(_SEED_CORPUS))
    texts = ["the cat sat on the mat", "zzzz qqqq", "", "ok"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.p
        for r in df.withColumn("p", perplexity_udf_with_kn_trigram(table)(F.col("text"))).collect()
    }
    flat = table.reshape(-1)
    for i, t in enumerate(texts):
        assert got[i] == char_perplexity_trigram(t, flat)


def test_lm_trainer_driver_reduce_is_bounded(spark):
    """The distributed second-level reduce bounds what reaches the driver
    at prod(shape) rows REGARDLESS of partition/batch count — the round-3
    design flaw was one 170 KB count row per Arrow batch funneled to the
    driver.  Feed a many-partition input and count the reduce's rows."""
    from localmod_spark.kernel.quality import _N_SYMBOLS, bigram_counts, trigram_counts
    from localmod_spark.operators.textstats import _ngram_count_rows

    texts = [(f"document number {i} with some english words",) for i in range(200)]
    docs = spark.createDataFrame(texts, "text string").repartition(16)
    bi = _ngram_count_rows(docs, "text", bigram_counts, (_N_SYMBOLS, _N_SYMBOLS))
    assert bi.count() <= _N_SYMBOLS**2
    tri = _ngram_count_rows(
        docs, "text", trigram_counts, (_N_SYMBOLS, _N_SYMBOLS, _N_SYMBOLS)
    )
    assert tri.count() <= _N_SYMBOLS**3


def test_ccnet_buckets_terciles_and_monotonicity(spark):
    """Per-group bands are near-equal thirds, ordered head <= middle <=
    tail in perplexity, and the threshold table reaches the bucket join
    as a broadcast (no shuffle on the data side)."""
    from pyspark.sql import functions as F

    from localmod_spark.operators.textstats import ccnet_buckets

    df = spark.createDataFrame(
        [(i, float((i * 7) % 31), "en" if i % 2 else "fr") for i in range(90)],
        "doc_id long, perplexity double, lang string",
    )
    out = ccnet_buckets(df)
    rows = out.collect()
    assert len(rows) == 90
    for lang in ("en", "fr"):
        by = {b: [r["perplexity"] for r in rows if r["lang"] == lang and r["ccnet_bucket"] == b]
              for b in ("head", "middle", "tail")}
        assert all(14 <= len(v) <= 16 for v in by.values()), {k: len(v) for k, v in by.items()}
        assert max(by["head"]) <= min(by["middle"])
        assert max(by["middle"]) <= min(by["tail"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the scale path (t-digest approx thresholds) agrees on comfortable data
    approx = ccnet_buckets(df, exact=False)
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, rows))
