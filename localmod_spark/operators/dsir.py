"""Data Selection via Importance Resampling (DSIR) — select raw-corpus
documents whose hashed-n-gram distribution matches a small TARGET corpus
(Xie et al., NeurIPS 2023, arXiv:2302.03169).  The standard scalable
"pick pretraining data that looks like Wikipedia/books" selector:

  1. featurize every document as a bag of hashed word uni+bigrams
     (feature hashing into ``buckets`` bins);
  2. fit two bag-of-words models over the buckets — ``p`` on the target
     corpus, ``q`` on the raw corpus (add-alpha smoothing);
  3. weight each raw document by its log importance ratio
     ``log w(x) = sum_k c_k(x) * (log p_k - log q_k)``;
  4. resample without replacement via Gumbel top-k: rank on
     ``log w + g`` with deterministic hash-derived Gumbel noise ``g``
     and keep the top ``k``.

Everything is JVM-side (split/transform/explode/agg — no Python in the
hot path) and every random choice is an md5-derived hash, so a SQL
oracle reproduces the exact selection and the job is
rerun/partitioning-stable like the samplers in
:mod:`localmod_spark.operators.sampling`.

Plan shape at 10^12 docs: the gram explode (~2x tokens-per-doc) feeds a
partial-aggregated (id, bucket) count; the two models are
``buckets``-row tables (BROADCAST); scoring is one broadcast join + one
grouped sum keyed by id; selection is a global rank window whose
``rk <= k`` filter Spark plans as TakeOrderedAndProject — a distributed
top-k (per-partition heap, then a k-row merge; plan-asserted), so NO
full-corpus sort ever happens.  For data-sized k, pre-prune with a
score histogram exactly like
:func:`localmod_spark.operators.sampling.select_token_budget_scalable`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from localmod_spark.operators.sampling import hash_uniform

_U32 = float(1 << 32)


def feature_bucket(col: Column, buckets: int) -> Column:
    """Feature-hash a gram string into ``[0, buckets)`` — md5-based (not
    xxhash64) so a DuckDB oracle computes the identical bucket:
    ``('0x' || substr(md5(g), 1, 8))::UBIGINT % buckets``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets


def _gram_array(text_col: str, bigrams: bool) -> Column:
    """Word uni(+bi)grams of the lowercased text, as one array column."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != "")
    if not bigrams:
        return words
    # r7: zip_with over two slices instead of an indexed transform with
    # element_at(words, …) in the lambda — a lambda-internal reference to
    # the tokenizer expression is re-inlined by project collapse and
    # re-split PER ELEMENT (O(tokens²) per doc); zip_with's inputs are
    # row-level arguments evaluated once.  Identical bigram strings
    # (slice stop<start yields [], so the 0/1-word guard is implicit).
    bis = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(words, bis)


def hashed_gram_counts(
    df: DataFrame,
    buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """Per-document hashed-gram counts → (id, bk, n).  One explode + one
    partial-aggregated group — repeats collapse map-side."""
    grams = df.select(F.col(id_col), F.explode(_gram_array(text_col, bigrams)).alias("_g"))
    return (
        grams.select(F.col(id_col), feature_bucket(F.col("_g"), buckets).alias("bk"))
        .groupBy(id_col, "bk")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _lm_from_bucket_counts(
    counts: DataFrame, buckets: int, alpha: float, logp_col: str
) -> DataFrame:
    """Add-alpha model from precomputed (bk, _c) counts — see
    :func:`hashed_lm_logprobs`."""
    spark = counts.sparkSession
    total = counts.agg(F.sum("_c").alias("_total"))  # 1 row
    return (
        spark.range(buckets)
        .select(F.col("id").alias("bk"))
        .join(counts, "bk", "left")
        .crossJoin(total)  # 1-row broadcast, same pattern as the metric joins
        .select(
            "bk",
            F.log(
                (F.coalesce(F.col("_c"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                / (F.coalesce(F.col("_total"), F.lit(0)).cast("double") + F.lit(float(alpha * buckets)))
            ).alias(logp_col),
        )
    )


def hashed_lm_logprobs(
    df: DataFrame,
    buckets: int = 512,
    alpha: float = 1.0,
    text_col: str = "text",
    bigrams: bool = True,
    logp_col: str = "logp",
) -> DataFrame:
    """Fit the add-alpha bag-of-buckets model → (bk, logp), COMPLETE over
    all ``buckets`` rows (absent buckets get the smoothed floor), so the
    scoring join never drops a document's bucket.  The model is
    ``buckets`` rows — broadcastable by construction."""
    counts = (
        df.select(F.explode(_gram_array(text_col, bigrams)).alias("_g"))
        .select(feature_bucket(F.col("_g"), buckets).alias("bk"))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    return _lm_from_bucket_counts(counts, buckets, alpha, logp_col)


def dsir_logweights(
    df: DataFrame,
    target_df: DataFrame,
    buckets: int = 512,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """Append ``dsir_logw`` — the log importance ratio of each document
    under target vs raw hashed-gram models.  A document with NO grams
    (blank text) scores 0 (empty product = weight 1), via the left join's
    coalesce.

    The raw-corpus explode (the dominant stage) runs ONCE: the per-doc
    bucket counts are persisted and the raw model's bucket totals are a
    re-aggregation of them — not a second scan — mirroring how the SQL
    oracle derives ``raw_c`` from the shared gram CTE.  The persisted
    block registers in the shared cache registry like every staged
    sketch."""
    from pyspark.storagelevel import StorageLevel

    from localmod_spark.cache_registry import register_stage_cache

    doc_counts = register_stage_cache(
        hashed_gram_counts(
            df, buckets=buckets, id_col=id_col, text_col=text_col, bigrams=bigrams
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    raw_counts = doc_counts.groupBy("bk").agg(F.sum("n").cast("long").alias("_c"))
    raw_lm = _lm_from_bucket_counts(raw_counts, buckets, alpha, "_logq")
    tgt_lm = hashed_lm_logprobs(
        target_df, buckets=buckets, alpha=alpha, text_col=text_col, bigrams=bigrams, logp_col="_logp"
    )
    model = tgt_lm.join(raw_lm, "bk").select(
        "bk", (F.col("_logp") - F.col("_logq")).alias("_dlog")
    )
    logw = (
        doc_counts.join(F.broadcast(model), "bk")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("_dlog")).alias("dsir_logw"))
    )
    return df.join(logw, id_col, "left").withColumn(
        "dsir_logw", F.coalesce(F.col("dsir_logw"), F.lit(0.0))
    )


def gumbel_noise(id_col: Column, seed: int = 0) -> Column:
    """Deterministic Gumbel(0,1) draw keyed on (id, seed): the md5
    uniform shifted by half an ulp-of-2^-32 so u is never exactly 0,
    then ``-ln(-ln(u))``.  Hash-keyed like every sampler here — the
    perturbation is rerun/partitioning-stable and seed-swappable."""
    u = hash_uniform(F.concat(id_col.cast("string"), F.lit(f"#{int(seed)}"))) + F.lit(
        0.5 / _U32
    )
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    seed: int = 0,
    buckets: int = 512,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = True,
) -> DataFrame:
    """Gumbel top-k importance resampling: the ``k`` raw documents with
    the largest ``dsir_logw + gumbel`` (without replacement — the paper's
    resampling scheme).  Appends ``dsir_logw`` and the selection rank
    ``dsir_rk`` (1-based).

    The rank key is ROUNDED to 6 decimals with the id as tiebreak, so
    the selected set is engine-exact (a SQL oracle reproduces it
    bit-for-bit) and immune to float summation-order jitter."""
    from pyspark.sql import Window

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    scored = dsir_logweights(
        df, target_df, buckets=buckets, alpha=alpha,
        id_col=id_col, text_col=text_col, bigrams=bigrams,
    )
    key = F.round(F.col("dsir_logw") + gumbel_noise(F.col(id_col), seed), 6)
    w = Window.orderBy(key.desc(), F.col(id_col).asc())
    return (
        scored.withColumn("dsir_rk", F.row_number().over(w))
        .where(F.col("dsir_rk") <= k)
    )


def dsir_oracle_sql(
    k: int,
    seed: int = 0,
    buckets: int = 512,
    alpha: float = 1.0,
    target_pred: str = "lang = 'en'",
    table: str = "documents",
) -> str:
    """The DuckDB replay of :func:`dsir_select` over ``table`` with the
    target set defined by ``target_pred`` — same md5 feature hash, same
    smoothing, same hash-Gumbel, same rounded rank key."""
    a = float(alpha)
    ab = float(alpha * buckets)
    return f"""
        WITH ws AS (
            SELECT doc_id, lang,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x <> '') AS w
            FROM {table}
        ),
        grams AS (
            SELECT doc_id, lang,
                   unnest(w || [w[i] || ' ' || w[i+1]
                               FOR i IN generate_series(1, len(w) - 1)]) AS g
            FROM ws
        ),
        bk AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(g), 1, 8))::UBIGINT % {buckets} AS bk
            FROM grams
        ),
        doc_counts AS (
            SELECT doc_id, bk, count(*) AS n FROM bk GROUP BY doc_id, bk
        ),
        raw_c AS (SELECT bk, count(*) AS c FROM bk GROUP BY bk),
        tgt_c AS (SELECT bk, count(*) AS c FROM bk WHERE {target_pred} GROUP BY bk),
        raw_t AS (SELECT coalesce(sum(c), 0) AS t FROM raw_c),
        tgt_t AS (SELECT coalesce(sum(c), 0) AS t FROM tgt_c),
        model AS (
            SELECT i.range AS bk,
                   ln((coalesce(tc.c, 0) + {a}) / (tgt_t.t + {ab}))
                 - ln((coalesce(rc.c, 0) + {a}) / (raw_t.t + {ab})) AS dlog
            FROM range({buckets}) i
            LEFT JOIN tgt_c tc ON tc.bk = i.range
            LEFT JOIN raw_c rc ON rc.bk = i.range
            CROSS JOIN raw_t CROSS JOIN tgt_t
        ),
        logw AS (
            SELECT d.doc_id, sum(d.n * m.dlog) AS lw
            FROM doc_counts d JOIN model m USING (bk)
            GROUP BY d.doc_id
        ),
        scored AS (
            SELECT t.doc_id, t.lang, coalesce(l.lw, 0.0) AS lw,
                   -ln(-ln((('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || '#{int(seed)}'), 1, 8))::UBIGINT
                            + 0.5) / 4294967296.0)) AS g
            FROM {table} t LEFT JOIN logw l USING (doc_id)
        ),
        ranked AS (
            SELECT doc_id, lang, lw,
                   row_number() OVER (ORDER BY round(lw + g, 6) DESC, doc_id ASC) AS rk
            FROM scored
        )
        SELECT doc_id, lang, round(lw, 4) AS dsir_logw, CAST(rk AS BIGINT) AS dsir_rk
        FROM ranked WHERE rk <= {int(k)}
    """
