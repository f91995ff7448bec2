"""Greedy sequence packing: fill fixed-token-budget training windows.

LLM training consumes fixed-length context windows; feeding one short
document per window wastes most of the tokens.  ``pack_greedy`` assigns
documents to packs by the standard greedy rule — walk the group in a
deterministic order, start a new pack whenever adding the next document
would exceed the budget (a document longer than the budget gets a pack
of its own).

Distribution model: packing is inherently SEQUENTIAL within a group (the
pack id of doc N depends on all docs before it), so the group is the
parallelism unit — grouped ``applyInPandas``, one shuffle on the group
key, linear scan per group in pandas.  At 10^12 docs choose group keys
that bound group size (lang × date-bucket, not lang alone); the greedy
result is deterministic per group regardless of how groups are
scheduled.  The rule is engine-independent, so a DuckDB recursive CTE
reproduces the exact pack assignment (the driver's oracle for the
``greedy_pack`` query).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """→ (group_col, order_col, token_col, pack_id, pack_fill): pack_id is
    0-based per group; pack_fill is the pack's running token count after
    this document (the last row of a pack carries its final size)."""
    fields = [
        df.schema[group_col],
        df.schema[order_col],
        df.schema[token_col],
        StructField("pack_id", LongType(), False),
        StructField("pack_fill", LongType(), False),
    ]
    out_schema = StructType(fields)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        toks = pdf[token_col].to_numpy()
        pack_ids, fills = [], []
        pack, fill = 0, 0
        for t in toks:
            t = int(t)
            if fill > 0 and fill + t > budget:
                pack += 1
                fill = 0
            fill += t
            pack_ids.append(pack)
            fills.append(fill)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                order_col: pdf[order_col].to_numpy(),
                token_col: toks,
                "pack_id": pack_ids,
                "pack_fill": fills,
            }
        )

    slim = df.select(group_col, order_col, token_col)
    return slim.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def chunk_fixed(
    df: DataFrame,
    seq_len: int,
    group_col: str = "grp",
    order_col: str = "doc_id",
    tokens_col: str = "tokens",
    eos: str = "<eos>",
) -> DataFrame:
    """Concat-and-chunk packing (the GPT-style alternative to
    :func:`pack_greedy`): within each group, concatenate every document's
    token array + one ``eos`` separator in ``order_col`` order, then cut
    the stream into consecutive ``seq_len``-token windows.  No padding
    waste, documents straddle chunk boundaries; the final partial chunk
    is emitted with its true length (callers drop or pad it).

    → (group_col, chunk_id: long, n_tokens: long, tokens: array,
    doc_starts: array<int>) — ``doc_starts`` lists the in-chunk positions
    where a NEW document begins (continuations spilling over from the
    previous chunk are not starts): the boundary metadata trainers use
    to reset attention / mask loss across packed documents.

    Scale shape: the stream offset is ONE bounded window per group (the
    group key must bound group size, exactly :func:`pack_greedy`'s rule —
    lang × block, shard id, …), and the explode is per (document ×
    spanned chunk) — ~n_tokens/seq_len rows per doc, never per token.
    Chunk assembly is a single aggregation keyed on (group, chunk);
    segment order inside the chunk is restored INSIDE the aggregate
    (struct collect → array_sort → flatten), so it survives partial
    aggregation regardless of task scheduling."""
    from pyspark.sql import Window

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    L = F.lit(int(seq_len))
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        df.select(
            group_col,
            order_col,
            # a NULL token array reads as an empty document (separator
            # only) — F.concat(NULL, …) is NULL and would silently DROP
            # the row from the stream otherwise
            F.when(F.col(tokens_col).isNull(), F.array(F.lit(eos)))
            .otherwise(F.concat(F.col(tokens_col), F.array(F.lit(eos))))
            .alias("_toks"),
        )
        .withColumn("_n", F.size("_toks").cast("long"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long"))
    )
    # chunks this doc's stream slice [off, off+n) touches
    c0 = F.floor(F.col("_off") / L).cast("long")
    c1 = F.floor((F.col("_off") + F.col("_n") - 1) / L).cast("long")
    segs = d.select(
        group_col,
        "_toks",
        "_n",
        "_off",
        F.explode(F.sequence(c0, c1)).alias("chunk_id"),
    )
    s_in = F.greatest(F.col("chunk_id") * L - F.col("_off"), F.lit(0))
    e_glob = F.least((F.col("chunk_id") + 1) * L, F.col("_off") + F.col("_n"))
    seg_len = e_glob - (F.col("_off") + s_in)
    segs = segs.select(
        group_col,
        "chunk_id",
        "_off",
        F.slice(F.col("_toks"), (s_in + 1).cast("int"), seg_len.cast("int")).alias("_seg"),
        # a segment with s_in == 0 BEGINS its document: its in-chunk
        # position is a doc boundary (continuations from the previous
        # chunk are not) — trainers mask attention/loss across these
        F.when(s_in == F.lit(0), (F.col("_off") - F.col("chunk_id") * L).cast("int"))
        .alias("_bpos"),
    )
    assembled = (
        segs.groupBy(group_col, "chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_off"), F.col("_seg")))),
                    lambda s: s["_seg"],
                )
            ).alias("tokens"),
            # collect_list drops the NULL continuations
            F.array_sort(F.collect_list("_bpos")).alias("doc_starts"),
        )
        .select(
            group_col,
            "chunk_id",
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
            "doc_starts",
        )
    )
    return assembled
