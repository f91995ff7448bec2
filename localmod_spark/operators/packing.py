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
