"""As-of join, binned range join, greedy sequence packing."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.asof import as_of_join, interval_join
from localmod_spark.operators.packing import pack_greedy


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Differential vs pandas merge_asof (backward, inclusive) on a
    seeded random series — per key, exact equality."""
    import random

    rng = random.Random(13)
    left_rows = [(f"k{rng.randrange(4)}", _ts(rng.randrange(500)), i) for i in range(120)]
    right_rows = [(f"k{rng.randrange(4)}", _ts(rng.randrange(500)), 1000 + i) for i in range(80)]
    # dedupe right ties per (key, ts): keep max payload (the documented contract)
    best = {}
    for k, t, p in right_rows:
        best[(k, t)] = max(best.get((k, t), -1), p)
    right_rows = [(k, t, p) for (k, t), p in best.items()]

    left = spark.createDataFrame(left_rows, "key string, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "key string, ts timestamp, payload long")
    got = {
        r.lid: r.asof_payload
        for r in as_of_join(left, right, ["key"], right_cols=["payload"]).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["key", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["key", "ts", "payload"]).sort_values("ts")
    want = pd.merge_asof(lp, rp, on="ts", by="key", direction="backward")
    for _, row in want.iterrows():
        w = None if pd.isna(row.payload) else int(row.payload)
        assert got[row.lid] == w, row.lid


def test_as_of_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([("a", _ts(10), 1)], "key string, ts timestamp, lid long")
    right = spark.createDataFrame([("a", _ts(10), 99)], "key string, ts timestamp, payload long")
    row = as_of_join(left, right, ["key"], right_cols=["payload"]).collect()[0]
    assert row.asof_payload == 99  # ts == ts counts (backward inclusive)


def test_as_of_join_plan_has_no_join_node(spark):
    """The union-and-window merge must compile to window + exchange, never
    a join — that's the 100 TB argument (no hash build side to skew)."""
    left = spark.createDataFrame([("a", _ts(1), 1)], "key string, ts timestamp, lid long")
    right = spark.createDataFrame([("a", _ts(0), 9)], "key string, ts timestamp, payload long")
    plan = as_of_join(left, right, ["key"], right_cols=["payload"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_interval_join_matches_bruteforce(spark):
    """Binned equi-join + residual == naive cross filter, including
    intervals spanning many bins and events on exact boundaries."""
    iv_rows = [
        ("u1", _ts(0), _ts(60)),
        ("u1", _ts(30), _ts(300)),  # overlapping + multi-bin
        ("u2", _ts(10), _ts(10)),   # zero-length
    ]
    ev_rows = [("u1", _ts(m), m) for m in (0, 30, 60, 61, 299, 301)] + [
        ("u2", _ts(10), 999),
        ("u2", _ts(11), 998),
    ]
    intervals = spark.createDataFrame(iv_rows, "user string, start timestamp, end timestamp")
    events = spark.createDataFrame(ev_rows, "user string, ts timestamp, eid long")
    got = {
        (r.eid, r.start) for r in interval_join(events, intervals, ["user"], bin_seconds=600).collect()
    }
    want = {
        (eid, s)
        for (u, t, eid) in ev_rows
        for (iu, s, e) in iv_rows
        if u == iu and s <= t <= e
    }
    assert got == want and want


def test_pack_greedy_rule(spark):
    rows = [
        ("en", 0, 200), ("en", 1, 300),  # 500 ≤ 512 → pack 0
        ("en", 2, 100),                  # 600 > 512 → pack 1
        ("en", 3, 600),                  # oversized → own pack 2
        ("en", 4, 1),                    # 601 > 512 → pack 3
        ("de", 10, 512),                 # exact fit → pack 0
        ("de", 11, 1),                   # → pack 1
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    got = {r.doc_id: (r.pack_id, r.pack_fill) for r in pack_greedy(df, budget=512).collect()}
    assert got == {
        0: (0, 200), 1: (0, 500), 2: (1, 100), 3: (2, 600), 4: (3, 1),
        10: (0, 512), 11: (1, 1),
    }


def test_pack_greedy_deterministic_under_partitioning(spark):
    rows = [("en", i, 50 + (i * 37) % 200) for i in range(200)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    a = {r.doc_id: r.pack_id for r in pack_greedy(df, budget=512).collect()}
    b = {r.doc_id: r.pack_id for r in pack_greedy(df.repartition(16), budget=512).collect()}
    assert a == b
    # every pack except possibly the last respects the budget
    fills = {}
    for r in pack_greedy(df, budget=512).collect():
        fills[r.pack_id] = max(fills.get(r.pack_id, 0), r.pack_fill)
    assert all(f <= 512 for p, f in fills.items() if p < max(fills)), fills


def test_rolling_and_asof_queries_run(spark):
    import __spark_entry__ as em

    q = em.queries()
    for name in ("asof_click", "interval_join", "turn_windows", "greedy_pack"):
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name


def _chunk_ref(docs, L, eos="<eos>"):
    """Pure-python concat-and-chunk reference: docs = [(doc_id, tokens)]."""
    stream = []
    for _, toks in sorted(docs):
        stream += list(toks) + [eos]
    return [stream[i : i + L] for i in range(0, len(stream), L)]


def test_chunk_fixed_matches_python_reference(spark):
    from localmod_spark.operators.packing import chunk_fixed

    import random

    rnd = random.Random(9)
    groups = {}
    rows = []
    for g in ("g1", "g2", "g3"):
        docs = []
        for d in range(rnd.randint(1, 12)):
            toks = [f"{g}t{d}_{j}" for j in range(rnd.randint(0, 23))]
            docs.append((d, toks))
            rows.append((g, d, toks))
        groups[g] = docs
    df = spark.createDataFrame(rows, "grp string, doc_id long, tokens array<string>")
    got = {}
    for r in chunk_fixed(df, seq_len=7).collect():
        got.setdefault(r.grp, {})[r.chunk_id] = list(r.tokens)
    for g, docs in groups.items():
        want = _chunk_ref(docs, 7)
        assert [got[g][c] for c in sorted(got[g])] == want, g
        # every chunk but the last is exactly full
        sizes = [len(got[g][c]) for c in sorted(got[g])]
        assert all(s == 7 for s in sizes[:-1]) and 1 <= sizes[-1] <= 7


def test_chunk_fixed_long_doc_spans_many_chunks_and_partition_invariant(spark):
    from localmod_spark.operators.packing import chunk_fixed

    rows = [("g", 0, [f"w{j}" for j in range(57)]), ("g", 1, ["a", "b"])]
    df = spark.createDataFrame(rows, "grp string, doc_id long, tokens array<string>")
    base = {
        (r.grp, r.chunk_id): (r.n_tokens, tuple(r.tokens))
        for r in chunk_fixed(df, seq_len=8).collect()
    }
    want = _chunk_ref([(0, rows[0][2]), (1, ["a", "b"])], 8)
    assert [list(base[("g", c)][1]) for c in range(len(want))] == want
    # same chunks regardless of how the input is split across tasks
    for parts in (1, 7):
        again = {
            (r.grp, r.chunk_id): (r.n_tokens, tuple(r.tokens))
            for r in chunk_fixed(df.repartition(parts), seq_len=8).collect()
        }
        assert again == base


def test_chunk_fixed_empty_doc_contributes_separator_only(spark):
    from localmod_spark.operators.packing import chunk_fixed

    rows = [("g", 0, []), ("g", 1, ["x"])]
    df = spark.createDataFrame(rows, "grp string, doc_id long, tokens array<string>")
    out = chunk_fixed(df, seq_len=4).collect()
    assert len(out) == 1 and list(out[0].tokens) == ["<eos>", "x", "<eos>"]
    # a NULL token array reads as empty too — it must NOT silently drop
    # the row (F.concat(NULL, …) would) but contribute its separator
    nul = spark.createDataFrame(
        [("g", 0, None), ("g", 1, ["x"])], "grp string, doc_id long, tokens array<string>"
    )
    out = chunk_fixed(nul, seq_len=4).collect()
    assert len(out) == 1 and list(out[0].tokens) == ["<eos>", "x", "<eos>"]
    with pytest.raises(ValueError):
        chunk_fixed(df, seq_len=0)


def test_chunk_fixed_doc_starts_boundaries(spark):
    """doc_starts = in-chunk positions where a NEW document begins —
    continuations across chunk boundaries are not starts; checked against
    a pure-python walk of the same stream."""
    from localmod_spark.operators.packing import chunk_fixed

    docs = [(0, ["a", "b", "c"]), (1, ["d"]), (2, [f"e{j}" for j in range(9)]), (3, [])]
    rows = [("g", i, t) for i, t in docs]
    df = spark.createDataFrame(rows, "grp string, doc_id long, tokens array<string>")
    L = 4
    got = {
        r.chunk_id: (list(r.tokens), list(r.doc_starts))
        for r in chunk_fixed(df, seq_len=L).collect()
    }
    # python reference: walk the stream, record each doc's global start
    stream, starts = [], []
    for _, t in sorted(docs):
        starts.append(len(stream))
        stream += list(t) + ["<eos>"]
    want = {}
    for c in range((len(stream) + L - 1) // L):
        want[c] = (
            stream[c * L : (c + 1) * L],
            sorted(s - c * L for s in starts if c * L <= s < (c + 1) * L),
        )
    assert got == want
    # sanity on the interesting shapes: chunk 1 starts mid-doc-0? doc 1
    # begins at global 4 (chunk 1 pos 0); the long doc 2 spans chunks and
    # only its FIRST chunk carries a boundary
    assert 0 in got[1][1]
    spans = [c for c, (toks, _) in got.items() if any(t.startswith("e") for t in toks)]
    assert len(spans) > 1
    assert sum(1 for c in spans if got[c][1] and c != min(spans)) <= 1  # no mid-doc starts except doc 3's
