"""As-of join and range join: correctness vs DuckDB ASOF / brute-force."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b", "c"],
            "qts": pd.to_datetime(
                [
                    "2024-01-01 09:00:00",
                    "2024-01-01 09:05:00",
                    "2024-01-01 09:10:00",
                    "2024-01-01 09:02:00",
                    "2024-01-01 09:20:00",
                    "2024-01-01 12:00:00",
                ]
            ),
            "px": [10.0, 11.0, 12.0, 5.0, 6.0, 99.0],
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b", "d"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 08:59:00",  # before any quote -> NULL
                    "2024-01-01 09:05:00",  # exactly equal -> matches 11.0
                    "2024-01-01 09:07:30",  # between -> 11.0
                    "2024-01-01 09:01:00",  # before b's first -> NULL
                    "2024-01-01 10:00:00",  # after all -> 6.0
                    "2024-01-01 09:00:00",  # key with no quotes -> NULL
                ]
            ),
            "qty": [1, 2, 3, 4, 5, 6],
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes), trades, quotes


def test_asof_backward_matches_duckdb(spark, quotes_trades):
    trades_df, quotes_df, trades, quotes = quotes_trades
    got = (
        asof_join(
            trades_df, quotes_df, on="sym", left_ts="ts", right_ts="qts",
            value_cols=["px"],
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("trades", trades)
    con.register("quotes", quotes)
    exp = con.execute(
        """
        SELECT t.sym, t.ts, t.qty, q.px
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.sym = q.sym AND t.ts >= q.qts
        ORDER BY t.sym, t.ts
        """
    ).fetchdf()
    assert list(got["qty"]) == list(exp["qty"])
    assert [x if pd.notna(x) else None for x in got["px"]] == [
        x if pd.notna(x) else None for x in exp["px"]
    ]


def test_asof_forward(spark, quotes_trades):
    trades_df, quotes_df, _, _ = quotes_trades
    got = (
        asof_join(
            trades_df, quotes_df, on="sym", left_ts="ts", right_ts="qts",
            value_cols=["px"], direction="forward",
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    # trade at 08:59 -> next quote 09:00 px=10; trade 09:05 -> equal ts 11.0;
    # trade 10:00 (b) -> no later quote -> NULL
    by = {(r.sym, str(r.ts)): r.px for r in got.itertuples()}
    assert by[("a", "2024-01-01 08:59:00")] == 10.0
    assert by[("a", "2024-01-01 09:05:00")] == 11.0
    assert pd.isna(by[("b", "2024-01-01 10:00:00")])


def test_range_join_bucketed_equals_plain(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    n_ev, n_iv = 400, 60
    ev = pd.DataFrame(
        {
            "k": rng.randint(0, 10, n_ev),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 86400, n_ev), unit="s"),
            "eid": range(n_ev),
        }
    )
    start = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 80000, n_iv), unit="s"
    )
    iv = pd.DataFrame(
        {
            "k": rng.randint(0, 10, n_iv),
            "start": start,
            "end": start + pd.to_timedelta(rng.randint(60, 7200, n_iv), unit="s"),
            "ivid": range(n_iv),
        }
    )
    ev_df, iv_df = spark.createDataFrame(ev), spark.createDataFrame(iv)
    plain = (
        range_join(ev_df, iv_df, on="k", ts="ts", start="start", end="end")
        .select("eid", "ivid")
        .orderBy("eid", "ivid")
        .collect()
    )
    bucketed = (
        range_join(
            ev_df, iv_df, on="k", ts="ts", start="start", end="end",
            bucket_minutes=30,
        )
        .select("eid", "ivid")
        .orderBy("eid", "ivid")
        .collect()
    )
    assert plain == bucketed
    assert len(plain) > 0


def test_asof_null_payload_field_not_backfilled(spark):
    """A matched right row whose value column is NULL must yield NULL — not a
    value carried forward from an OLDER right row (ASOF returns the matched
    row verbatim; per-column fill would mix rows)."""
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "rts": pd.to_datetime(["2024-01-01 09:00", "2024-01-01 09:10"]),
                "v1": [1.0, None],
                "v2": [10.0, 20.0],
            }
        )
    )
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"], "ts": pd.to_datetime(["2024-01-01 09:15"])}
        )
    )
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["v1", "v2"]
    ).collect()[0]
    assert got["v2"] == 20.0
    assert got["v1"] is None  # matched row's NULL, not 1.0 from 09:00


def test_asof_value_col_collision_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]})
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, on="k", left_ts="ts", right_ts="ts", value_cols=["v"])
