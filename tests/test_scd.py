"""scd2_merge + state_history edge cases the fixture query can't reach:
unchanged attributes (no-op), brand-new keys (insert), closed history
passing through untouched, multi-attr change detection with nulls, and
state-run collapsing incl. single-run and all-distinct streams."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from graphragdatapipeline_spark.operators.relational import scd2_merge, state_history

TS = TimestampType()
CUR_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seg", StringType()),
        StructField("tier", StringType()),
        StructField("valid_from", TS),
        StructField("valid_to", TS),
    ]
)
UPD_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seg", StringType()),
        StructField("tier", StringType()),
        StructField("eff", TS),
    ]
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_merge_branches(spark):
    current = spark.createDataFrame(
        [
            # k=1: open row that WILL change
            (1, "A", "gold", _ts("2020-01-01"), None),
            # k=1 also has closed history — must pass through untouched
            (1, "Z", "bronze", _ts("2010-01-01"), _ts("2020-01-01")),
            # k=2: open row, update has IDENTICAL attrs → no-op
            (2, "B", "silver", _ts("2020-01-01"), None),
            # k=3: open row, no update at all → no-op
            (3, "C", None, _ts("2020-01-01"), None),
        ],
        CUR_SCHEMA,
    )
    updates = spark.createDataFrame(
        [
            (1, "A2", "gold", _ts("2024-06-01")),
            (2, "B", "silver", _ts("2024-06-01")),
            # k=4: brand-new key → insert
            (4, "D", None, _ts("2024-06-01")),
        ],
        UPD_SCHEMA,
    )
    out = scd2_merge(current, updates, "k", ["seg", "tier"], "eff")
    assert _rows(out) == {
        (1, "Z", "bronze", _ts("2010-01-01"), _ts("2020-01-01")),  # closed kept
        (1, "A", "gold", _ts("2020-01-01"), _ts("2024-06-01")),  # closed out
        (1, "A2", "gold", _ts("2024-06-01"), None),  # new version
        (2, "B", "silver", _ts("2020-01-01"), None),  # identical → untouched
        (3, "C", None, _ts("2020-01-01"), None),  # no update → untouched
        (4, "D", None, _ts("2024-06-01"), None),  # new key → inserted
    }


def test_scd2_merge_null_attr_transitions(spark):
    """eqNullSafe change detection: null→value and value→null are
    changes; null→null is not."""
    current = spark.createDataFrame(
        [
            (1, None, "t", _ts("2020-01-01"), None),  # null → value: change
            (2, "x", "t", _ts("2020-01-01"), None),  # value → null: change
            (3, None, "t", _ts("2020-01-01"), None),  # null → null: no-op
        ],
        CUR_SCHEMA,
    )
    updates = spark.createDataFrame(
        [
            (1, "now-set", "t", _ts("2024-01-01")),
            (2, None, "t", _ts("2024-01-01")),
            (3, None, "t", _ts("2024-01-01")),
        ],
        UPD_SCHEMA,
    )
    out = scd2_merge(current, updates, "k", ["seg", "tier"], "eff")
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 2 and len(by_key[2]) == 2
    assert len(by_key[3]) == 1 and by_key[3][0]["valid_to"] is None


def test_state_history_collapses_runs(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "a", 1),
            (1, _ts("2024-01-01 01:00:00"), "a", 2),
            (1, _ts("2024-01-01 02:00:00"), "b", 3),
            (1, _ts("2024-01-01 03:00:00"), "a", 4),
            # user 2: single run of one state
            (2, _ts("2024-01-01 00:00:00"), "x", 5),
            (2, _ts("2024-01-01 05:00:00"), "x", 6),
        ],
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("ts", TS),
                StructField("event_type", StringType()),
                StructField("event_id", LongType()),
            ]
        ),
    )
    hist = state_history(ev, "user_id", "ts", "event_type", ["event_id"])
    got = {
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in hist.collect()
    }
    assert got == {
        (1, "a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"), 2),
        (1, "b", _ts("2024-01-01 02:00:00"), _ts("2024-01-01 03:00:00"), 1),
        (1, "a", _ts("2024-01-01 03:00:00"), None, 1),  # re-entry = new run
        (2, "x", _ts("2024-01-01 00:00:00"), None, 2),
    }


def test_state_history_one_shuffle(spark, sf_dir):
    """The whole history plan must contain exactly ONE exchange — the
    windows and the aggregation all reuse the key partitioning."""
    from graphragdatapipeline_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    hist = state_history(ev, "user_id", "ts", "event_type", ["event_id"])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_scd2_merge_duplicate_update_keys_keep_latest(spark):
    """Duplicate update rows for one key must NOT fan out into multiple
    open versions: the merge keeps only the latest-effective update."""
    current = spark.createDataFrame(
        [(1, "A", "gold", _ts("2020-01-01"), None)], CUR_SCHEMA
    )
    updates = spark.createDataFrame(
        [
            (1, "B", "gold", _ts("2021-01-01")),
            (1, "C", "gold", _ts("2022-01-01")),  # latest wins
        ],
        UPD_SCHEMA,
    )
    out = scd2_merge(current, updates, "k", ["seg", "tier"], "eff")
    open_versions = [r for r in out.collect() if r["valid_to"] is None]
    assert len(open_versions) == 1
    assert open_versions[0]["seg"] == "C"
    assert out.count() == 2  # closed-out old version + one new open version


def test_scd2_merge_equal_eff_duplicates_deterministic(spark):
    """Two updates for the same key with IDENTICAL eff timestamps must
    resolve reproducibly (attr-value tiebreak, ADVICE r6) — repeated
    runs over differently-partitioned input pick the same winner."""
    import datetime as dt

    cur = spark.createDataFrame(
        [("k1", "old", dt.datetime(2020, 1, 1), None)],
        "id STRING, val STRING, valid_from TIMESTAMP, valid_to TIMESTAMP",
    )
    eff = dt.datetime(2021, 6, 1)
    upd_rows = [("k1", "zebra", eff), ("k1", "apple", eff)]
    outs = []
    for order in (upd_rows, upd_rows[::-1]):
        upd = spark.createDataFrame(
            order, "id STRING, val STRING, eff TIMESTAMP"
        ).repartition(4)
        out = scd2_merge(cur, upd, "id", ["val"], "eff")
        open_row = [r for r in out.collect() if r.valid_to is None]
        assert len(open_row) == 1
        outs.append(open_row[0].val)
    # desc attr ordering → 'zebra' wins regardless of input order
    assert outs == ["zebra", "zebra"]
