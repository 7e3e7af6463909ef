"""As-of join semantics (union-and-sweep plan, operators/asof.py)."""

import datetime as dt

import pyspark.sql.functions as F

from kgx_spark.operators.asof import asof_join


def test_asof_join_basic(spark):
    t = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), 100), (1, t(30), 101), (2, t(5), 102)],
        "user_id long, ts timestamp, order_id long",
    )
    right = spark.createDataFrame(
        [(1, t(8), 900), (1, t(10), 901), (1, t(29), 902), (2, t(6), 903)],
        "user_id long, ts timestamp, quote_id long",
    )
    out = {r["order_id"]: r["quote_id_right"] for r in
           asof_join(left, right, key="user_id", ts="ts").collect()}
    assert out[100] == 901  # equal-ts right row IS visible (<=)
    assert out[101] == 902  # latest prior
    assert out[102] is None  # no right row at/before t(5)


def test_asof_join_single_shuffle(spark):
    left = spark.range(10).selectExpr("id % 3 as k", "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,id) as ts", "id as lv")
    right = spark.range(10).selectExpr("id % 3 as k", "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,id) as ts", "id as rv")
    out = asof_join(left, right, key="k", ts="ts")
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "simple")
    # the whole as-of is ONE window over the union → exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1
