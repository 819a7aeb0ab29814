"""Skew mitigation: salted joins and salted holistic aggregation.

The reference is single-process and never shuffles, so skew has no analog
there — but at 100 TB a hot key (one library with 10⁹ chunks, one user with
10⁷ events) turns a shuffle join or a ``collect_list`` into one straggler
task. Two standard remedies, expressed as reusable DataFrame combinators:

- :func:`salted_join` — replicate the *small* side across ``n_salts``
  buckets and scatter the large side's hot rows uniformly; the join key
  becomes (key, salt) so a hot key spreads over ``n_salts`` tasks. Use when
  the small side is too big to broadcast and AQE's skew-join split (which
  the session enables) isn't available — e.g. inside
  ``foreachBatch`` micro-batches or non-AQE environments.
- :func:`salted_collect_list` — holistic aggs (collect_list/set) get no
  map-side partial aggregation, so a hot group's entire payload lands on
  one reducer. Two-phase form: collect per (key, salt), then flatten the
  ≤ ``n_salts`` partial arrays per key.

Both are result-identical to their naive forms (asserted in
tests/test_skew.py); ordering inside collected arrays is made canonical by
sorting, as any distributed collect must.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: hash all columns — uniform for hot keys
    whose non-key columns vary, and stable across retries (no rand())."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot (large) side scattered over n_salts buckets.

    The small side is replicated n_salts× (explode over the salt range) —
    total shuffle growth is |small|·n_salts, the price for splitting each
    hot key into n_salts independent reducer tasks.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn("__salt", _salt_col(large, n_salts))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_large.join(salted_small, keys + ["__salt"], how)
    return out.drop("__salt")


def salted_collect_list(
    df: DataFrame,
    key: str,
    payload: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase collect_list: per-(key, salt) partials, then a flatten of
    at most n_salts arrays per key. Output column ``items`` is sorted for
    determinism. Reducer memory per task drops from |hot group| to
    |hot group| / n_salts in the first (wide) phase."""
    partial = (
        df.withColumn("__salt", _salt_col(df, n_salts))
        .groupBy(key, "__salt")
        .agg(F.collect_list(payload).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("__part"))).alias("items"))
    )
