"""Skew mitigation & co-location utilities (SURVEY.md §4, §7 step 8).

At RFB scale the join key ``cnpj_basico`` is heavily skewed (large
holding companies own thousands of establishments). Two standing
answers beyond AQE's runtime skew-join split:

- **Salting** (``salted_join``): spread a hot key across N sub-keys by
  salting the big side deterministically and replicating the other
  side N times. Exact same join result, N-way finer key granularity.
- **Bucketing** (``write_bucketed``/co-located joins): pre-shuffle at
  write time so repeated joins on the bucket key need no exchange at
  read time — the right call when a fact table is joined on the same
  key by many downstream queries (the RFB star schema's access
  pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot side salted N ways.

    The big side gets a deterministic salt from row content hashing
    (uniform, reproducible — no rand(), which would break retries and
    resume semantics); the small side is replicated n_salt times via an
    exploded literal range. The composite (key, salt) join spreads any
    single hot key over n_salt reducers.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    big_salted = big.withColumn("_salt", salt.cast("int"))
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = big_salted.join(small_replicated, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist pre-shuffled by ``bucket_key``: subsequent equi-joins or
    aggregations on that key between same-bucketed tables run without
    an Exchange (verified in tests/test_skew_bucketing.py)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), key)
