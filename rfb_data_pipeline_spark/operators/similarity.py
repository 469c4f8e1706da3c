"""Similarity search over the ``embeddings`` table (north star).

- s01: brute-force cosine top-k — the exactness baseline. One pass
  over the table against a broadcast query vector; dot products are
  computed JVM-side with ``zip_with``/``aggregate`` (no Python).
- s02: multi-table sign-LSH ANN — NUM_TABLES independent random-
  hyperplane (Rademacher ±1, md5-seeded) bucket indexes; the query
  probes one bucket per table, candidates are deduped and exact-
  scored. Measured at sf0.1: recall@10 = 0.8 at 24% of the corpus
  scanned (tests/test_ann_recall.py). Deterministic hyperplanes +
  sequential float64 folds keep the bucketing bit-identical across
  engines, so the DuckDB oracle reproduces it exactly.
- s03: all-pairs near-neighbor join above a cosine threshold — the
  exactness oracle for pair recall.
- s06: the production pair join — candidates only WITHIN s02's
  (t, bucket) cells; equi-join, never all-pairs.

Floats: both engines widen float32 → float64 and accumulate
sequentially, which makes dot products bit-identical (verified);
cosine outputs are rounded at the edge anyway.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.plans.stage import stage_boundary

QUERY_VEC_ID = 0
TOP_K = 10
DIM = 64
# Sign-LSH family: NUM_TABLES independent tables of SIGN_BITS random
# hyperplanes each. For near-uniform 64-d corpora (neighbor angle
# ~60°, per-hyperplane agreement p ≈ 2/3), expected recall@10 is
# 1-(1-p^SIGN_BITS)^NUM_TABLES ≈ 0.77 at (6, 16) for an expected scan
# fraction ≤ NUM_TABLES/2^SIGN_BITS = 25% — measured in
# tests/test_ann_recall.py at several settings.
SIGN_BITS = 6
NUM_TABLES = 16
NEAR_DUP_COS = 0.45
# The corpus size (16, 6) was adopted at: sf0.1's 2000 vectors —
# occupancy 2000/2^6 ≈ 31 vectors/bucket. The sizing ladder below is
# anchored here; every test SF (500, 2000) lands on the defaults, so
# promoting the ladder into s06 moves no oracle hash.
LSH_ANCHOR_N = 2000
MAX_SIGN_BITS = 30  # buckets are int32 (2^30 cells ≫ any real corpus)


def lsh_operating_point(
    n_vectors: int,
    base_n: int = LSH_ANCHOR_N,
    base_tables: int = NUM_TABLES,
    base_bits: int = SIGN_BITS,
) -> tuple[int, int]:
    """N-adaptive ``(num_tables, sign_bits)`` — the s06 sizing rule
    promoted from the r10 doc-note into code (VERDICT r10 item 2).

    With ``sign_bits`` fixed the bucket count is constant, occupancy
    grows ~N and candidate pairs ~N² (measured 1 : 9.2 : 111 at
    1×/3×/10×, tools/scale_check.py). So:

    - ``sign_bits`` grows by round(log2(N / anchor)) — constant
      expected bucket occupancy, keeping per-vector candidate work
      (and the bucket self-join's shuffle) linear in N;
    - ``num_tables`` DOUBLES per +3 bits — finer buckets cut the
      per-table capture probability p^bits (p ≈ 2/3 on near-uniform
      64-d corpora), so recall must be re-bought with more tables.
      The measured rung: (16, 6) at 2k vectors → (32, 9) at 20k —
      25 s / 146 MB shuffle (3.5× less than (16, 6)'s quadratic
      507 MB) at recall@10 0.43 ≥ the s16 floor 0.25, scan fraction
      32/2^9 = 6.3%. The naive bits-only retune (16, 9) measured
      recall 0.22 < floor and is exactly what this function exists
      to prevent.

    Any derived point must keep ``s16_ann_recall_verdict``'s
    ``recall_ge_floor`` green — tests/test_ann_recall.py asserts the
    ladder's rungs and re-measures the floor at the derived point on
    the 10× replica fixture.
    """
    if n_vectors <= base_n:
        return base_tables, base_bits
    delta = min(
        round(math.log2(n_vectors / base_n)), MAX_SIGN_BITS - base_bits
    )
    return base_tables * 2 ** ((delta + 2) // 3), base_bits + delta


def _rademacher(t: int, j: int, i: int) -> float:
    """±1 hyperplane weight, seeded by md5 so BOTH engines (and every
    run) see the identical hyperplane family — no RNG state to ship."""
    d = hashlib.md5(f"{t}|{j}|{i}".encode()).hexdigest()
    return 1.0 if int(d[0], 16) >= 8 else -1.0


@lru_cache(maxsize=None)
def _hyperplanes(num_tables: int, sign_bits: int) -> tuple:
    return tuple(
        tuple(
            tuple(_rademacher(t, j, i) for i in range(DIM))
            for j in range(sign_bits)
        )
        for t in range(num_tables)
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("embeddings",), register_views=False)[
        "embeddings"
    ]


# s06 / write_lsh_index derive their LSH operating point from the
# corpus size; the count is parquet row-group metadata, but it still
# rides through load_tables' projection/casts, so memoize it per
# (session, sf_dir) like the other shared bases (ADVICE r11).
_EMB_COUNT_CACHE: dict[tuple, tuple[SparkSession, tuple]] = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _EMB_COUNT_CACHE,
        spark,
        sf_dir,
        ("embeddings",),
        lambda: _emb(spark, sf_dir).count(),
    )


def _fill_operating_point(
    spark: SparkSession,
    sf_dir: str,
    num_tables: int | None,
    sign_bits: int | None,
) -> tuple[int, int]:
    """Resolve an LSH operating point: unset knobs derive from the
    sizing ladder at the (memoized) corpus count. Pinning only ONE
    knob used to silently revert the other to the anchor constant — a
    probe/written-index mismatch footgun (ADVICE r11); now the ladder
    fills whichever knobs the caller leaves unset, so a partial pin
    composes with the same derivation a full default would use."""
    if num_tables is not None and sign_bits is not None:
        return num_tables, sign_bits
    dt, db = lsh_operating_point(_emb_count(spark, sf_dir))
    return (dt if num_tables is None else num_tables,
            db if sign_bits is None else sign_bits)


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: str) -> Column:
    return F.sqrt(_dot(a, a))


def _bucket_udf(num_tables: int, sign_bits: int):
    """Arrow-batched pandas UDF: embedding → [bucket_0..bucket_T-1].

    This is the one similarity op NOT written with built-in
    expressions: 96 hyperplane projections per row as native
    ``aggregate``/``zip_with`` trees made Catalyst analysis itself the
    bottleneck (tens of seconds of driver time for a constant-size
    plan), while a vectorized Arrow batch does the same math in
    microseconds. The accumulation is a SEQUENTIAL fold over dims
    (i = 0..63, vectorized across rows) in float64 — the exact
    operation order of Spark's ``aggregate`` fold and DuckDB's
    unrolled sum, so bucket bits are bit-identical across engines.
    """
    hp = _hyperplanes(num_tables, sign_bits)
    w = np.array(hp, dtype=np.float64).reshape(num_tables * sign_bits, DIM)
    powers = (1 << np.arange(sign_bits)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # (n, DIM)
        acc = np.zeros((m.shape[0], w.shape[0]), dtype=np.float64)
        for i in range(DIM):  # sequential over dims == engines' fold
            acc += m[:, i : i + 1] * w[None, :, i]
        bits = (acc >= 0).reshape(-1, num_tables, sign_bits)
        out = (bits * powers[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(out))

    return buckets


def _bucketed(df: DataFrame, num_tables: int, sign_bits: int) -> DataFrame:
    """(vec_id, label, embedding, t, bucket) — one row per LSH table.
    At 100 TB this is the materialized index layout, written bucketed/
    partitioned by (t, bucket) so probes are partition-pruned reads."""
    udf = _bucket_udf(num_tables, sign_bits)
    return df.select(
        "vec_id",
        "label",
        "embedding",
        F.posexplode(udf("embedding")).alias("t", "bucket"),
    )


_SQL_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _sql_bucket(col: str, table_weights: tuple) -> str:
    """Unrolled ± sums: left-associated addition in dim order — the
    same sequential float64 fold as the Spark side (see _bucket_udf)."""
    terms = []
    for j, w in enumerate(table_weights):
        first = f"({col}[1]::DOUBLE)" if w[0] > 0 else f"(- ({col}[1]::DOUBLE))"
        rest = " ".join(
            ("+" if x > 0 else "-") + f" ({col}[{i + 2}]::DOUBLE)"
            for i, x in enumerate(w[1:])
        )
        terms.append(f"(CASE WHEN {first} {rest} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


def _sql_buckets_cte(num_tables: int, sign_bits: int) -> str:
    """unnest one row per (t, bucket) — mirrors ``_bucketed``."""
    hp = _hyperplanes(num_tables, sign_bits)
    buckets = ",\n    ".join(
        f"{_sql_bucket('embedding', hp[t])} AS b{t}" for t in range(num_tables)
    )
    pairs = ", ".join(f"[{t}, b{t}]" for t in range(num_tables))
    return f"""
  SELECT vec_id, label, embedding, u.tb[1] AS t, u.tb[2] AS bucket
  FROM (
    SELECT vec_id, label, embedding,
    {buckets}
    FROM embeddings
  ), unnest([{pairs}]) AS u(tb)
"""


# --------------------------------------------------------------------------
# s01 — brute-force cosine top-k against one query vector.


def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_S01_SQL = f"""
WITH q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s02 — ANN via multi-table sign-LSH: NUM_TABLES independent bucket
# indexes; the query probes its bucket in each table, candidates are
# the union (deduped), then exact-scored. At 100 TB the bucketed index
# (vec_id, t, bucket) is a materialized table partitioned by
# (t, bucket), so each probe is a partition-pruned read of
# ~NUM_TABLES/2^SIGN_BITS of the corpus; candidate generation is an
# equi-join, never a scan-with-predicate.


def ann_lsh(
    spark: SparkSession,
    sf_dir: str,
    num_tables: int = NUM_TABLES,
    sign_bits: int = SIGN_BITS,
) -> DataFrame:
    emb = _emb(spark, sf_dir)
    buckets = _bucketed(emb, num_tables, sign_bits)
    qbuckets = (
        buckets.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            F.col("embedding").alias("q"),
            F.col("t").alias("qt"),
            F.col("bucket").alias("qbucket"),
        )
    )
    cand = (
        buckets.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(
            F.broadcast(qbuckets),
            (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")),
        )
        .groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.first("embedding").alias("embedding"),
            F.first("q").alias("q"),
        )
    )
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        cand.select(
            "vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh(spark, sf_dir)


def lsh_candidates(
    spark: SparkSession,
    sf_dir: str,
    num_tables: int,
    sign_bits: int,
) -> DataFrame:
    """Distinct candidate set for the query probe — used by the recall
    test to measure the realized scan fraction."""
    buckets = _bucketed(_emb(spark, sf_dir), num_tables, sign_bits)
    qb = buckets.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("t").alias("qt"), F.col("bucket").alias("qbucket")
    )
    return (
        buckets.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(
            F.broadcast(qb),
            (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")),
        )
        .select("vec_id")
        .distinct()
    )


_S02_SQL = f"""
WITH buckets AS ({_sql_buckets_cte(NUM_TABLES, SIGN_BITS)}),
q AS (SELECT embedding AS q, t AS qt, bucket AS qbucket
      FROM buckets WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT vec_id,
         any_value(label) AS label,
         any_value(buckets.embedding) AS embedding,
         any_value(q.q) AS q
  FROM buckets JOIN q ON t = qt AND bucket = qbucket
  WHERE vec_id != {QUERY_VEC_ID}
  GROUP BY vec_id
)
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM cand
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s03 — near-neighbor pair join above a cosine threshold (embedding
# near-dup detection). All-pairs for verification; compose with s02's
# bucket key for the banded variant at scale.


# s03's exact all-pairs scan runs as a BLOCK OUTER PRODUCT: vectors
# hash into _S03_BLOCKS row/column blocks, every unordered block pair
# (i <= j) forms one group, and an Arrow-batched applyInPandas
# computes the block-x-block cosine matrix with vectorized numpy —
# the canonical distributed brute-force layout (each vector is
# replicated B times; work per group is (N/B)^2 pairs; groups spread
# across executors, nothing collects to the driver). The per-pair
# Catalyst fold (zip_with + aggregate allocating a 64-array per pair)
# measured 16 us/pair — 33 s at sf0.1; the blocked numpy form is
# ~20x faster at identical results.
#
# Determinism contract: the numpy accumulation loops over dims IN
# ORDER (acc += A[:,d] * B[:,d] per d), reproducing bit-for-bit the
# sequential fold order of both the old Spark expression and the
# DuckDB twin's list_sum — float addition is not associative, so a
# BLAS matmul (pairwise/SIMD reduction) could flip a rounded 4th
# decimal; the explicit loop cannot. The UDF emits RAW cosines above
# a safety margin and Spark applies the exact round+threshold, so the
# rounding semantics stay engine-side, identical to every other row.

_S03_BLOCKS = 16


def s03_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401 (worker-side)

    from rfb_data_pipeline_spark.session import ship_package

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    ship_package(spark)
    B = _S03_BLOCKS
    blk = F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    tagged = emb.select("vec_id", "embedding", blk.alias("b"))
    partners = tagged.select(
        "vec_id",
        "embedding",
        "b",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("p"),
    )
    grouped = partners.select(
        "vec_id",
        "embedding",
        "b",
        F.least("b", "p").alias("gi"),
        F.greatest("b", "p").alias("gj"),
    ).dropDuplicates(["vec_id", "gi", "gj"])

    margin = NEAR_DUP_COS - 1e-4  # raw-value prefilter; exact cut below

    def block_pairs(key, pdf):
        import numpy as np
        import pandas as pd

        _msg = (
            "zero-norm or non-finite embedding reached "
            "s03_near_dup_pairs; gate with s14/valid_embedding_pred"
        )

        def to_mat(rows):
            vecs = rows["embedding"].to_numpy()
            if any(v is None for v in vecs):
                raise ValueError(_msg)
            try:  # ragged (wrong-dim) input also violates the gate
                return np.stack(vecs).astype(np.float64)
            except ValueError as exc:
                raise ValueError(_msg) from exc

        empty = pd.DataFrame(
            {
                "vec_a": np.array([], dtype=np.int64),
                "vec_b": np.array([], dtype=np.int64),
                "raw_cos": np.array([], dtype=np.float64),
            }
        )
        i, j = int(key[0]), int(key[1])
        left = pdf[pdf["b"] == i]
        right = left if i == j else pdf[pdf["b"] == j]
        if not len(left) or not len(right):
            return empty  # a block can be empty on small inputs
        ids_a, ma = left["vec_id"].to_numpy(), to_mat(left)
        ids_b, mb = (
            (ids_a, ma)
            if i == j
            else (right["vec_id"].to_numpy(), to_mat(right))
        )
        # dim-ordered accumulation == the sequential fold (see note)
        dots = np.zeros((len(ids_a), len(ids_b)))
        na = np.zeros(len(ids_a))
        nb = np.zeros(len(ids_b))
        for d in range(ma.shape[1]):
            dots += ma[:, d : d + 1] * mb[None, :, d]
            na += ma[:, d] * ma[:, d]
            nb += mb[:, d] * mb[:, d]
        # the cosine surface's documented precondition (s14 gate):
        # the old expression form crashed loud on zero-norm input
        # (ANSI x/0); numpy would silently emit Inf/NaN instead —
        # keep the fail-loud contract
        if (
            np.any(na == 0.0)
            or np.any(nb == 0.0)
            or not (np.isfinite(na).all() and np.isfinite(nb).all())
        ):
            raise ValueError(
                "zero-norm or non-finite embedding reached "
                "s03_near_dup_pairs; gate with s14/valid_embedding_pred"
            )
        cos = dots / (np.sqrt(na)[:, None] * np.sqrt(nb)[None, :])
        aa, bb = np.nonzero(cos >= margin)
        if i == j:
            # same block on both sides: each unordered pair surfaces
            # twice ((a,b) and (b,a)) plus the self-diagonal — keep
            # one index triangle
            tri = aa < bb
            aa, bb = aa[tri], bb[tri]
        va, vb = ids_a[aa], ids_b[bb]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "raw_cos": cos[aa, bb]}
        )

    pairs = grouped.groupBy("gi", "gj").applyInPandas(
        block_pairs, "vec_a bigint, vec_b bigint, raw_cos double"
    )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            (F.round(F.col("raw_cos"), 4) + F.lit(0.0)).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


# Threshold is applied to the ROUNDED cosine in both engines (a raw
# value like 0.44996 must fall on the same side of the cut everywhere —
# ADVICE round 1).
_S03_SQL = f"""
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_SQL_DOT.format(a="a.embedding", b="b.embedding")}
               / (sqrt({_SQL_DOT.format(a="a.embedding", b="a.embedding")})
                  * sqrt({_SQL_DOT.format(a="b.embedding", b="b.embedding")})), 4) + 0.0
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
WHERE cosine >= {NEAR_DUP_COS}
"""


# --------------------------------------------------------------------------
# s06 — near-dup pairs WITHIN the s02 LSH buckets: the production form
# of s03 at 100 TB. Candidates are pairs sharing (t, bucket) in any of
# the NUM_TABLES indexes — an equi-join on the bucketed layout, never
# all-pairs; pair work is quadratic only within a bucket
# (corpus/2^SIGN_BITS expected). Recall vs the exact pairs is the LSH
# capture probability (~0.7 at cos 0.45 with (6,16) — measured in
# tests/test_ann_recall.py); s03 stays as the exactness oracle.


# Session memo of the narrow (vec_id, t, bucket) LSH index (r13):
# s06 re-ran the 96-projection bucket UDF and its localCheckpoint on
# every invocation; within a session the index is built once per
# (sf_dir, num_tables, sign_bits). This IS the materialized index of
# the s06 docstring, shared in-session the way pipeline/ann_index.py
# persists it across sessions. Pure sharing; results unchanged.
_BUCKET_IDS_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _bucket_ids_cached(
    spark: SparkSession, sf_dir: str, num_tables: int, sign_bits: int
) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _BUCKET_IDS_CACHE,
        spark,
        sf_dir,
        ("embeddings",),
        lambda: _bucketed(_emb(spark, sf_dir), num_tables, sign_bits)
        .select("vec_id", "t", "bucket")
        .transform(stage_boundary),
        extra=(int(num_tables), int(sign_bits)),
    )


def _s06_candidates(
    spark: SparkSession,
    emb: DataFrame,
    num_tables: int = NUM_TABLES,
    sign_bits: int = SIGN_BITS,
    ids: DataFrame | None = None,
) -> DataFrame:
    """Narrow (vec_a, vec_b) candidate pairs from the bucket self-join
    — exposed separately so capacity planning can count candidates at
    a given (num_tables, sign_bits) before running the scoring stage.
    ``ids`` lets s06 pass the session-memoized bucket index."""
    if ids is None:
        ids = (
            _bucketed(emb, num_tables, sign_bits)
            .select("vec_id", "t", "bucket")
            .transform(stage_boundary)
        )
    # Candidate generation stays NARROW: only (vec_id, t, bucket) flows
    # through the bucket self-join and the pair-dedup shuffle — the
    # 64-float embeddings are fetched AFTER distinct, by two equi-joins
    # on the (small) surviving pair set. Shipping the arrays through
    # the bucket join and deduping with first(array) shuffled every
    # vector once per (table x bucket-mate) — measured 2.5x slower at
    # sf0.1 and strictly worse at scale.
    return (
        ids.alias("a")
        .join(ids.alias("b"), ["t", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        # The narrow ids table broadcasts, so the bucket self-join
        # inherits its handful of input partitions — round-robin the
        # (two-long-column) pair set across the cluster so the scoring
        # stage below parallelizes. At scale the self-join shuffles on
        # (t, bucket) anyway and this becomes a no-op-cost rebalance.
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    )


def s06_near_dup_pairs_banded(
    spark: SparkSession,
    sf_dir: str,
    num_tables: int | None = None,
    sign_bits: int | None = None,
) -> DataFrame:
    # N-ADAPTIVE BY DEFAULT (VERDICT r10 item 2): knobs the caller
    # doesn't pin derive from the corpus size via the measured ladder
    # (lsh_operating_point) — at every test SF the derivation lands on
    # the anchor (16, 6), so the oracle SQL (frozen at the anchor)
    # stays hash-identical; at 10× it lands on the s16-gated (32, 9).
    # The corpus count behind the derivation is memoized per
    # (session, sf_dir) alongside the other shared bases, and a
    # PARTIAL pin (one knob) fills the other from the same ladder
    # instead of silently reverting it to the anchor (ADVICE r11).
    emb = _emb(spark, sf_dir)
    num_tables, sign_bits = _fill_operating_point(
        spark, sf_dir, num_tables, sign_bits
    )
    # Checkpoint: the 96-projection bucket table feeds both join
    # sides; at pipeline scale it is the materialized (t, bucket)-
    # partitioned index this query would read back. Only the NARROW
    # (vec_id, t, bucket) index is checkpointed — materializing the
    # 64-float embedding once per LSH table (16x data volume) is pure
    # waste when candidate generation never touches it.
    #
    # SIZE THE BUCKET WIDTH WITH THE CORPUS (tools/scale_check.py
    # measurement, r04): with sign_bits FIXED the bucket count is
    # constant, per-bucket occupancy grows ~N, and candidate pairs —
    # hence shuffle bytes — grow ~N² (measured 1 : 8.2 : 97.5 at
    # 1x/3x/10x). sign_bits is therefore a PARAMETER: grow it as
    # ~log2(N / target_bucket_occupancy) so occupancy (and per-vector
    # candidate work) stays constant — and GROW num_tables WITH it,
    # because finer buckets cut per-table capture probability (p^bits)
    # and recall must be re-bought with more tables. Measured on the
    # 10x fixture (r10, the s16 panel as the audit): the naive
    # bits-only retune (16, 6)→(16, 9) restored the linear band
    # (85 s/507 MB → 16.6 s/74 MB) but dropped recall@10 0.66 → 0.22,
    # BELOW the 0.25 floor — s16's recall_ge_floor flags it. The
    # correct operating point is (32 tables, 9 bits): s06 25 s/146 MB
    # (3.5x less shuffle than (16, 6)) at recall 0.43 ≥ floor, scan
    # fraction 32/2^9 = 6.3% (vs 25% at (16, 6)). Always re-run the
    # s16 panel at a candidate retune before adopting it;
    # tests/test_ann_recall.py is the harness — and since r11 the
    # ladder is CODE, not a note: lsh_operating_point above.
    cand = _s06_candidates(
        spark,
        emb,
        num_tables,
        sign_bits,
        ids=_bucket_ids_cached(spark, sf_dir, num_tables, sign_bits),
    )
    # r14: norms HOISTED to the join sides — computed once per vector
    # (5k rows) instead of once per candidate pair (548k at sf0.1),
    # cutting the scoring stage's array math 3x (one dot per pair
    # instead of three). Bit-identical: the same expression over the
    # same input bits yields the same double, and the divisor
    # (na * nb) multiplies in the same order as before (guide §1.2
    # step 2). Measured 1.52 -> 0.96 s, 6 -> 5 jobs/rep.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        _norm("embedding").alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        _norm("embedding").alias("nb"),
    )
    cos = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    # Verify BEFORE deduplicating (same reorder as d05): scoring the
    # ~16% duplicate candidates is a map-side broadcast join + dot
    # product, while distinct() is a shuffle — deduping the scored
    # survivors (~0.02% of candidates) instead of the full candidate
    # set removes the one large shuffle in the query (measured 1.6x
    # end-to-end at sf0.1; at scale the distinct input drops from
    # O(candidates) to O(true pairs)).
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COS)
        .distinct()
    )


_S06_SQL = f"""
WITH buckets AS ({_sql_buckets_cte(NUM_TABLES, SIGN_BITS)}),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         any_value(a.embedding) AS ea, any_value(b.embedding) AS eb
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT vec_a, vec_b,
         round({_SQL_DOT.format(a="ea", b="eb")}
               / (sqrt({_SQL_DOT.format(a="ea", b="ea")})
                  * sqrt({_SQL_DOT.format(a="eb", b="eb")})), 4) + 0.0 AS cosine
  FROM cand
)
WHERE cosine >= {NEAR_DUP_COS}
"""


# --------------------------------------------------------------------------
# s04 — per-label centroids via elementwise array aggregation: explode
# to (label, dim, value), average per (label, dim), re-assemble the
# vector ordered by dim. The one-iteration core of distributed k-means
# (the full loop is driver-controlled re-invocation of this shape).


def s04_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("avg_v")
    )
    # The centroid ships as a ','-joined fixed-format string, not a raw
    # array: the driver's pandas canonicalizer cannot sort/hash list
    # cells (round-1 q25 crash). %.4f on both engines is bit-stable
    # because the rounded doubles are identical (see module docstring).
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            # + 0.0 folds IEEE negative zero to +0.0 (round
                            # can emit -0.0, and engines disagree on it)
                            F.struct(
                                "dim", (F.round("avg_v", 4) + F.lit(0.0)).alias("r")
                            )
                        )
                    ),
                    lambda s: F.format_string("%.4f", s.getField("r")),
                ),
                ",",
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_dims"),
        )
    )


_S04_SQL = """
WITH dims AS (
  SELECT label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), per_dim AS (
  SELECT label, dim, avg(v) AS avg_v FROM dims GROUP BY 1, 2
)
SELECT label,
       list_aggregate(
         list_transform(
           list_sort(list(struct_pack(dim := dim, r := round(avg_v, 4) + 0.0))),
           s -> printf('%.4f', s.r)),
         'string_agg', ',') AS centroid,
       count(*) AS n_dims
FROM per_dim
GROUP BY label
"""


# --------------------------------------------------------------------------
# s05 — IVF (inverted-file) ANN: coarse-quantize the corpus into
# partitions (here the label clusters stand in for k-means cells —
# their centroids come from the s04 shape), score the query against
# the centroids, probe only the top-NPROBE cells, then exact top-k
# within them. At 100 TB the table is partitioned by cell id, so the
# probe is a partition-pruned scan of nprobe/ncells of the data.

NPROBE = 2


def _ivf_probe_cells(emb: DataFrame, nprobe: int = NPROBE) -> DataFrame:
    """Top-nprobe cells by centroid cosine against the query — the one
    copy of the coarse-quantizer probe, shared by s05 and s15.

    Centroids come from ``centroid_arrays`` (decimal-exact,
    order-independent sums) and the cosine is the sequential ``_dot``
    fold — the SAME math the materialized-index sidecar probe
    (pipeline/ann_index) evaluates driver-side, so near-tie cell
    selection can never diverge between the operator, its oracle, and
    the index probe (second review pass, finding 3)."""
    cents = centroid_arrays(emb)
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    cos = _dot("c_arr", "q") / (_norm("c_arr") * _norm("q"))
    return (
        cents.crossJoin(F.broadcast(query))
        .select("label", cos.alias("centroid_cos"))
        .orderBy(F.desc("centroid_cos"), F.asc("label"))
        .limit(nprobe)
    )


def s05_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    probe = _ivf_probe_cells(emb)
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q")
    )
    cos = _dot("embedding", "q") / (_norm("embedding") * _norm("q"))
    return (
        emb.join(F.broadcast(probe.select("label")), "label")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", (F.round(cos, 4) + F.lit(0.0)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_SQL_IVF_PROBE = f"""dims AS (
  SELECT label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, 65)) AS u(i)
), cdim AS (
  SELECT label, dim, (sum(v::DECIMAL(20,10)))::DOUBLE / count(*) AS cv
  FROM dims GROUP BY 1, 2
), cents AS (
  SELECT label, list(cv ORDER BY dim) AS c FROM cdim GROUP BY label
), qq AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
cscores AS (
  SELECT label,
         {_SQL_DOT.format(a="c", b="q")}
           / (sqrt({_SQL_DOT.format(a="c", b="c")})
              * sqrt({_SQL_DOT.format(a="q", b="q")})) AS centroid_cos
  FROM cents, qq
), probe AS (
  SELECT label FROM cscores ORDER BY centroid_cos DESC, label ASC LIMIT {NPROBE}
)"""

_S05_SQL = f"""
WITH {_SQL_IVF_PROBE},
q AS (SELECT embedding AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round({_SQL_DOT.format(a="embedding", b="q")}
             / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
FROM embeddings JOIN probe USING (label), q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s07 — int8-quantized kNN: per-vector symmetric quantization
# (q_i = round_half_up(x_i * 127 / max|x|)) then exact top-k on the
# quantized vectors. The 100 TB story: 4× less scan I/O and integer
# dot products; the quantization error is measurable against s01 (the
# float baseline) instead of assumed. All integer arithmetic is exact,
# so cross-engine parity is trivial; the only float steps (scale and
# final cosine) are order-identical. round-half-up is spelled
# floor(x + 0.5) because the engines' round() disagree on ties.


def s07_quantized_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    qvec = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127 / m + F.lit(0.5)).cast("long"),
    )
    q = emb.select("vec_id", "label", qvec.alias("qe"))
    query = q.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("qe").alias("qq")
    )

    def idot(a: str, b: str) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    qcos = idot("qe", "qq") / (
        F.sqrt(idot("qe", "qe")) * F.sqrt(idot("qq", "qq"))
    )
    return (
        q.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", "label", (F.round(qcos, 4) + F.lit(0.0)).alias("qcosine"))
        .orderBy(F.desc("qcosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


_SQL_IDOT = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"

_S07_SQL = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(x::DOUBLE * 127 / m + 0.5) AS BIGINT)) AS qe
  FROM (SELECT vec_id, label, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
        FROM embeddings)
),
qq AS (SELECT qe AS qq FROM q WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round({_SQL_IDOT.format(a="qe", b="qq")}::DOUBLE
             / (sqrt({_SQL_IDOT.format(a="qe", b="qe")}::DOUBLE)
                * sqrt({_SQL_IDOT.format(a="qq", b="qq")}::DOUBLE)), 4) + 0.0
         AS qcosine
FROM q, qq
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY qcosine DESC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s08 — k-means (two full Lloyd iterations): the iterative-algorithm
# shape on Spark. Each iteration is assign (broadcast the K centroids,
# per-vector argmin) → recompute (explode dims, one keyed aggregate) —
# the loop lives in the DRIVER, each step is a declarative plan, and
# nothing iterates per-row in Python. Determinism across engines:
#   * distances are sequential float64 folds over dims (bit-identical
#     Spark↔DuckDB, the _SQL_DOT precedent);
#   * argmin ties break on cid via row_number;
#   * recomputed centroids use DECIMAL(20,10) sums — exact, therefore
#     ORDER-INDEPENDENT, where a float sum would drift with partial
#     ordering and could flip a near-equidistant assignment.
# At 100 TB: centroids are tiny (K x dim) and broadcast; each
# iteration costs one corpus map + one narrow shuffle on (cid, dim).

K_CLUSTERS = 8


def s08_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents0 = emb.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )

    def assign(cents: DataFrame) -> DataFrame:
        d2 = F.aggregate(
            F.zip_with(
                "embedding",
                "c",
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # argmin via min-of-struct (the g06/r14 sort-removal): (d2,
        # cid) is unique per vec_id, so the lexicographic struct min
        # is exactly the row_number()==1 row under (d2 asc, cid asc);
        # hash aggregate with map-side combining instead of a full
        # partition sort per Lloyd iteration (guide §2.2).
        return (
            emb.crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                F.struct(
                    d2.alias("d2"),
                    F.col("cid").alias("cid"),
                    F.col("embedding").alias("embedding"),
                ).alias("s"),
            )
            .groupBy("vec_id")
            .agg(F.min("s").alias("s"))
            .select(
                "vec_id",
                F.col("s.embedding").alias("embedding"),
                F.col("s.cid").alias("cid"),
                F.col("s.d2").alias("d2"),
            )
        )

    a1 = assign(cents0)
    dims = a1.select("cid", F.posexplode("embedding").alias("dim", "v"))
    cd = dims.groupBy("cid", "dim").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(20,10)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("cv")
    )
    cents1 = (
        cd.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("s"))
        .select("cid", F.transform("s", lambda x: x["cv"]).alias("c"))
    )
    a2 = assign(cents1)
    return a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("d2"), 2).alias("sse"),
    )


_SQL_D2 = (
    "list_sum(list_transform(range(1, 65), "
    "i -> ({e}[i]::DOUBLE - {c}[i]) * ({e}[i]::DOUBLE - {c}[i])))"
)

_S08_SQL = f"""
WITH c0 AS (
  SELECT vec_id::INTEGER AS cid,
         list_transform(embedding, x -> x::DOUBLE) AS c
  FROM embeddings WHERE vec_id < {K_CLUSTERS}
),
a1 AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_D2.format(e="e.embedding", c="c.c")} ASC, c.cid ASC
           ) AS rk
    FROM embeddings e CROSS JOIN c0 c
  ) WHERE rk = 1
),
cd AS (
  SELECT cid, u.i AS dim,
         (sum(embedding[u.i]::DOUBLE::DECIMAL(20,10)))::DOUBLE / count(*) AS cv
  FROM a1, unnest(range(1, 65)) AS u(i)
  GROUP BY cid, u.i
),
c1 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM cd GROUP BY cid),
a2 AS (
  SELECT vec_id, cid, d2 FROM (
    SELECT e.vec_id, c.cid,
           {_SQL_D2.format(e="e.embedding", c="c.c")} AS d2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SQL_D2.format(e="e.embedding", c="c.c")} ASC, c.cid ASC
           ) AS rk
    FROM embeddings e CROSS JOIN c1 c
  ) WHERE rk = 1
)
SELECT cid, count(*) AS n_members, round(sum(d2), 2) AS sse
FROM a2 GROUP BY cid
"""


# --------------------------------------------------------------------------
# s09 — per-vector statistics via HIGHER-ORDER array functions.
#
# Exercises the lambda-expression layer (transform / filter /
# aggregate / array_max) that a vector pipeline leans on for cheap
# per-row feature math: everything runs inside whole-stage codegen —
# no shuffle, no UDF, scales embarrassingly with input splits.
# Float parity with the oracle: each component is cast float32 ->
# float64 BEFORE multiplying (float32 multiply would round the
# product), and both engines reduce the sum sequentially left-to-
# right, which is bit-identical for IEEE doubles.


def s09_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    sq = "transform(embedding, x -> double(x) * double(x))"
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        (
            F.round(F.sqrt(F.expr(f"aggregate({sq}, 0D, (a, b) -> a + b)")), 4)
            + F.lit(0.0)
        ).alias("norm"),
        F.expr("size(filter(embedding, x -> x > 0))")
        .cast("bigint")
        .alias("n_pos"),
        (
            F.round(F.expr("array_max(transform(embedding, x -> abs(double(x))))"), 4)
            + F.lit(0.0)
        ).alias("max_abs"),
    )


_S09_SQL = """
SELECT vec_id,
       len(embedding)::BIGINT AS dim,
       round(sqrt(list_aggregate(
           list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')), 4)
         + 0.0 AS norm,
       len(list_filter(embedding, x -> x > 0))::BIGINT AS n_pos,
       round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 4)
         + 0.0 AS max_abs
FROM embeddings
"""


# --------------------------------------------------------------------------
# s10 — semantic dedup (SemDeDup, Abbas et al. 2023): drop every vector
# whose cosine to a LOWER-id vector in the SAME cluster exceeds the
# threshold, keeping one representative per semantic-duplicate group.
#
# The candidate join is an EQUI-join on the cluster id (here `label`,
# standing in for the k-means cell id an s08-style pass assigns at
# scale) — pair work is quadratic only within a cell, never all-pairs.
# At 100 TB the corpus is partitioned by cell id, each cell's pairwise
# pass is a co-located per-partition job, and the number of cells is
# sized so cells fit in executor memory — exactly the paper's recipe.
# The keep rule (lowest vec_id survives) is deterministic, so both
# engines agree row-for-row; threshold compares the ROUNDED cosine on
# both sides (round-1 ADVICE symmetry rule).

SEMDEDUP_COS = 0.3


def s10_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Norms once per vector before the pair join (stored with the
    # cell index at scale) — one dot per pair instead of three. The
    # frame is hash-partitioned on the cell id ONCE and both join
    # sides derive from it, so the planner reuses a single exchange
    # (ReusedExchange) instead of shuffling the 64-float arrays twice
    # — at scale this is the cell-partitioned table layout itself.
    v = emb.select(
        "label", "vec_id", "embedding", _norm("embedding").alias("nrm")
    ).repartition("label")
    a = v.select(
        "label",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        "label",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4) + F.lit(0.0)
    dropped = (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= SEMDEDUP_COS)
        .select("label", F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    totals = v.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    drops = dropped.groupBy("label").agg(F.count(F.lit(1)).alias("n_dropped"))
    return (
        totals.join(drops, "label", "left")
        .select(
            "label",
            "n_vecs",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
        )
    )


_S10_SQL = f"""
WITH pairs AS (
  SELECT a.label, b.vec_id
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round({_SQL_DOT.format(a="a.embedding", b="b.embedding")}
              / (sqrt({_SQL_DOT.format(a="a.embedding", b="a.embedding")})
                 * sqrt({_SQL_DOT.format(a="b.embedding", b="b.embedding")})), 4) + 0.0
        >= {SEMDEDUP_COS}
), dropped AS (
  SELECT label, count(DISTINCT vec_id) AS n_dropped FROM pairs GROUP BY label
)
SELECT t.label, t.n_vecs,
       coalesce(d.n_dropped, 0) AS n_dropped,
       t.n_vecs - coalesce(d.n_dropped, 0) AS n_kept
FROM (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label) t
LEFT JOIN dropped d ON t.label = d.label
"""


# --------------------------------------------------------------------------
# s11 — BATCHED kNN: top-k neighbors for a whole batch of query
# vectors in one pass (the realistic retrieval shape — embedding
# services score thousands of queries per corpus sweep, not one).
# The batch broadcasts against the corpus scan, every (query, vector)
# pair is scored JVM-side, and the per-query top-k is a rank window
# ON THE QUERY KEY — Catalyst rewrites the rank<=k filter into
# WindowGroupLimit, so each corpus partition keeps only k rows per
# query BEFORE the shuffle: shuffled bytes are O(queries × k), not
# O(queries × corpus). One scan regardless of batch size, vs s01's
# scan-per-query.

BATCH_QUERY_IDS = (0, 1, 2, 3, 4)


def s11_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    ids = list(BATCH_QUERY_IDS)
    queries = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q"),
        _norm("embedding").alias("nq"),
    )
    # r14: norms hoisted to both crossJoin inputs (the s06 pattern) —
    # once per corpus row / per query instead of once per scored pair;
    # same expression over the same bits, so cosines are bit-identical.
    cos = _dot("embedding", "q") / (F.col("nrm") * F.col("nq"))
    scored = (
        emb.filter(~F.col("vec_id").isin(ids))
        .withColumn("nrm", _norm("embedding"))
        .crossJoin(F.broadcast(queries))
        .select(
            "qid",
            "vec_id",
            "label",
            (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "rank", "vec_id", "label", "cosine")
    )


def _s11_sql() -> str:
    ids = ", ".join(str(i) for i in BATCH_QUERY_IDS)
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id IN ({ids})
),
scored AS (
  SELECT qid, vec_id, label,
         round({_SQL_DOT.format(a="embedding", b="q")}
               / (sqrt({_SQL_DOT.format(a="embedding", b="embedding")})
                  * sqrt({_SQL_DOT.format(a="q", b="q")})), 4) + 0.0 AS cosine
  FROM embeddings, q
  WHERE vec_id NOT IN ({ids})
)
SELECT qid, rank, vec_id, label, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# s12 — embedding outlier detection: per-label squared distance to the
# label centroid, z-scored within the label; vectors with z > 2 are
# flagged. The embedding-table quality gate every curation pipeline
# runs before similarity search / SemDeDup — mislabeled or corrupt
# vectors show up as centroid outliers.
#
# Determinism: every cross-row aggregate (centroid sums, moment sums)
# goes through DECIMAL — exact, order-independent (the s08 idiom) —
# so both engines see bit-identical centroids, means, and variances;
# per-row float64 arithmetic is identical by construction. z uses the
# POPULATION variance (E[d²²]−E[d²]², same formula both sides).
#
# Scale: one (label, dim) centroid aggregate (partial-agg'd explode;
# broadcast-scale result: |labels|×DIM rows, collected into per-label
# centroid ARRAYS), then d² is a zip_with sequential fold against the
# BROADCAST centroid array — the corpus never shuffles on dim; the
# only corpus-size shuffles are the centroid partial agg and the
# per-label moment agg. Linear, no all-pairs.

OUTLIER_Z = 2.0


def centroid_arrays(emb: DataFrame) -> DataFrame:
    """Per-label centroid ARRAYS (label → array<double>), with
    DECIMAL-exact (order-independent) per-dim sums — the one copy of
    this math, shared by s12 and the streaming vector-ingest path
    (streaming/vector_stream.py) so batch-trained centroids and the
    oracle-checked outlier path can never drift apart."""
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = dims.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s.getField("c"),
        ).alias("c_arr")
    )


def squared_distance(vec_col: str, cent_col) -> Column:
    """Σ (v_i - c_i)² as a sequential zip_with fold (the s01 dot
    idiom — bit-identical across engines)."""
    return F.aggregate(
        F.zip_with(
            vec_col,
            cent_col,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def s12_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Per-label centroid ARRAY (|labels| rows), broadcast into the
    # main scan: d² is a per-row fold, so the exploded (vec, dim)
    # frame never re-shuffles into a dim join.
    cent_arr = centroid_arrays(emb)
    d2 = emb.join(F.broadcast(cent_arr), "label").select(
        "vec_id",
        "label",
        squared_distance("embedding", "c_arr").alias("d2"),
    )
    stats = d2.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum(F.col("d2").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_d2"),
        (
            F.sum((F.col("d2") * F.col("d2")).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_sq"),
    )
    joined = d2.join(F.broadcast(stats), "label")
    var = F.col("mean_sq") - F.col("mean_d2") * F.col("mean_d2")
    # Zero-variance guard: a single-vector label (or an all-equidistant
    # cell) has var == 0 → 0/0; by definition nothing deviates, z = 0.
    z = F.when(var > 0, (F.col("d2") - F.col("mean_d2")) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    return (
        joined.withColumn("z", z)
        .groupBy("label")
        .agg(
            F.max("n_vecs").cast("bigint").alias("n_vecs"),
            F.sum((F.col("z") > OUTLIER_Z).cast("int")).alias("n_outliers"),
            (F.round(F.max("z"), 4) + F.lit(0.0)).alias("max_z"),
            (F.round(F.max("mean_d2"), 4) + F.lit(0.0)).alias("mean_d2"),
        )
    )


_S12_SQL = f"""
WITH dims AS (
  SELECT vec_id, label, u.i - 1 AS dim, embedding[u.i]::DOUBLE AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cent AS (
  SELECT label, dim,
         (sum(v::DECIMAL(20,10)))::DOUBLE / count(*) AS c
  FROM dims GROUP BY label, dim
),
cent_arr AS (
  SELECT label, list(c ORDER BY dim) AS c_arr FROM cent GROUP BY label
),
d2 AS (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, 65),
           i -> (embedding[i]::DOUBLE - c_arr[i])
              * (embedding[i]::DOUBLE - c_arr[i])))::DOUBLE AS d2
  FROM embeddings JOIN cent_arr USING (label)
),
stats AS (
  SELECT label, count(*) AS n_vecs,
         (sum(d2::DECIMAL(30,12)))::DOUBLE / count(*) AS mean_d2,
         (sum((d2 * d2)::DECIMAL(38,12)))::DOUBLE / count(*) AS mean_sq
  FROM d2 GROUP BY label
),
z AS (
  SELECT label, n_vecs, mean_d2,
         CASE WHEN mean_sq - mean_d2 * mean_d2 > 0
              THEN (d2 - mean_d2) / sqrt(mean_sq - mean_d2 * mean_d2)
              ELSE 0.0 END AS zval
  FROM d2 JOIN stats USING (label)
)
SELECT label,
       CAST(max(n_vecs) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN zval > {OUTLIER_Z} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       round(max(zval), 4) + 0.0 AS max_z,
       round(max(mean_d2), 4) + 0.0 AS mean_d2
FROM z
GROUP BY label
"""


# --------------------------------------------------------------------------
# s13 — product-quantization (PQ) ANN: the compression half of FAISS's
# IVF-PQ standard (Jégou et al. 2011). The 64-d vector is split into
# PQ_M subvectors; each subspace gets a K_PQ-centroid codebook (seeded
# from the first K_PQ vectors, one Lloyd update — the s08 shape per
# subspace); a vector is stored as PQ_M small codes (here 4 × 3 bits —
# a 85x compression of the 64-float payload). Query-time ADC
# (asymmetric distance computation): d²(q, x) ≈ Σ_m d²(q_m,
# codebook_m[code_m(x)]) — the corpus scan reads ONLY the codes and a
# broadcast (PQ_M × K_PQ)-entry distance table.
#
# 100 TB story: the codebook is KB-sized and broadcast; encoding is
# one corpus map + one narrow (m, cid, dim) shuffle per training
# round; the ANN scan touches PQ_M bytes/vector instead of 256 —
# memory-bandwidth-bound at ~1e11 vectors where float scan is I/O
# dead. Composes with s05: IVF cells prune the scan, PQ codes shrink
# it.
#
# Determinism: per-(vec, m) argmin folds d² sequentially (bit-identical
# across engines, the s08 precedent) with cid tie-break; codebook
# update and the PQ_M-term ADC sum accumulate in DECIMAL — exact and
# order-independent, so LIMIT boundaries cannot flip on float
# reassociation. Rounded only at the output edge.

PQ_M = 4  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
K_PQ = 8  # centroids per subspace codebook

# SIZE THE CODEBOOK WITH THE DATA (same lesson as s06's sign_bits):
# total code entropy is PQ_M × log2(K_PQ) bits — 12 bits here, which
# on a NEAR-UNIFORM 64-d corpus cannot separate neighbors from the
# bulk (measured recall@10 0.4 at sf0.01 / 0.1 at sf0.1 — the
# information-theoretic limit, not an implementation defect; the
# planted-cluster test in tests/test_ops_r04c.py shows recall 1.0 the
# moment the data has structure). Production FAISS operating point is
# PQ_M=8..64, K_PQ=256 (64-512 bits); both are parameters below, and
# cost scales linearly in PQ_M and K_PQ (the codebook stays
# KB-broadcastable far past that).


def _pq_d2(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_model(
    emb: DataFrame, pq_m: int, k_pq: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sub, codebook, codes): the one copy of the PQ training/encode
    math — shared by s13 (flat ADC scan) and s15 (IVF-pruned ADC)."""
    sub_dim = DIM // pq_m
    slices = F.array(
        *[
            F.transform(
                F.slice("embedding", m * sub_dim + 1, sub_dim),
                lambda x: x.cast("double"),
            )
            for m in range(pq_m)
        ]
    )
    sub = emb.select("vec_id", F.posexplode(slices).alias("m", "sv"))

    def assign(codebook: DataFrame) -> DataFrame:
        # argmin via min-of-struct (the g06/r14 sort-removal): (d2,
        # cid) is UNIQUE per (vec_id, m) — cid is unique within a
        # codebook — so the lexicographic struct min is exactly the
        # row_number()==1 row under (d2 asc, cid asc); sv never
        # participates in the comparison. A hash aggregate with
        # map-side partial combining replaces the full partition sort
        # the window paid per encode pass (guide §2.2).
        return (
            sub.join(F.broadcast(codebook), "m")
            .select(
                "vec_id",
                "m",
                F.struct(
                    _pq_d2("sv", "c").alias("d2"),
                    F.col("cid").alias("cid"),
                    F.col("sv").alias("sv"),
                ).alias("s"),
            )
            .groupBy("vec_id", "m")
            .agg(F.min("s").alias("s"))
            .select(
                "vec_id",
                "m",
                F.col("s.sv").alias("sv"),
                F.col("s.cid").alias("cid"),
                F.col("s.d2").alias("d2"),
            )
        )

    seeds = sub.filter(F.col("vec_id") < k_pq).select(
        "m", F.col("vec_id").cast("int").alias("cid"), F.col("sv").alias("c")
    )
    a1 = assign(seeds)
    cd = (
        a1.select("m", "cid", F.posexplode("sv").alias("dim", "v"))
        .groupBy("m", "cid", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
    )
    codebook = (
        cd.groupBy("m", "cid")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cv"))).alias("s"))
        .select("m", "cid", F.transform("s", lambda x: x["cv"]).alias("c"))
        .transform(stage_boundary)
    )
    codes = assign(codebook).select("vec_id", "m", F.col("cid").alias("code"))
    return sub, codebook, codes


# Session memo of the trained PQ model over the stock embeddings (the
# _graph_shared / _doc_shingles_cached idiom): s13 and s15 train the
# identical codebook and encode the identical codes, so within a
# session the k-means-style training pass runs ONCE. Keyed on
# (embeddings fingerprint, pq params, session identity); pure sharing,
# results unchanged. pipeline/ann_index keeps its direct _pq_model
# call (it encodes arbitrary corpora, not the stock table).
_PQ_MODEL_CACHE: dict[tuple, tuple[SparkSession, tuple]] = {}


def _pq_model_cached(
    spark: SparkSession, sf_dir: str, pq_m: int, k_pq: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    from rfb_data_pipeline_spark.memo import session_memo

    def _build() -> tuple[DataFrame, DataFrame, DataFrame]:
        emb = _emb(spark, sf_dir).select("vec_id", "label", "embedding")
        sub, codebook, codes = _pq_model(emb, pq_m, k_pq)
        return sub, codebook, codes.transform(stage_boundary)

    return session_memo(
        _PQ_MODEL_CACHE,
        spark,
        sf_dir,
        ("embeddings",),
        _build,
        extra=(pq_m, k_pq),
    )


def s13_pq_ann(
    spark: SparkSession,
    sf_dir: str,
    pq_m: int = PQ_M,
    k_pq: int = K_PQ,
    query_vec_id: int = QUERY_VEC_ID,
) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "label", "embedding")
    sub, codebook, codes = _pq_model_cached(spark, sf_dir, pq_m, k_pq)
    q_sub = sub.filter(F.col("vec_id") == query_vec_id).select(
        "m", F.col("sv").alias("qv")
    )
    # distinct column names: adc shares lineage with codes (both built
    # from codebook), so joining on renamed keys avoids the ambiguous-
    # self-join trap
    adc = (
        codebook.join(F.broadcast(q_sub), "m")
        .select(
            F.col("m").alias("am"),
            F.col("cid").alias("acid"),
            _pq_d2("qv", "c").alias("adc_d2"),
        )
    )
    scored = (
        codes.join(
            F.broadcast(adc),
            (F.col("m") == F.col("am")) & (F.col("code") == F.col("acid")),
        )
        .groupBy("vec_id")
        # decimal accumulator: exact => order-independent => the top-k
        # boundary is identical across engines
        .agg(F.sum(F.col("adc_d2").cast("decimal(30,15)")).alias("ad2"))
    )
    return (
        scored.filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.asc("ad2"), F.asc("vec_id"))
        .limit(TOP_K)
        .join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            (F.round(F.col("ad2").cast("double"), 4) + F.lit(0.0)).alias(
                "approx_d2"
            ),
        )
    )


_SQL_SUBD2 = (
    f"list_sum(list_transform(range(1, {PQ_SUB + 1}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)

_S13_SQL = f"""
WITH sub AS (
  SELECT vec_id, u.m AS m,
         list_transform(embedding[u.m * {PQ_SUB} + 1 : (u.m + 1) * {PQ_SUB}],
                        x -> x::DOUBLE) AS sv
  FROM embeddings, unnest(range(0, {PQ_M})) AS u(m)
),
seeds AS (
  SELECT m, vec_id::INTEGER AS cid, sv AS c FROM sub WHERE vec_id < {K_PQ}
),
a1 AS (
  SELECT vec_id, m, sv, cid FROM (
    SELECT s.vec_id, s.m, s.sv, k.cid,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_SQL_SUBD2.format(a="s.sv", b="k.c")} ASC, k.cid ASC
           ) AS rk
    FROM sub s JOIN seeds k USING (m)
  ) WHERE rk = 1
),
cd AS (
  SELECT m, cid, u.i AS dim,
         (sum(sv[u.i]::DECIMAL(20,10)))::DOUBLE / count(*) AS cv
  FROM a1, unnest(range(1, {PQ_SUB + 1})) AS u(i)
  GROUP BY m, cid, u.i
),
codebook AS (SELECT m, cid, list(cv ORDER BY dim) AS c FROM cd GROUP BY m, cid),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT s.vec_id, s.m, k.cid,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_SQL_SUBD2.format(a="s.sv", b="k.c")} ASC, k.cid ASC
           ) AS rk
    FROM sub s JOIN codebook k USING (m)
  ) WHERE rk = 1
),
q_sub AS (SELECT m, sv AS qv FROM sub WHERE vec_id = {QUERY_VEC_ID}),
adc AS (
  SELECT m, cid, {_SQL_SUBD2.format(a="qv", b="c")} AS adc_d2
  FROM codebook JOIN q_sub USING (m)
),
scored AS (
  SELECT vec_id, sum(adc_d2::DECIMAL(30,15)) AS ad2
  FROM codes c JOIN adc a ON c.m = a.m AND c.code = a.cid
  GROUP BY vec_id
)
SELECT s.vec_id, e.label, round(s.ad2::DOUBLE, 4) + 0.0 AS approx_d2
FROM (
  SELECT vec_id, ad2 FROM scored WHERE vec_id != {QUERY_VEC_ID}
  ORDER BY ad2 ASC, vec_id ASC LIMIT {TOP_K}
) s JOIN embeddings e USING (vec_id)
"""


# --------------------------------------------------------------------------
# s14 — embedding validation gate. CONTRACT OF THIS MODULE: the
# cosine operators (s01-s03, s05-s07, s10, s11) require non-NULL,
# DIM-length, non-zero-norm vectors — cosine is undefined on a zero
# vector, and under ANSI arithmetic a single degenerate row would
# kill the whole job (found by the degenerate-embeddings probe,
# tests/test_degenerate_embeddings.py). A real ingest ALWAYS contains
# such rows (failed encoder outputs, padding); this gate is the
# FAISS-style precondition enforced as a first-class audited step:
# count each defect class, and expose the clean-row predicate the
# pipeline filters with before the ANN index is built.
#
# Scale: one pure map over the scan + one tiny aggregate; the norm
# check reuses the same sequential fold as the query-time cosines.


def _bad_element_count() -> Column:
    """Elements that poison cosine math: NULL, NaN, or ±Inf. NaN
    compares greater-than-everything in BOTH engines, so a NaN vector
    would sail through a `norm > 0` check and then rank FIRST in
    every descending top-k — the gate must test finiteness
    element-wise."""
    xd = lambda x: x.cast("double")  # noqa: E731
    return F.size(
        F.filter(
            "embedding",
            lambda x: x.isNull()
            | F.isnan(xd(x))
            | (xd(x) == F.lit(float("inf")))
            | (xd(x) == F.lit(float("-inf"))),
        )
    )


def valid_embedding_pred() -> Column:
    """True iff the row satisfies the cosine operators' precondition:
    non-NULL, DIM elements, every element finite, norm > 0."""
    return (
        F.col("embedding").isNotNull()
        & (F.size("embedding") == DIM)
        & (_bad_element_count() == 0)
        & (_dot("embedding", "embedding") > 0)
    )


def s14_embedding_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutually exclusive defect classes that PARTITION n_vectors:
    null → wrong_dim → non_finite (NULL/NaN/Inf elements) →
    zero_norm → valid. An audit whose classes don't sum to the total
    hides defects."""
    emb = _emb(spark, sf_dir)
    is_null = F.col("embedding").isNull()
    wrong_dim = ~is_null & (F.size("embedding") != DIM)
    non_finite = ~is_null & ~wrong_dim & (_bad_element_count() > 0)
    zero_norm = (
        ~is_null
        & ~wrong_dim
        & ~non_finite
        & (_dot("embedding", "embedding") == 0)
    )
    valid = F.coalesce(valid_embedding_pred(), F.lit(False))
    return emb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(is_null.cast("int")).alias("n_null"),
        F.sum(wrong_dim.cast("int")).alias("n_wrong_dim"),
        F.sum(non_finite.cast("int")).alias("n_non_finite"),
        F.sum(zero_norm.cast("int")).alias("n_zero_norm"),
        F.sum(valid.cast("int")).alias("n_valid"),
    )


_SQL_BADELEM = (
    "len(list_filter(embedding, x -> x IS NULL OR isnan(x::DOUBLE)"
    " OR isinf(x::DOUBLE)))"
)

_S14_SQL = f"""
SELECT count(*) AS n_vectors,
       CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) != {DIM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
       CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = {DIM}
                     AND {_SQL_BADELEM} > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_non_finite,
       CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = {DIM}
                     AND {_SQL_BADELEM} = 0
                     AND {_SQL_DOT.format(a="embedding", b="embedding")} = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = {DIM}
                     AND {_SQL_BADELEM} = 0
                     AND {_SQL_DOT.format(a="embedding", b="embedding")} > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
FROM embeddings
"""


# --------------------------------------------------------------------------
# s15 — IVF-PQ: the production ANN architecture proper (Jégou et al.
# 2011; the FAISS default at 1e9+ vectors), composed from the two
# halves this module already ships with ONE copy of each: s05's
# coarse quantizer prunes the scan to the top-NPROBE cells
# (_ivf_probe_cells), s13's product quantizer shrinks what that scan
# reads to PQ_M code bytes per vector (_pq_model), and ADC scores
# only the surviving codes. At 100 TB: cells are the partition key
# (pipeline/ann_index.write_ivf_index's layout), codes are the
# payload — the probe reads nprobe/ncells of a table that is itself
# ~85× smaller than the float corpus.
#
# Determinism: the probe LIMIT is the s05 shape (tie-broken on
# label); the ADC sum is s13's decimal accumulator.


def s15_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select("vec_id", "label", "embedding")
    probe = _ivf_probe_cells(emb)
    sub, codebook, codes = _pq_model_cached(spark, sf_dir, PQ_M, K_PQ)
    q_sub = sub.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        "m", F.col("sv").alias("qv")
    )
    adc = codebook.join(F.broadcast(q_sub), "m").select(
        F.col("m").alias("am"),
        F.col("cid").alias("acid"),
        _pq_d2("qv", "c").alias("adc_d2"),
    )
    in_cells = emb.join(F.broadcast(probe.select("label")), "label").select(
        "vec_id", "label"
    )
    scored = (
        codes.join(in_cells, "vec_id")
        .join(
            F.broadcast(adc),
            (F.col("m") == F.col("am")) & (F.col("code") == F.col("acid")),
        )
        .groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.sum(F.col("adc_d2").cast("decimal(30,15)")).alias("ad2"),
        )
    )
    return (
        scored.filter(F.col("vec_id") != QUERY_VEC_ID)
        .orderBy(F.asc("ad2"), F.asc("vec_id"))
        .limit(TOP_K)
        .select(
            "vec_id",
            "label",
            (F.round(F.col("ad2").cast("double"), 4) + F.lit(0.0)).alias(
                "approx_d2"
            ),
        )
    )


_S15_SQL = f"""
WITH {_SQL_IVF_PROBE},
sub AS (
  SELECT vec_id, u.m AS m,
         list_transform(embedding[u.m * {PQ_SUB} + 1 : (u.m + 1) * {PQ_SUB}],
                        x -> x::DOUBLE) AS sv
  FROM embeddings, unnest(range(0, {PQ_M})) AS u(m)
),
seeds AS (
  SELECT m, vec_id::INTEGER AS cid, sv AS c FROM sub WHERE vec_id < {K_PQ}
),
a1 AS (
  SELECT vec_id, m, sv, cid FROM (
    SELECT s.vec_id, s.m, s.sv, k.cid,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_SQL_SUBD2.format(a="s.sv", b="k.c")} ASC, k.cid ASC
           ) AS rk
    FROM sub s JOIN seeds k USING (m)
  ) WHERE rk = 1
),
cd AS (
  SELECT m, cid, u.i AS dim,
         (sum(sv[u.i]::DECIMAL(20,10)))::DOUBLE / count(*) AS cv
  FROM a1, unnest(range(1, {PQ_SUB + 1})) AS u(i)
  GROUP BY m, cid, u.i
),
codebook AS (SELECT m, cid, list(cv ORDER BY dim) AS c FROM cd GROUP BY m, cid),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT s.vec_id, s.m, k.cid,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_SQL_SUBD2.format(a="s.sv", b="k.c")} ASC, k.cid ASC
           ) AS rk
    FROM sub s JOIN codebook k USING (m)
  ) WHERE rk = 1
),
q_sub AS (SELECT m, sv AS qv FROM sub WHERE vec_id = {QUERY_VEC_ID}),
adc AS (
  SELECT m, cid, {_SQL_SUBD2.format(a="qv", b="c")} AS adc_d2
  FROM codebook JOIN q_sub USING (m)
),
scored AS (
  SELECT c.vec_id, any_value(e.label) AS label,
         sum(adc_d2::DECIMAL(30,15)) AS ad2
  FROM codes c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN probe p ON e.label = p.label
  JOIN adc a ON c.m = a.m AND c.code = a.cid
  GROUP BY c.vec_id
)
SELECT vec_id, label, round(ad2::DOUBLE, 4) + 0.0 AS approx_d2
FROM scored
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY ad2 ASC, vec_id ASC
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
# s16 — ANN recall audit as a driver row: recall@K of the production
# LSH probe (s02's bucket family) against the exact baseline over a
# deterministic BATCH of query vectors (vec_id % RECALL_QUERY_MOD), as
# one aggregate row both engines compute END TO END — unlike the
# q24/q33 sketch verdicts, nothing here is pinned: the DuckDB twin
# rebuilds the same bucket index (bit-identical hyperplane folds, see
# _sql_buckets_cte) and the same exact top-K, so a recall regression
# from ANY cause (hyperplane drift, bucket-join bug, ranking-order
# skew, candidate loss) breaks the value hash, not just a pytest.
#
# Scale contract: the exact tier is the AUDIT (Q sampled queries ×
# corpus — linear in the corpus per query, run on a BOUNDED panel of
# at most RECALL_PANEL_CAP queries, the s03 contract); the production
# serving path is the bucket probe alone. At 100 TB the audit runs
# the fixed panel against the materialized (t, bucket) index, and
# recall_ge_floor is the gate a retuning of (num_tables, sign_bits)
# must keep green (the s06 sf1 scale note: recall must be re-measured
# when retuning occupancy). The gate BINDS: the r09 bits-only retune
# (16, 9) measured 0.22 on the 10x fixture — below floor, rejected —
# while the corrected (32, 9) point measures 0.43 (see the s06
# retuning note).

RECALL_QUERY_MOD = 31
# The panel is CAPPED (vec_id % MOD == 0 AND vec_id < MOD*CAP): 17
# queries at sf0.01, 64 at sf0.1, never more — without the cap the
# panel (and the audit's cost and the scoring closure) would grow
# linearly with the corpus instead of being a control-plane constant.
RECALL_PANEL_CAP = 64
# floor = 1/4: measured mean recall@10 is 0.51-0.61 across sf0.001/
# 0.01/0.1 at (16 tables, 6 bits); a crippled index (2 tables)
# measures 0.12 — the verdict genuinely separates the two regimes.
RECALL_FLOOR_NUM, RECALL_FLOOR_DEN = 1, 4


def _panel_pred() -> Column:
    return (F.col("vec_id") % RECALL_QUERY_MOD == 0) & (
        F.col("vec_id") < RECALL_QUERY_MOD * RECALL_PANEL_CAP
    )


def _panel_cos_udf(qmat: "np.ndarray"):
    """Arrow-batched scorer: embedding → [raw cosine vs each of the
    ≤RECALL_PANEL_CAP panel vectors]. The per-pair Catalyst fold
    measured ~10 µs/pair interpreted (2.6 s for the sf0.1 audit); one
    vectorized batch does the same math in microseconds — the s03
    justification verbatim. Accumulation is SEQUENTIAL over dims in
    float64 (vectorized across rows/queries), the exact operation
    order of Spark's ``aggregate`` fold and the DuckDB twin's
    list_sum, so cosines are bit-identical across all three forms."""
    nq = np.zeros(qmat.shape[0])
    for d in range(DIM):
        nq += qmat[:, d] * qmat[:, d]
    if np.any(nq == 0.0) or not np.isfinite(nq).all():
        raise ValueError(
            "zero-norm or non-finite panel embedding reached "
            "ann_recall; gate with s14/valid_embedding_pred"
        )
    nq = np.sqrt(nq)

    @F.pandas_udf("array<double>")
    def panel_cos(emb_s: pd.Series) -> pd.Series:
        vecs = emb_s.to_numpy()
        if any(v is None for v in vecs):
            raise ValueError(
                "NULL embedding reached ann_recall; gate with "
                "s14/valid_embedding_pred"
            )
        try:
            m = np.stack(vecs).astype(np.float64)
        except ValueError as exc:  # ragged (wrong-dim) input
            raise ValueError(
                "wrong-dim embedding reached ann_recall; gate with "
                "s14/valid_embedding_pred"
            ) from exc
        dots = np.zeros((m.shape[0], qmat.shape[0]))
        ne = np.zeros(m.shape[0])
        for d in range(DIM):  # sequential over dims == engines' fold
            dots += m[:, d : d + 1] * qmat[None, :, d]
            ne += m[:, d] * m[:, d]
        if np.any(ne == 0.0) or not np.isfinite(ne).all():
            raise ValueError(
                "zero-norm or non-finite embedding reached ann_recall; "
                "gate with s14/valid_embedding_pred"
            )
        cos = dots / (np.sqrt(ne)[:, None] * nq[None, :])
        return pd.Series(list(cos))

    return panel_cos


def ann_recall(
    spark: SparkSession,
    sf_dir: str,
    num_tables: int = NUM_TABLES,
    sign_bits: int = SIGN_BITS,
    floor_num: int = RECALL_FLOOR_NUM,
    floor_den: int = RECALL_FLOOR_DEN,
) -> DataFrame:
    from rfb_data_pipeline_spark.session import ship_package

    ship_package(spark)
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    # Bounded control-plane collect (≤ RECALL_PANEL_CAP rows, the
    # K-centroids idiom): the panel matrix ships to workers as the
    # scorer's closure instead of riding every pair through a join.
    panel = emb.filter(_panel_pred()).orderBy("vec_id").collect()
    if panel:
        if any(
            r.embedding is None or len(r.embedding) != DIM for r in panel
        ):
            raise ValueError(
                "NULL or wrong-dim panel embedding reached ann_recall; "
                "gate with s14/valid_embedding_pred"
            )
        qids = [int(r.vec_id) for r in panel]
        qmat = np.array(
            [r.embedding for r in panel], dtype=np.float64
        ).reshape(len(panel), DIM)
        qid_arr = F.array(*[F.lit(q).cast("long") for q in qids])
        # ONE Arrow pass scores every (corpus row, panel query) pair;
        # both tiers below rank slices of this frame.
        scored = (
            emb.select(
                "vec_id",
                F.posexplode(_panel_cos_udf(qmat)("embedding")).alias(
                    "pos", "raw"
                ),
            )
            .select(
                F.element_at(qid_arr, F.col("pos") + 1).alias("qid"),
                "vec_id",
                (F.round(F.col("raw"), 4) + F.lit(0.0)).alias("cosine"),
            )
            .filter(F.col("vec_id") != F.col("qid"))
        )
    else:  # degenerate corpus with no panel vectors: empty audit
        scored = emb.select(
            F.col("vec_id").alias("qid"), "vec_id", F.lit(0.0).alias("cosine")
        ).filter(F.lit(False))
    # Both tiers below rank slices of `scored`; without a boundary the
    # plan inlines the Q×N Arrow scorer into BOTH consumers and the
    # corpus is scored twice (verified: two ArrowEvalPython nodes,
    # zero ReusedExchange). Materialize once, the repo's idiom for
    # multiply-referenced expensive frames.
    scored = stage_boundary(scored)
    rank_w = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id")
    )
    # ANN top-K per query: candidates ONLY from shared (t, bucket)
    # cells — the partition-pruned probe, never a corpus scan. The
    # join carries IDS ONLY; scores come from the shared frame above.
    buckets = emb.select(
        "vec_id",
        F.posexplode(
            _bucket_udf(num_tables, sign_bits)("embedding")
        ).alias("t", "bucket"),
    )
    # The panel's bucket keys come straight from the collected panel
    # matrix — same float64 dim-ordered accumulation as _bucket_udf,
    # so the keys are bit-identical to what a corpus-side pass would
    # produce, without re-scanning the corpus for 64 rows.
    if panel:
        hp = _hyperplanes(num_tables, sign_bits)
        w = np.array(hp, dtype=np.float64).reshape(
            num_tables * sign_bits, DIM
        )
        acc = np.zeros((qmat.shape[0], w.shape[0]))
        for i in range(DIM):
            acc += qmat[:, i : i + 1] * w[None, :, i]
        powers = (1 << np.arange(sign_bits)).astype(np.int64)
        qbk = (
            (acc >= 0).reshape(-1, num_tables, sign_bits) * powers
        ).sum(axis=2)
        qb_rows = [
            (qids[r], t, int(qbk[r, t]))
            for r in range(len(qids))
            for t in range(num_tables)
        ]
    else:
        qb_rows = []
    qb = spark.createDataFrame(
        qb_rows, "qid bigint, qt int, qbucket int"
    )
    cand = (
        buckets.join(
            F.broadcast(qb),
            (F.col("t") == F.col("qt"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id")
        .distinct()
    )
    ann = (
        scored.join(cand, ["qid", "vec_id"])
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id")
    )
    hits = exact.join(ann, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("overlap")
    )
    # The per-query spine comes from the already-collected panel ids —
    # a third corpus scan for ≤64 rows would be pure waste, and the
    # spine agrees with the scored panel by construction.
    per_q = (
        spark.createDataFrame([(q,) for q in qids] if panel else [],
                              "qid bigint")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("overlap"), F.lit(0)).cast("long").alias(
                "overlap"
            ),
        )
    )
    n_q = F.count(F.lit(1))
    s_ov = F.sum("overlap")
    return per_q.agg(
        n_q.alias("n_queries"),
        F.lit(TOP_K).cast("long").alias("k"),
        s_ov.alias("sum_overlap"),
        F.min("overlap").alias("min_overlap"),
        (F.round(s_ov / (n_q * F.lit(TOP_K)), 4) + F.lit(0.0)).alias(
            "mean_recall"
        ),
        (
            s_ov * F.lit(floor_den) >= n_q * F.lit(TOP_K * floor_num)
        ).alias("recall_ge_floor"),
    )


def s16_ann_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_recall(spark, sf_dir)


def _s16_sql() -> str:
    dot = _SQL_DOT.format(a="embedding", b="q")
    na = _SQL_DOT.format(a="embedding", b="embedding")
    nq = _SQL_DOT.format(a="q", b="q")
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS q FROM embeddings
  WHERE vec_id % {RECALL_QUERY_MOD} = 0
    AND vec_id < {RECALL_QUERY_MOD * RECALL_PANEL_CAP}
),
scored AS (
  SELECT qid, embeddings.vec_id,
         round({dot} / (sqrt({na}) * sqrt({nq})), 4) + 0.0 AS cosine
  FROM embeddings, q WHERE embeddings.vec_id != qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (
      PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS r
    FROM scored
  ) WHERE r <= {TOP_K}
),
buckets AS ({_sql_buckets_cte(NUM_TABLES, SIGN_BITS)}),
qb AS (
  SELECT vec_id AS qid, embedding AS q, t AS qt, bucket AS qbucket
  FROM buckets WHERE vec_id % {RECALL_QUERY_MOD} = 0
    AND vec_id < {RECALL_QUERY_MOD * RECALL_PANEL_CAP}
),
cand AS (
  SELECT qid, b.vec_id,
         any_value(b.embedding) AS embedding, any_value(qb.q) AS q
  FROM buckets b
  JOIN qb ON b.t = qb.qt AND b.bucket = qb.qbucket AND b.vec_id != qb.qid
  GROUP BY qid, b.vec_id
),
ann_scored AS (
  SELECT qid, vec_id,
         round({dot} / (sqrt({na}) * sqrt({nq})), 4) + 0.0 AS cosine
  FROM cand
),
ann AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, row_number() OVER (
      PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS r
    FROM ann_scored
  ) WHERE r <= {TOP_K}
),
hits AS (
  SELECT exact.qid, count(*) AS n FROM exact JOIN ann USING (qid, vec_id)
  GROUP BY exact.qid
),
per_q AS (
  SELECT q.qid, coalesce(hits.n, 0) AS overlap
  FROM q LEFT JOIN hits ON q.qid = hits.qid
)
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST({TOP_K} AS BIGINT) AS k,
       CAST(sum(overlap) AS BIGINT) AS sum_overlap,
       CAST(min(overlap) AS BIGINT) AS min_overlap,
       round(sum(overlap)::DOUBLE / (count(*) * {TOP_K}), 4) + 0.0
         AS mean_recall,
       (sum(overlap) * {RECALL_FLOOR_DEN}
        >= count(*) * {TOP_K * RECALL_FLOOR_NUM}) AS recall_ge_floor
FROM per_q
"""


QUERIES = {
    "s01_knn_bruteforce": s01_knn_bruteforce,
    "s02_ann_lsh": s02_ann_lsh,
    "s03_near_dup_pairs": s03_near_dup_pairs,
    "s04_label_centroids": s04_label_centroids,
    "s05_ann_ivf": s05_ann_ivf,
    "s06_near_dup_pairs_banded": s06_near_dup_pairs_banded,
    "s07_quantized_knn": s07_quantized_knn,
    "s08_kmeans_lloyd": s08_kmeans_lloyd,
    "s09_vector_stats": s09_vector_stats,
    "s10_semantic_dedup": s10_semantic_dedup,
    "s11_batch_knn": s11_batch_knn,
    "s12_embedding_outliers": s12_embedding_outliers,
    "s13_pq_ann": s13_pq_ann,
    "s14_embedding_validation": s14_embedding_validation,
    "s15_ivf_pq_ann": s15_ivf_pq_ann,
    "s16_ann_recall_verdict": s16_ann_recall_verdict,
}

ORACLE = {
    "s01_knn_bruteforce": _S01_SQL,
    "s02_ann_lsh": _S02_SQL,
    "s03_near_dup_pairs": _S03_SQL,
    "s04_label_centroids": _S04_SQL,
    "s05_ann_ivf": _S05_SQL,
    "s06_near_dup_pairs_banded": _S06_SQL,
    "s07_quantized_knn": _S07_SQL,
    "s08_kmeans_lloyd": _S08_SQL,
    "s09_vector_stats": _S09_SQL,
    "s10_semantic_dedup": _S10_SQL,
    "s11_batch_knn": _s11_sql(),
    "s12_embedding_outliers": _S12_SQL,
    "s13_pq_ann": _S13_SQL,
    "s14_embedding_validation": _S14_SQL,
    "s15_ivf_pq_ann": _S15_SQL,
    "s16_ann_recall_verdict": _s16_sql(),
}
