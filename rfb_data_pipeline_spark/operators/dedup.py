"""Document deduplication operators (north-star surface, BASELINE.json).

Four tiers, from cheap/exact to fuzzy/scalable:

- d01 exact: hash-groupBy on a normalized fingerprint — one shuffle.
- d02 n-gram Jaccard: exact pairwise similarity via the exploded-
  shingle join (the standard inverted-index pattern). Exact but
  quadratic in docs sharing a shingle — the verifier of record at
  small scale and for LSH candidates at large scale.
- d03 MinHash + LSH: signatures from k md5 hashes, banded into
  buckets; candidate pairs share a band, then exact-Jaccard verified.
  This is the 100 TB path: cost ~ O(docs × k + candidates), never
  all-pairs. md5 (not Spark's hash()) keeps the oracle engine-portable.
- d04/d05 SimHash: 16-bit weighted fingerprint + Hamming-distance
  pairing; at scale the pairing is banded on fingerprint prefix rather
  than the all-pairs join used here for verification.

Everything is built-in expressions (split / transform / array_min /
md5 / bit ops) — no Python UDFs, so whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.functions.exactround import (
    ratio_round,
    sql_ratio_round,
)
from rfb_data_pipeline_spark.plans.stage import stage_boundary

MINHASH_K = 12  # signature length
MINHASH_BAND_ROWS = 3  # rows per band → 4 bands, LSH threshold ≈ 0.63
JACCARD_THRESHOLD = 0.8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("documents",), register_views=False)[
        "documents"
    ]


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the scan across the cluster when the source has
    fewer splits than cores. The per-token map work downstream (md5,
    bit votes, shingles) parallelizes with INPUT partitions, not
    shuffle partitions — a single small parquet file would otherwise
    run the whole hot map single-threaded. At 100 TB the scan has
    thousands of splits and this is a no-op (guarded on the actual
    partition count, so no gratuitous full-corpus shuffle at scale)."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle) pairs via explode + window lead.

    Deliberately NOT the array-expression form: projection collapse
    would inline the token-split into every element_at call, turning
    one regex split per document into hundreds (measured 10x slowdown).
    Exploding once and composing shingles with lead() keeps the split
    single-execution and every shuffled row narrow.

    The scan is _spread first: the split+explode is the hottest map in
    every shingle consumer (d02/d03/d08/d09), and on a single-split
    source it would run in ONE task before the first shuffle (measured
    ~2x on d03 at sf0.1). No-op when the source already has splits.
    """
    docs = _spread(docs)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.select(
            "doc_id",
            F.concat_ws(
                " ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)
            ).alias("shingle"),
            F.lead("w", 2).over(win).alias("_w2"),
        )
        .filter(F.col("_w2").isNotNull())
        .select("doc_id", "shingle")
        .distinct()
    )


# Session memo of the full-corpus distinct shingle frame (the
# _graph_shared / t15_scores_cached idiom): d02/d03/d08/d09/d12/d16
# all start from the identical (doc_id, shingle) set, so within a
# session (bench, driver correctness pass) the split+explode+lead map
# runs ONCE. Keyed on (documents fingerprint, session identity) so a
# rewritten fixture or restarted SparkContext can never serve a stale
# or dead frame. Pure sharing — logically the same frame, results
# unchanged.
_SHINGLE_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _doc_shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _SHINGLE_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _doc_shingles(_docs(spark, sf_dir)).transform(stage_boundary),
    )


_SHINGLES_SQL = """
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingles
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)
"""

# Document-frequency cap for the EXACT pair tiers (d02/d09): a
# boilerplate shingle with df = 1e6 in a real crawl contributes
# df^2/2 ≈ 5e11 candidate rows to the shingle equi-join — the one
# unbounded term in the exact tier's cost. Dropping shingles with
# df > cap (every production near-dup pipeline's move; cf. MinHashLSH
# maxDF / boilerplate stripping) bounds any one shingle's contribution
# to cap^2/2 pairs while leaving discriminative shingles — and hence
# near-dup recall at the 0.8 threshold — untouched. The cap is
# mirrored in the DuckDB oracles, so the registered Jaccard is the
# capped-set Jaccard in BOTH engines. Measured corpus max df: 7 at
# sf0.01, 25 at sf0.1 — the cap is inert on the test corpora
# (bit-identical results) and only engages on boilerplate skew; the
# skew fixture in tests/test_degenerate_corpus.py pins the bound.
# The banded tiers (d03/d16) don't need it: banding already bounds
# their candidate generation, and their verification joins are keyed
# on (doc_id, shingle), never shingle alone.
SHINGLE_DF_CAP = 100


def _capped_shingles(exploded: DataFrame) -> DataFrame:
    """Drop shingles with document frequency > SHINGLE_DF_CAP.

    The hot set is tiny by construction (only heavy hitters), so it
    broadcasts and the cap costs one small df aggregate plus a
    map-side anti-join — no extra shuffle of the shingle table.
    """
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    return exploded.join(F.broadcast(hot), "shingle", "left_anti")


# Session memo of the CAPPED exploded shingle table (r13): d02 and d09
# each rebuilt — and re-checkpointed per invocation — the identical
# `_capped_shingles(_doc_shingles_cached(...))` frame; within a
# session the cap's df aggregate + anti-join now run once. Pure
# sharing of a logically identical frame; results unchanged.
_CAPPED_SHINGLE_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _capped_shingles_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _CAPPED_SHINGLE_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _capped_shingles(
            _doc_shingles_cached(spark, sf_dir)
        ).transform(stage_boundary),
    )


# Capped exploded-shingle CTEs, shared by the d02/d09 oracle twins.
# DuckDB QUALIFY computes the per-shingle df without a second CTE
# scan; sizes MUST be recomputed from the capped set (not
# len(shingles)) so the Jaccard/containment denominator matches.
_CAPPED_EXPLODED_SQL = f"""
exploded AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(shingles) AS shingle FROM sh
  ) QUALIFY count(*) OVER (PARTITION BY shingle) <= {SHINGLE_DF_CAP}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM exploded GROUP BY doc_id)
"""


# --------------------------------------------------------------------------
# d01 — exact dedup summary over normalized-text fingerprints.


def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    groups = docs.groupBy(fp.alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_distinct_docs"),
        F.sum("n_copies").alias("n_total_docs"),
        F.sum(F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)).alias(
            "n_redundant"
        ),
    )


_D01_SQL = """
SELECT count(*) AS n_distinct_docs,
       CAST(sum(n_copies) AS BIGINT) AS n_total_docs,
       CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_redundant
FROM (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
         count(*) AS n_copies, min(doc_id) AS keep_doc_id
  FROM documents GROUP BY 1
)
"""


# --------------------------------------------------------------------------
# d02 — exact n-gram Jaccard near-dup pairs via exploded-shingle join.


def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The shingle table feeds three plan branches (both join sides +
    # sizes); materialize it once instead of re-scanning/re-shingling
    # per branch. At pipeline scale this is a persisted intermediate
    # table (a stage boundary — stage_boundary's storage mode IS that
    # table; local mode emulates it in-query). Measured 3x on the cold
    # path at sf0.1. The raw table
    # is materialized BEFORE the df-cap so the cap's own df aggregate
    # and anti-join don't re-run the shingle map.
    exploded = _capped_shingles_cached(spark, sf_dir)
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = ratio_round(
        F.col("common"),
        F.col("sz_a") + F.col("sz_b") - F.col("common"),
        4,
     nonneg=True,)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


_D02_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
{_CAPPED_EXPLODED_SQL},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         {sql_ratio_round('common', 'sa.sz + sb.sz - common', 4, nonneg=True)} AS jaccard
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# d03 — MinHash + LSH banding, then exact verification of candidates.


def _minhash_buckets(exploded: DataFrame) -> DataFrame:
    """(doc_id, band_idx, bucket) from the exploded shingle table —
    the ONE copy of the signature+banding math, shared by d03
    (intra-corpus pairs) and d16 (batch-vs-index incremental dedup).

    Signature: MINHASH_K independent hash orderings approximated by
    md5 with a seed prefix; the min hex digest per doc is the
    min-hash. One narrow shuffle on doc_id aggregates the signature.
    """
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
            for j in range(MINHASH_K)
        ]
    )
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    f"h{b * MINHASH_BAND_ROWS + r}"
                    for r in range(MINHASH_BAND_ROWS)
                ],
            )
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    return sig.select("doc_id", *band_cols).select(
        "doc_id",
        F.posexplode(F.array(*[f"band{b}" for b in range(n_bands)])).alias(
            "band_idx", "bucket"
        ),
    )


# Session memo of the banded MinHash bucket table (r13): the
# signature aggregate (MINHASH_K md5-min orderings over the full
# shingle table — the hot map of the LSH tier) was recomputed on
# every invocation of d03, d15 (via d03) and d16. One build per
# session now; logically the identical frame, results unchanged.
_MINHASH_BUCKET_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _minhash_buckets_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _MINHASH_BUCKET_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _minhash_buckets(
            _doc_shingles_cached(spark, sf_dir)
        ).transform(stage_boundary),
    )


def d03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialized once — reused by the signature, the verification
    # join (both sides), and the size aggregate (see d02 note).
    exploded = _doc_shingles_cached(spark, sf_dir)
    buckets = _minhash_buckets_cached(spark, sf_dir)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact-Jaccard verification of candidates via the inverted index —
    # rows stay narrow (no shingle arrays cross a shuffle).
    sh_a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle").alias("shingle")
    )
    sh_b = exploded.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle")
    )
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = ratio_round(
        F.col("common"),
        F.col("sz_a") + F.col("sz_b") - F.col("common"),
        4,
     nonneg=True,)
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _minhash_sql() -> str:
    hs = ",\n         ".join(
        f"list_min(list_transform(shingles, x -> md5('{j}|' || x))) AS h{j}"
        for j in range(MINHASH_K)
    )
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    bands = ",\n         ".join(
        "md5("
        + " || '|' || ".join(
            f"h{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
        )
        + f") AS band{b}"
        for b in range(n_bands)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS bucket FROM banded"
        for b in range(n_bands)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id, shingles,
         {hs}
  FROM sh WHERE len(shingles) > 0
),
banded AS (
  SELECT doc_id,
         {bands}
  FROM sig
),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         {sql_ratio_round('len(list_intersect(sa.shingles, sb.shingles))', 'len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))', 4, nonneg=True)} AS jaccard
  FROM cand
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id
)
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# d04 — SimHash fingerprint (32-bit, token-frequency weighted): bit i
# of md5(token) votes ±1; fingerprint bit set where the vote is
# positive. Near-identical docs land within small Hamming distance.


def _simhash_words_df(
    spark: SparkSession, sf_dir: str, words: tuple[tuple[str, int], ...]
) -> DataFrame:
    """(doc_id, <word>…): one 32-bit fingerprint column per
    (name, nibble_bit) spec, all from the SAME md5 votes — the single
    copy of the bit math behind the 32-bit (d04/d05, nibble bit 3) and
    64-bit hi/lo (bits 2+3) fingerprints, so the widths cannot drift.

    Bit votes run PER OCCURRENCE in one codegen'd map (md5 + nibble
    tests per token) straight into the keyed aggregate's map-side
    partials — one shuffle, no join, no distinct. A vocabulary-level
    variant (hash distinct tokens once, broadcast-join the ±1 vectors
    back) was faster when the post-shuffle stages ran coalesced
    (round 1), but with full stage parallelism the extra vocab shuffle
    + broadcast costs more than the repeated md5s (1.5s vs 2.3s at
    sf0.1, bit-identical results — a vote per occurrence equals the
    occurrence-weighted vocab vote). The per-occurrence form also has
    no broadcast size cliff at web scale.

    Bit extraction is integer math, not string ops: the 32-hex-char
    digest becomes four 32-bit ints (one conv per 8-char chunk), and
    nibble i's bit ``b`` is (chunk >> ((7 - i%8)*4 + b)) & 1.
    Replacing substring+isin string comparisons per token with 4
    convs + shifts measured 2.3x on this stage at sf0.1,
    bit-identical.
    """
    docs = _spread(_docs(spark, sf_dir))
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    h = F.md5("w")
    chunks = [
        F.conv(F.substring(h, 8 * j + 1, 8), 16, 10).cast("long").alias(f"c{j}")
        for j in range(4)
    ]
    tokc = tok.select("doc_id", *chunks)
    votes = []
    for name, bitoff in words:
        for i in range(32):
            j, k = divmod(i, 8)
            bitpos = (7 - k) * 4 + bitoff
            votes.append(
                (
                    F.shiftrightunsigned(F.col(f"c{j}"), bitpos).bitwiseAND(
                        F.lit(1)
                    )
                    * 2
                    - 1
                ).alias(f"b_{name}{i}")
            )
    bits = tokc.select("doc_id", *votes)
    agg = bits.groupBy("doc_id").agg(
        *[
            F.sum(f"b_{name}{i}").alias(f"s_{name}{i}")
            for name, _ in words
            for i in range(32)
        ]
    )
    out = []
    for name, _ in words:
        fp = None
        for i in range(32):
            term = F.when(F.col(f"s_{name}{i}") > 0, F.lit(1 << i)).otherwise(0)
            fp = term if fp is None else fp + term
        out.append(fp.cast("long").alias(name))
    return agg.select("doc_id", *out)


# Session memo of the 32-bit fingerprint frame shared by d04 (the
# fingerprint report itself) and d05 (the banded pair join) — the
# _doc_shingles_cached idiom; fingerprint-keyed, results unchanged.
_SIMHASH_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _SIMHASH_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _simhash_words_df(
            spark, sf_dir, (("simhash", 3),)
        ).transform(stage_boundary),
    )


def d04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_df(spark, sf_dir)


_SIMHASH_CTE = """
  SELECT doc_id,
         {fp} AS simhash
  FROM (
    SELECT doc_id,
           {votes}
    FROM (SELECT doc_id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h
          FROM documents)
    GROUP BY doc_id
  )
""".format(
    votes=",\n           ".join(
        "sum(CASE WHEN substring(h, {p}, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{i}".format(
            p=i + 1, i=i
        )
        for i in range(32)
    ),
    fp=" + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
    ),
)

_D04_SQL = f"SELECT doc_id, CAST(simhash AS BIGINT) AS simhash FROM ({_SIMHASH_CTE})"


# --------------------------------------------------------------------------
# d05 — SimHash near-dup pairs (Hamming ≤ 2) via byte-pigeonhole
# banding. Hamming ≤ 2 over a 32-bit fingerprint means at most 2 of
# the 4 bytes can differ, so every qualifying pair shares at least one
# identical (byte_idx, byte_val) — candidates come from an EQUI-join
# on that key (bucketed shuffle, no cartesian), then the exact
# bit_count(xor) check verifies. Cost ~ O(docs x 4 + candidates); at
# 100 TB the banded table is written bucketed by (byte_idx, byte_val)
# so the candidate join is co-located. The all-pairs formulation
# survives only as the DuckDB oracle / pytest cross-check.


def d05_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FINGERPRINT WIDTH MUST GROW WITH THE CORPUS (tools/scale_check.py
    # measurement, r04): with 32-bit fingerprints, random hamming-≤3
    # collisions occur at rate ~(1+32+496+4960)/2^32 ≈ 1.3e-6 per pair,
    # so beyond ~10^5 docs RANDOM pairs dominate true near-dups
    # (measured: 0.6M docs → 1.25M pairs, mostly noise; bytes grew
    # 1 : 8.3 : 20.7 at 1x/3x/10x). Sizing rule: pick the width so
    # C(N,2) · P(hamming ≤ H | random) stays ≪ the expected true-pair
    # count — 64-bit fingerprints (P ≈ 2.4e-15) cover any realistic
    # corpus; the byte-pigeonhole banding below generalizes unchanged
    # (H+1 bands of width/(H+1) bits each). 32-bit is kept here
    # because the oracle twin pins the exact constant; the algorithm
    # is width-generic.
    #
    # The memoized fingerprint frame is already stage-bounded, so it
    # feeds both join sides without re-running the doc scan + votes.
    sim = _simhash_df(spark, sf_dir)
    return _banded_hamming_pairs(sim, ("simhash",))


def _banded_hamming_pairs(
    sim: DataFrame, fp_cols: tuple[str, ...], max_hamming: int = 2
) -> DataFrame:
    """Byte-pigeonhole candidate join + exact Hamming verify over any
    number of 32-bit fingerprint words — the one copy of the d05 pair
    shape, shared by the 32-bit and 64-bit widths.

    Verify BEFORE deduplicating: a qualifying pair shares >= 2 bytes
    so it surfaces from >= 2 buckets, but the bit_count filter is a
    per-row map while distinct() is a shuffle — running the filter
    first shrinks the distinct's input from the full candidate set
    (quadratic within skewed buckets) to just the true pairs
    (measured 3x on this stage at sf0.1).
    """
    byte_of = [
        F.shiftrightunsigned(F.col(c), 8 * i).bitwiseAND(F.lit(255))
        for c in fp_cols
        for i in range(4)
    ]
    banded = sim.select(
        "doc_id",
        *fp_cols,
        F.posexplode(F.array(*byte_of)).alias("byte_idx", "byte_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"{c}_a") for c in fp_cols],
        "byte_idx",
        "byte_val",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"{c}_b") for c in fp_cols],
        "byte_idx",
        "byte_val",
    )
    ham = None
    for c in fp_cols:
        term = F.bit_count(F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b")))
        ham = term if ham is None else ham + term
    return (
        a.join(b, ["byte_idx", "byte_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


_D05_SQL = f"""
WITH sim AS ({_SIMHASH_CTE})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) <= 2
"""


# --------------------------------------------------------------------------
# 64-bit SimHash (the d05 docstring's sizing rule, realized): random
# hamming-≤2 collisions at 64 bits occur at ~(1+64+2016)/2^64 ≈
# 1.1e-16 per pair — negligible for any realistic corpus, where the
# 32-bit rate (~1.3e-6) drowns true pairs past ~1e5 docs (measured,
# tools/scale_check.py). The fingerprint is TWO 32-bit words (hi from
# nibble bit 2, lo from nibble bit 3 of the same md5 — 64 independent
# bits) because a single signed long cannot carry bit 63 under ANSI
# arithmetic; banding generalizes to the 8 bytes across both words
# (hamming ≤ 2 ⇒ ≥ 6 identical bytes ⇒ equi-join candidates, exactly
# the d05 shape). Not driver-registered — the 32-bit oracle twin pins
# the exact constant; this variant is pinned by an exact Python-model
# parity test plus the measured noise-collapse test.


def _simhash_wide_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_words_df(spark, sf_dir, (("hi", 2), ("lo", 3)))


def simhash_pairs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d05 at 64-bit width: same byte-pigeonhole banding over the
    8 bytes of (hi, lo), same verify-before-distinct ordering — both
    via the shared helpers, so the widths cannot drift."""
    sim = _simhash_wide_df(spark, sf_dir).transform(stage_boundary)
    return _banded_hamming_pairs(sim, ("hi", "lo"))


# --------------------------------------------------------------------------
# d06 — incremental (cross-snapshot) dedup: dedup a NEW crawl batch
# against the EXISTING corpus without re-deduping the corpus itself —
# the shape every recurring ingestion runs. Here the corpus/batch
# split is the deterministic x01-style halves of ``documents`` (doc_id
# parity stands in for snapshot id; the operator's contract is the
# join shape, not the split rule). One fingerprint map per side + one
# anti-join shuffle on the fingerprint key — at 100 TB the corpus side
# reads a pre-materialized fingerprint index, never the full text.


def d06_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    corpus = docs.filter(F.col("doc_id") % 2 == 0).select(fp.alias("fingerprint"))
    batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", fp.alias("fingerprint")
    )
    fresh = batch.join(
        corpus.distinct(), "fingerprint", "left_anti"
    )
    return fresh.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.countDistinct("fingerprint").alias("n_new_distinct"),
        F.min("doc_id").alias("first_new_doc"),
    )


_D06_SQL = """
WITH fps AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
corpus AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id % 2 = 0),
batch AS (SELECT * FROM fps WHERE doc_id % 2 = 1)
SELECT source, count(*) AS n_new_docs,
       count(DISTINCT fingerprint) AS n_new_distinct,
       min(doc_id) AS first_new_doc
FROM batch ANTI JOIN corpus USING (fingerprint)
GROUP BY source
"""


# --------------------------------------------------------------------------
# d07 — near-dup CLUSTER formation: connected components over the
# verified near-dup pairs (d02), i.e. the step that turns pairwise
# similarity into "keep one representative per cluster". Iterative
# min-label propagation: each round every node adopts the smallest
# label among itself and its neighbours — a join + groupBy(min) per
# round, converging in <= graph-diameter rounds (near-dup clusters are
# tiny and dense, so 2-3 rounds in practice; MAX_CC_ITERS guards the
# pathological chain). Each round localCheckpoints to cut lineage —
# the standard iterative-Spark discipline; at 100 TB the same loop
# runs large-star/small-star (O(log n) rounds) with the label table
# persisted between rounds. The per-round fixpoint count() is a
# control-plane action on the label table, not a data-plane collect.


MAX_CC_ITERS = 15


def _cluster_summary(labels: DataFrame) -> DataFrame:
    """(doc_id, label) → per-cluster summary. ONE copy shared by d07
    and d15: the two CC algorithms share an oracle, so their output
    shaping must be the same code."""
    return labels.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - 1).alias("n_redundant"),
        F.array_join(
            F.sort_array(F.collect_list(F.col("doc_id").cast("string"))), ","
        ).alias("members"),
    )


def d07_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = d02_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = stage_boundary(
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
    )
    labels = stage_boundary(
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(MAX_CC_ITERS):
        nbr = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .select(F.col("doc_a").alias("doc_id"), "label")
            .groupBy("doc_id")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = stage_boundary(
            labels.join(nbr, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        n_changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "doc_id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"CC did not converge in {MAX_CC_ITERS} rounds")
    return _cluster_summary(labels)


def _cc_summary_sql(pairs_sql: str) -> str:
    """Recursive-CTE connected components + cluster summary over any
    (doc_a, doc_b) pair query — shared by the d07 (exact all-pairs
    edges) and d15 (banded LSH edges) oracles so each mirrors its
    Spark side's actual edge source."""
    return f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, count(*) AS n_docs,
       count(*) - 1 AS n_redundant,
       list_aggregate(list_sort(list(doc_id::VARCHAR)), 'string_agg', ',') AS members
FROM comp
GROUP BY cluster_id
"""


_D07_SQL = _cc_summary_sql(_D02_SQL)


# --------------------------------------------------------------------------
# d08 — benchmark decontamination: flag corpus documents that share
# any n-gram with an evaluation/benchmark set (the train-test-overlap
# check every LLM corpus runs before training). The eval set here is
# the deterministic ~1% slice doc_id % 97 == 0 (the operator's
# contract is the overlap join, not the eval-set rule). Shape: corpus
# shingles SEMI-join the eval shingle set — at 100 TB the eval side is
# a few thousand benchmark documents, so its distinct-shingle set
# broadcasts and the check costs one map-side pass over the corpus.


def d08_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sh = _doc_shingles_cached(spark, sf_dir)
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    hits = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        docs.filter(F.col("doc_id") % 97 != 0)
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("hit").alias("n_contaminated"),
            ratio_round(
                F.count("hit"), F.count(F.lit(1)), 4
            , nonneg=True).alias("contam_rate"),
        )
    )


_D08_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
eval_sh AS (SELECT DISTINCT shingle FROM exploded WHERE doc_id % 97 = 0),
hits AS (
  SELECT DISTINCT doc_id FROM exploded
  WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM eval_sh)
)
SELECT source, count(*) AS n_docs,
       count(h.doc_id) AS n_contaminated,
       {sql_ratio_round('count(h.doc_id)', 'count(*)', 4, nonneg=True)} AS contam_rate
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
GROUP BY source
"""


# --------------------------------------------------------------------------
# d09 — DIRECTED containment (|shingles(a) ∩ shingles(b)| / |shingles(a)|):
# catches quote/subset duplication that symmetric Jaccard misses — a
# short doc fully embedded in a long one has low Jaccard but
# containment 1.0. Same inverted-index join shape as d02 (quadratic
# only within shared-shingle groups — the verifier tier; the 100 TB
# path generates candidates from d03's LSH buckets first).

CONTAINMENT_THRESHOLD = 0.8


def d09_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    exploded = _capped_shingles_cached(spark, sf_dir)
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    return (
        common.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            ratio_round(
                F.col("common"), F.col("sz_a"), 4
            , nonneg=True).alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


_D09_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
{_CAPPED_EXPLODED_SQL},
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT doc_a, doc_b,
         {sql_ratio_round('common', 'sa.sz', 4, nonneg=True)} AS containment
  FROM common JOIN sizes sa ON doc_a = sa.doc_id
)
WHERE containment >= {CONTAINMENT_THRESHOLD}
"""


# --------------------------------------------------------------------------
# d10 — fuzzy dedup: bounded-edit-distance pairs on normalized 64-char
# prefixes (catches typo-level mutations that survive shingle hashing).
#
# Exactness guarantee (pigeonhole): lev(a, b) = d <= 4 edits leave the
# untouched characters of `a` in <= d + 1 contiguous runs totalling
# >= len(a) - d chars, so the longest preserved run has
# >= (48 - 4) / 5 = 8.8 > 8 chars, and its start position shifts by at
# most d between the two strings.  A join on shared 8-grams with
# |pos_a - pos_b| <= 4 is therefore a SUPERSET of all true pairs.
#
# Scale design: the naive join key (gram) alone is skewed — a common
# char-gram of natural text (" the ") pairs every occurrence with
# every other, an all-occurrence blowup within the bucket.  Three
# levers bound it: gram width (wider = more selective at the same
# guaranteed recall), position banding (band = pos div (K + 1), probe
# bands b-1..b+1 — sound because |pos_a - pos_b| <= 4 < 5 implies the
# bands differ by at most one), and TIERING: two full-64 prefixes
# support a 12-gram key ((64-4)/5 = 12-char guaranteed run, ~6x less
# candidate mass than 8-grams, measured), so only pairs touching the
# sub-64 tail (~2% of docs) pay the 8-gram fallback — indexed on the
# tail side, so that join is tail x corpus, never corpus².

_D10_PREFIX = 64
_D10_NGRAM = 8
_D10_MAXLEV = 4
_D10_MINLEN = 48


def _d10_grams(pfx: DataFrame, n: int) -> DataFrame:
    # The gram STRING never reaches the join: the candidate join only
    # needs equality evidence (the levenshtein verify recomputes the
    # exact distance), so the 8-24 byte gram is folded to an 8-byte
    # xxhash64 before the exchange (guide §2.3 "shuffle keys and
    # metadata instead of payloads"). A hash collision can only ADD a
    # candidate pair, which the verify discards — recall is unchanged.
    return pfx.select(
        "doc_id",
        F.length("pfx").alias("len"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(pfx) - {n - 1}),"
                f" i -> xxhash64(substring(pfx, i, {n})))"
            )
        ).alias("pos", "gram"),
    )


def _d10_candidates(
    idx_grams: DataFrame,
    probe_grams: DataFrame,
    self_join: bool = False,
    len_banded: bool = False,
) -> DataFrame:
    """Canonical (doc_a < doc_b) candidate pairs from a positional
    banded gram join (index at band b, probe at b-1..b+1).

    self_join: both sides enumerate the SAME gram set, so every true
    pair is matched in both orientations — requiring doc_id < doc_id
    on the raw join halves the candidate mass with no recall loss
    (the condition is symmetric in the two sides). Never set it when
    the index side is a subset of the probe side.

    len_banded: lev(a, b) <= 4 implies abs(len(a) - len(b)) <= 4, so
    the length band is a free exact pre-filter on the join — it is
    what keeps the short tier (8-gram fallback) from pairing 48-char
    prefixes with the ~98% of the corpus that is full-64 (measured
    5x the tier's candidate mass at sf0.1)."""
    band = _D10_MAXLEV + 1
    idx = idx_grams.select(
        "doc_id", "len", "pos", "gram", (F.col("pos") / band).cast("int").alias("b")
    )
    probe = probe_grams.select(
        "doc_id",
        "len",
        "pos",
        "gram",
        F.explode(
            F.array(
                (F.col("pos") / band).cast("int") - 1,
                (F.col("pos") / band).cast("int"),
                (F.col("pos") / band).cast("int") + 1,
            )
        ).alias("b"),
    )
    cond = (
        (F.col("a.gram") == F.col("p.gram"))
        & (F.col("a.b") == F.col("p.b"))
        & (F.abs(F.col("a.pos") - F.col("p.pos")) <= _D10_MAXLEV)
    )
    if self_join:
        cond = cond & (F.col("a.doc_id") < F.col("p.doc_id"))
    else:
        cond = cond & (F.col("a.doc_id") != F.col("p.doc_id"))
    if len_banded:
        cond = cond & (F.abs(F.col("a.len") - F.col("p.len")) <= _D10_MAXLEV)
    return (
        idx.alias("a")
        .join(probe.alias("p"), cond)
        .select(
            F.least(F.col("a.doc_id"), F.col("p.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("p.doc_id")).alias("doc_b"),
        )
    )


def d10_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.length("text") >= _D10_MINLEN)
    pfx = (
        _spread(docs)
        .select(
            "doc_id",
            F.substring(F.lower(F.col("text")), 1, _D10_PREFIX).alias("pfx"),
        )
        # feeds the index and both verify sides; LAZY boundary (the
        # r13 cc_star pattern): the final action is full-frame, so the
        # first consumer stage materializes the cache and the separate
        # per-invocation checkpoint job disappears (measured 1.48 ->
        # 1.29 s, 8 -> 7 jobs/rep at sf0.1).
        .transform(lambda df: stage_boundary(df, eager=False))
    )
    # Tiered candidate generation: full-64 prefixes allow a 12-gram
    # key ((64-4)/5 = 12-char guaranteed run — 6x less candidate mass
    # than 8-grams, measured); only pairs involving a sub-64 prefix
    # (the ~2% tail) fall back to the 8-gram tier, with the short side
    # as the index so the fallback join is tail x corpus, not corpus².
    full = pfx.filter(F.length("pfx") >= _D10_PREFIX)
    short = pfx.filter(F.length("pfx") < _D10_PREFIX)
    wide = (_D10_PREFIX - _D10_MAXLEV) // (_D10_MAXLEV + 1)  # 12 for 64/4
    cand = (
        _d10_candidates(
            _d10_grams(full, wide), _d10_grams(full, wide), self_join=True
        )
        .unionByName(
            _d10_candidates(
                _d10_grams(short, _D10_NGRAM),
                _d10_grams(pfx, _D10_NGRAM),
                len_banded=True,
            )
        )
        .distinct()
    )
    pa = pfx.select(F.col("doc_id").alias("doc_a"), F.col("pfx").alias("pfx_a"))
    pb = pfx.select(F.col("doc_id").alias("doc_b"), F.col("pfx").alias("pfx_b"))
    # Banded levenshtein (Spark 3.5+ threshold form): O(k*n) instead of
    # O(n^2) per pair — it returns the exact distance when <= k and -1
    # otherwise, so `lev >= 0` selects exactly the old `lev <= 4` set
    # with identical values (guide §1.2 step 2: per-task work, ~16x
    # less DP on the ~0.1%-precision candidate set).
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pfx_a", "pfx_b", _D10_MAXLEV)
            .cast("bigint")
            .alias("lev"),
        )
        .filter(F.col("lev") >= 0)
    )


_D10_SQL = f"""
WITH p AS (
  SELECT doc_id, substr(lower(text), 1, {_D10_PREFIX}) AS pfx
  FROM documents WHERE length(text) >= {_D10_MINLEN}
)
SELECT * FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
  FROM p a JOIN p b ON a.doc_id < b.doc_id
)
WHERE lev <= {_D10_MAXLEV}
"""


# --------------------------------------------------------------------------
# d12 — MinHash CALIBRATION: the signature-agreement estimate
# (matching components / K) against the exact Jaccard, per verified
# near-dup pair. E[est] = J by the MinHash property; with K = 12 the
# stderr is ~sqrt(J(1-J)/12) ≈ 0.11 at J = 0.8 — this query is the
# production check that the sketch is behaving before anyone trusts
# its candidate buckets at 100 TB (where nobody can afford the exact
# join this comparison needs — run it on a sampled shard there).


def d12_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = d02_ngram_jaccard(spark, sf_dir)
    exploded = _doc_shingles_cached(spark, sf_dir)
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
            for j in range(MINHASH_K)
        ]
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(MINHASH_K)]
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(MINHASH_K)]
    )
    matches = None
    for j in range(MINHASH_K):
        m = (F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
        matches = m if matches is None else matches + m
    est = ratio_round(matches, F.lit(MINHASH_K), 4, nonneg=True)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            est.alias("est"),
            F.round(F.abs(est - F.col("jaccard")), 4).alias("err"),
        )
    )


def _d12_sql() -> str:
    hs = ",\n         ".join(
        f"list_min(list_transform(shingles, x -> md5('{j}|' || x))) AS h{j}"
        for j in range(MINHASH_K)
    )
    match_sum = " + ".join(
        f"(sa.h{j} = sb.h{j})::INT" for j in range(MINHASH_K)
    )
    est_expr = sql_ratio_round(f"({match_sum})", str(MINHASH_K), 4, nonneg=True)
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS (SELECT doc_id, {hs} FROM sh),
pairs AS ({_D02_SQL})
SELECT doc_a, doc_b, jaccard,
       {est_expr} AS est,
       round(abs({est_expr} - jaccard), 4) AS err
FROM pairs
JOIN sig sa ON doc_a = sa.doc_id
JOIN sig sb ON doc_b = sb.doc_id
"""


# --------------------------------------------------------------------------
# d13 — cross-document duplicated-SPAN detection: the substring-level
# dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
# Language Models Better"), whose exact form is a suffix array. The
# Spark-first equivalent: fingerprint EVERY W-token window (stride 1,
# so any duplicated run of >= W tokens is caught at some alignment in
# both copies — no aligned-stride recall hole), then count distinct
# documents per span hash. md5 over the joined window text makes the
# match exact (no false positives beyond md5 collisions), unlike a
# weak rolling hash.
#
# Scale: linear in corpus tokens (n windows per doc ~= n tokens), one
# shuffle on the span hash with map-side partial aggregation, then a
# constant-size summary. At 100 TB this IS the practical replacement
# for a distributed suffix array: the span-hash table is the single
# big shuffle, and the dedup ACTION joins flagged hashes back to
# (doc_id, pos) to cut the spans out.

SPAN_TOKENS = 16


def _span_key(win, wide: bool):
    """The span grouping key both tiers share: xxhash64 of the joined
    window text, or — wide mode — a struct of two independent xxhash64
    families (the second via a seed-prefix column), 128 bits for
    collision-proof exactness at 1e12+ spans. ONE definition so the
    metric tier (_span_table: d13/d14) and the action tier
    (_doc_spans: d17/d18) can never diverge on the key family."""
    if not wide:
        return F.xxhash64(win)
    return F.struct(
        F.xxhash64(win).alias("h1"),
        F.xxhash64(F.lit("span128"), win).alias("h2"),
    )


def _span_table(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    """Materialized stride-1 W-token window fingerprints: one narrow
    (doc_id, span_hash) row per window position.

    The span table feeds multiple plan branches ACROSS its consumers
    (d13's counts + semi-join, d14's totals + dup counts, x12's gate
    via d14); it is localCheckpoint-materialized AND session-memoized
    (``_span_table_cached``) so the explode+hash — the hot map — runs
    once per session, and bench.py times the build as its own
    ``bases`` line (VERDICT r11 item 4: d13's number must measure the
    steady-state plan, not whichever query pays the base first).

    xxhash64, not md5: the hash never leaves either query (outputs are
    structural counts), so only grouping equality matters — an 8-byte
    long shuffle key instead of a 32-char hex string quarters the
    shuffled span-table bytes at 100 TB. The DuckDB oracles group by
    md5 of the same strings; at test SFs the duplicate structure is
    identical (count parity IS the no-collision check). Collision
    honesty at the extreme: 1e12 distinct spans → ~n²/2^65 ≈ 3e7
    birthday-colliding PAIRS, a ~1e-5 relative overcount on dup-span
    totals — acceptable for the d13/d14/x12 gate metrics; where exact
    counts are required at that scale, ``wide=True`` widens the key
    to 128 bits (two independent xxhash64 families via a seed-prefix
    column, packed in a struct — 16-byte shuffle key, still 2x
    narrower than the hex string, collision term ~n²/2^129 ≈ nil).
    The flag flips ONLY the grouping key; both modes are pinned
    output-identical at test SF (tests/test_dedup_spans.py).
    """
    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _spread(_docs(spark, sf_dir))
    toks = tokens_col()
    n = F.size(toks)
    with_t = docs.select("doc_id", toks.alias("t"), n.alias("n")).filter(
        F.col("n") >= SPAN_TOKENS
    )
    starts = F.sequence(F.lit(0), F.col("n") - SPAN_TOKENS, F.lit(1))
    win = F.array_join(F.slice(F.col("t"), F.col("s") + 1, SPAN_TOKENS), " ")
    return with_t.select(
        "doc_id", "t", F.explode(starts).alias("s")
    ).select(
        "doc_id", _span_key(win, wide).alias("span_hash")
    ).transform(stage_boundary)


_SPAN_TABLE_CACHE: dict[tuple, tuple[SparkSession, tuple]] = {}


def _span_table_cached(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _SPAN_TABLE_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _span_table(spark, sf_dir, wide=wide),
        extra=(wide,),
    )


_SPANS_CTE = f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
spans AS (
  SELECT doc_id,
         md5(list_aggregate(list_slice(t, s + 1, s + {{W}}),
                            'string_agg', ' ')) AS span_hash
  FROM (SELECT doc_id, t FROM toks WHERE len(t) >= {{W}}),
       unnest(range(0, len(t) - {{W}} + 1)) AS u(s)
)
""".replace("{W}", str(SPAN_TOKENS))


def d13_duplicate_spans(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    spans = _span_table_cached(spark, sf_dir, wide=wide)
    per_span = spans.groupBy("span_hash").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    dup = per_span.filter(F.col("n_docs") >= 2)
    affected = (
        spans.join(dup.select("span_hash"), "span_hash", "left_semi")
        .agg(F.countDistinct("doc_id").alias("n_docs_affected"))
    )
    summary = dup.agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("n_occ").alias("n_span_occurrences"),
        F.max("n_docs").alias("max_docs_per_span"),
    )
    return summary.crossJoin(F.broadcast(affected))


_D13_SQL = f"""
WITH {_SPANS_CTE},
per_span AS (
  SELECT span_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
  FROM spans GROUP BY span_hash
),
dup AS (SELECT * FROM per_span WHERE n_docs >= 2),
affected AS (
  SELECT count(DISTINCT doc_id) AS n_docs_affected
  FROM spans WHERE span_hash IN (SELECT span_hash FROM dup)
)
SELECT count(*) AS n_dup_spans,
       CAST(sum(n_occ) AS BIGINT) AS n_span_occurrences,
       CAST(max(n_docs) AS BIGINT) AS max_docs_per_span,
       (SELECT n_docs_affected FROM affected) AS n_docs_affected
FROM dup
"""


# --------------------------------------------------------------------------
# d14 — per-document duplicated-span fraction: d13's corpus summary
# refined into a per-doc quality signal (the "duplicate n-gram
# fraction" metric that web-corpus pipelines attach to every document
# before filtering — Gopher/RefinedWeb-style repetition gates consume
# exactly this number). A span is duplicated when its W-token window
# fingerprint appears in >= 2 distinct documents; the fraction is
# dup-span occurrences over total span positions in the doc.
#
# Plan: the shared materialized span table feeds (a) per-doc totals,
# (b) the dup-hash set (one agg shuffle), (c) a semi-join back to
# count each doc's duplicated positions — all equi-joins/aggs on the
# 8-byte hash, linear in corpus tokens, no all-pairs anywhere.


def d14_dup_span_fraction(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    spans = _span_table_cached(spark, sf_dir, wide=wide)
    dup = (
        spans.groupBy("span_hash")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("span_hash")
    )
    per_doc = spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    per_doc_dup = (
        spans.join(dup, "span_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n_dup"))
    )
    n_dup = F.coalesce(F.col("_n_dup"), F.lit(0))
    return (
        per_doc.join(per_doc_dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            n_dup.alias("n_dup_spans"),
            ratio_round(n_dup, F.col("n_spans"), 4, nonneg=True).alias("dup_frac"),
        )
    )


_D14_SQL = f"""
WITH {_SPANS_CTE},
dup AS (
  SELECT span_hash FROM spans
  GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
),
per_dup AS (
  SELECT doc_id, count(*) AS n_dup FROM spans
  WHERE span_hash IN (SELECT span_hash FROM dup)
  GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(p.n_spans AS BIGINT) AS n_spans,
       CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
       {sql_ratio_round('coalesce(d.n_dup, 0)', 'p.n_spans', 4, nonneg=True)} AS dup_frac
FROM per_doc p LEFT JOIN per_dup d USING (doc_id)
"""


# --------------------------------------------------------------------------
# d15 — connected components via alternating LARGE-STAR / SMALL-STAR
# (Kiveris et al. 2014, "Connected Components in MapReduce and
# Beyond") over the same verified near-dup pair graph as d07. d07's
# min-label propagation converges in O(diameter) rounds — fine for the
# tiny dense clusters it targets, but a web-crawl dedup graph has
# chain-shaped components (mirror-of-a-mirror duplication) where the
# diameter is hundreds; large/small-star converges in O(log n) rounds
# regardless of shape. Each phase is one groupBy(min) + one re-emit —
# shuffle-bound, AQE-skew-safe, and no task ever materializes a full
# neighborhood in memory. The fixpoint test is a constant-size
# checksum aggregate (edge count + sum of 64-bit pair hashes — same
# collision-bound class as d13's span hashing, ~2^-64 per round), not
# a frame diff, so each round costs exactly one tiny action.
#
# d15 shares d07's output schema AND oracle: two independent
# algorithms, one logical result — the driver hash doubles as an
# algorithm cross-check.


def cc_star(
    edges: DataFrame,
    max_iters: int = MAX_CC_ITERS,
    pre_oriented: bool = False,
    materialized: bool = False,
) -> DataFrame:
    """Component labels for an undirected edge list (``u``, ``v``).

    Returns (doc_id, label) for every node incident to an edge, where
    label is the component's minimum node id. Alternates large-star
    (link every larger neighbor to the neighborhood min) and
    small-star (link every smaller neighbor to the smaller-neighbor
    min) until the star forest is stable.

    ``pre_oriented``: the caller guarantees ``edges`` is already
    DISTINCT with ``u > v`` strictly on every row — the intake
    normalization below reduces to a no-op, so its orient + distinct
    exchange is skipped (r13: every production caller feeds pairs that
    are strict and distinct by construction; the normalization only
    earns its shuffle on raw symmetric intakes like d07-style
    (a,b)+(b,a) lists).  ``materialized``: the caller additionally
    guarantees the frame is already materialized (a memoized base or
    its column-swap), so the intake stage boundary — there because
    round 1 and the final ``nodes`` union consume the intake three
    times — re-reads cached blocks anyway and is skipped outright.
    Both flags change only which plan prefix runs, never the labels.
    """
    # Intake normalization: orient every edge big→small before the
    # distinct, so a symmetric input (d07-style (a,b)+(b,a) lists)
    # halves instead of doubling round-1 volume — and, because every
    # LATER round's edges are also strictly big→small (large emits
    # (v, m) with m < u < v; small emits (c, m) with m < c), the
    # symmetrize step below never needs its own distinct: the two
    # union branches cannot overlap. One full-edge-list shuffle saved
    # per round.
    if not pre_oriented:
        edges = (
            edges.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    if not materialized:
        edges = stage_boundary(edges)
    # nodes stays LAZY (r13): it is consumed exactly once, by the
    # final labels join, and derives from the already-checkpointed
    # intake edges — an eager boundary here was one extra
    # materialization job per cc_star call with nothing reusing it.
    nodes = (
        edges.select(F.col("u").alias("doc_id"))
        .union(edges.select(F.col("v").alias("doc_id")))
        .distinct()
    )

    def checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a long sum of 64-bit hashes
            # overflows under ANSI mode
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iters):
        # LARGE-STAR: for each u, link every neighbor v > u to
        # min(Γ(u) ∪ {u}). Symmetrize first so both endpoints group —
        # no distinct needed: edges are strictly big→small (intake
        # normalization + the per-round orientation invariant), so the
        # two branches are disjoint row sets.
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR: for each u, link every smaller neighbor (and u
        # itself) to the smallest one. Large-star output is already
        # big→small oriented (each emitted edge is (v, m) with
        # m ≤ u < v) and already distinct — no re-orientation pass.
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smin, "u")
            .select(F.col("v").alias("c"), "m")
            .union(smin.select(F.col("u").alias("c"), "m"))
            .filter(F.col("c") != F.col("m"))
            .select(F.col("c").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # Right-size the next round to the MEASURED edge count (known
        # from the fixpoint action anyway): near-dup graphs shrink
        # fast, and running every round at the full shuffle width pays
        # 32 tasks/stage to move a few hundred rows. ~50k edges/
        # partition; full width returns automatically on big rounds.
        target = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        if prev is not None:
            target = max(1, min(target, prev[0] // 50_000 + 1))
        # per-round boundary: THE lineage-loss hot spot on a real
        # cluster — storage mode makes each round restartable. Lazy
        # (eager=False): the fixpoint checksum right below is a
        # full-frame aggregate, so ONE job both materializes the round
        # and returns the checksum — the eager form paid a
        # materialize job plus a cached-block re-scan job per round.
        # Storage mode ignores the flag (stays eager) and keeps its
        # checkpoint-then-checksum pair.
        edges = stage_boundary(small.coalesce(target), eager=False)
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"star CC did not converge in {max_iters} rounds")
    # Stable state is a star forest: (child, root) edges with root =
    # component min. Nodes with no edge left (isolated after self-loop
    # removal — i.e. component roots) label themselves.
    roots = edges.groupBy(F.col("u").alias("doc_id")).agg(F.min("v").alias("root"))
    return nodes.join(roots, "doc_id", "left").select(
        "doc_id", F.coalesce("root", "doc_id").alias("label")
    )


def d15_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edges come from d03's LSH-verified pairs, NOT d02's exact
    # all-pairs shingle join: the 100 TB composition must be
    # banded-candidate-generation end to end (VERDICT r04 item 3).
    # The oracle therefore runs the recursive-CTE CC over the SAME
    # banded pair twin (d03's SQL), so Spark-vs-oracle equality holds
    # BY CONSTRUCTION (ADVICE r05): with 4 bands x 3 rows a true
    # Jaccard-0.8 pair escapes banding with ~(1 - (1-0.8^3)^4) ≈ 5.7%
    # probability, so equality against the EXACT-pair clustering (d07)
    # is a measured, data-dependent property — pinned on stock data by
    # tests/test_ops_r04c.py::test_d15_equals_d07_on_the_corpus and
    # quantified by d12's calibration — not part of this oracle row.
    # d03's verified pairs are DISTINCT with doc_a < doc_b strictly, so
    # the big→small intake orientation is a plain column swap
    # (pre_oriented skips the orient+distinct exchange); the intake
    # boundary stays (the pair build is the expensive part and round 1
    # + nodes consume it three times).
    pairs = d03_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("u"), F.col("doc_a").alias("v")
    )
    return _cluster_summary(cc_star(pairs, pre_oriented=True))


_D15_SQL = _cc_summary_sql(_minhash_sql())


# Session-scoped memo of the near-dup component labels — the
# t15_scores_cached discipline (VERDICT r04 item 8): at pipeline scale
# cluster labels are materialized ONCE as a corpus column and every
# curation consumer reads the column instead of re-running LSH + CC.
# The registered d15 query stays uncached so the bench keeps
# measuring the real pairs+CC cost; x17 composes on this memo. Keyed
# on the session object identity so a restarted SparkContext can
# never serve a dead checkpointed frame.
_CC_LABEL_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def cc_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    def _build() -> DataFrame:
        # Same pre-oriented intake as d15: doc_a < doc_b strictly.
        pairs = d03_minhash_lsh(spark, sf_dir).select(
            F.col("doc_b").alias("u"), F.col("doc_a").alias("v")
        )
        return cc_star(pairs, pre_oriented=True).transform(stage_boundary)

    return session_memo(
        _CC_LABEL_CACHE, spark, sf_dir, ("documents",), _build
    )


# --------------------------------------------------------------------------
# d16 — INCREMENTAL near-dup dedup: a NEW crawl batch (doc_id odd —
# d06's snapshot rule) LSH-probed against the CORPUS SIGNATURE INDEX
# (doc_id even) and exact-verified. d06 is the exact-fingerprint tier
# of recurring ingestion; this is its NEAR-dup tier — the shape every
# refreshed crawl runs so a re-crawled, lightly-edited page doesn't
# re-enter the corpus. At 100 TB the corpus side reads the
# pre-materialized signature index that
# pipeline/ann_index.py::write_minhash_index actually writes
# ((band_idx, shard)-partitioned buckets + shingle/size stores);
# probe_minhash_index there reproduces this query's candidate
# generation + verification over that layout with a partition-pruned
# bucket scan (parity + pruning pinned in tests/test_ann_index.py).
# The registered query below recomputes the corpus side from text so
# the DuckDB oracle can run the identical computation.


def d16_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    exploded = _doc_shingles_cached(spark, sf_dir)
    buckets = _minhash_buckets_cached(spark, sf_dir)
    corpus_b = buckets.filter(F.col("doc_id") % 2 == 0).select(
        "band_idx", "bucket", F.col("doc_id").alias("doc_corpus")
    )
    batch_b = buckets.filter(F.col("doc_id") % 2 == 1).select(
        "band_idx", "bucket", F.col("doc_id").alias("doc_batch")
    )
    cand = (
        batch_b.join(corpus_b, ["band_idx", "bucket"])
        .select("doc_batch", "doc_corpus")
        .distinct()
    )
    sh_batch = exploded.select(
        F.col("doc_id").alias("doc_batch"), "shingle"
    )
    sh_corpus = exploded.select(
        F.col("doc_id").alias("doc_corpus"), "shingle"
    )
    common = (
        cand.join(sh_batch, "doc_batch")
        .join(sh_corpus, ["doc_corpus", "shingle"])
        .groupBy("doc_batch", "doc_corpus")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    jac = ratio_round(
        F.col("common"),
        F.col("sz_a") + F.col("sz_b") - F.col("common"),
        4,
     nonneg=True,)
    dup_batch_docs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_batch"), F.col("sz").alias("sz_a")),
            "doc_batch",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_corpus"), F.col("sz").alias("sz_b")
            ),
            "doc_corpus",
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_batch")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "source")
        .join(dup_batch_docs, docs["doc_id"] == dup_batch_docs["doc_batch"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.count("hit").alias("n_near_dup"),
            ratio_round(
                F.count("hit"), F.count(F.lit(1)), 4
            , nonneg=True).alias("dup_rate"),
            F.min(F.when(F.col("hit") == 1, F.col("doc_id"))).alias(
                "first_dup_doc"
            ),
        )
    )


def _d16_sql() -> str:
    hs = ",\n         ".join(
        f"list_min(list_transform(shingles, x -> md5('{j}|' || x))) AS h{j}"
        for j in range(MINHASH_K)
    )
    n_bands = MINHASH_K // MINHASH_BAND_ROWS
    bands = ",\n         ".join(
        "md5("
        + " || '|' || ".join(
            f"h{b * MINHASH_BAND_ROWS + r}" for r in range(MINHASH_BAND_ROWS)
        )
        + f") AS band{b}"
        for b in range(n_bands)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS bucket FROM banded"
        for b in range(n_bands)
    )
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id, shingles,
         {hs}
  FROM sh WHERE len(shingles) > 0
),
banded AS (
  SELECT doc_id,
         {bands}
  FROM sig
),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT b.doc_id AS doc_batch, c.doc_id AS doc_corpus
  FROM buckets b JOIN buckets c
    ON b.band_idx = c.band_idx AND b.bucket = c.bucket
  WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
),
dup_docs AS (
  SELECT DISTINCT doc_batch FROM (
    SELECT doc_batch,
           {sql_ratio_round('len(list_intersect(sa.shingles, sb.shingles))', 'len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))', 4, nonneg=True)}
             AS jaccard
    FROM cand
    JOIN sh sa ON doc_batch = sa.doc_id
    JOIN sh sb ON doc_corpus = sb.doc_id
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT source,
       count(*) AS n_batch_docs,
       count(h.doc_batch) AS n_near_dup,
       {sql_ratio_round('count(h.doc_batch)', 'count(*)', 4, nonneg=True)} AS dup_rate,
       min(CASE WHEN h.doc_batch IS NOT NULL THEN d.doc_id END)
         AS first_dup_doc
FROM documents d LEFT JOIN dup_docs h ON d.doc_id = h.doc_batch
WHERE d.doc_id % 2 = 1
GROUP BY source
"""


# --------------------------------------------------------------------------
# d17 — exact-substring dedup ACTION (the second half of Lee et al.
# 2022): d13/d14 DETECT duplicated spans; this operator executes the
# cut. Rule: every stride-1 W-token window keeps its globally FIRST
# occurrence (min (doc_id, position) — deterministic, no rand) and
# every later occurrence is marked for removal; a document's removed
# token count is the length of the UNION of its marked [s, s+W-1]
# intervals (overlapping windows from one duplicated run must not be
# double-counted), computed with the gaps-and-islands idiom — a
# running max of interval ends splits islands, per-island coverage is
# max(end)-min(start)+1. Output is the per-document dedup budget:
# tokens removed / kept and the kept fraction (exactround ratio).
#
# Scale: the same single span-hash shuffle d13 pays (narrow
# (doc_id, pos, hash64) rows), one window over the span hash for the
# first-copy rank, then per-DOCUMENT windows bounded by document
# length. Linear in corpus tokens; no all-pairs anywhere.


def _merge_islands(removed: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of marked windows: (doc_id, s, e) rows
    -> one row per merged removal interval (doc_id, isl, s0, e0,
    occ), where occ is the number of windows the island absorbed.
    Per-DOCUMENT windows only — bounded by document length."""
    from pyspark.sql.window import Window

    by_pos = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = removed.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (prev_max_e < F.col("s")), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum("new_island").over(
            by_pos.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy("doc_id", "isl").agg(
        F.min("s").alias("s0"),
        F.max("e").alias("e0"),
        F.count(F.lit(1)).alias("occ"),
    )


def _doc_spans(docs: DataFrame, *cols: str, wide: bool = False) -> DataFrame:
    """Stride-1 W-token span hashes for every eligible document:
    one narrow row (doc_id, *cols, n, s, h) per window."""
    from rfb_data_pipeline_spark.operators.text import tokens_col

    toks = tokens_col()
    n = F.size(toks)
    with_t = docs.select(
        "doc_id", *cols, toks.alias("t"), n.alias("n")
    ).filter(F.col("n") >= SPAN_TOKENS)
    starts = F.sequence(F.lit(0), F.col("n") - SPAN_TOKENS, F.lit(1))
    win = F.array_join(
        F.slice(F.col("t"), F.col("s") + 1, SPAN_TOKENS), " "
    )
    # wide: the shared 128-bit key (_span_key) for the ACTION tier —
    # removal decisions become collision-proof at 1e12+ spans with
    # the same flag flip. Only the equality key changes; window
    # ordering stays (doc_id, s). The PERSISTED span index
    # (write_span_index/d20) keeps the 64-bit key until a layout
    # version bump: its shard partitioning derives from the long h,
    # and a silent key-type change would strand existing indexes.
    return with_t.select(
        "doc_id", *cols, "n", "t", F.explode(starts).alias("s")
    ).select("doc_id", *cols, "n", "s", _span_key(win, wide).alias("h"))


# Session memo of the stride-1 span-hash table (r13): d17/d18 (via
# _span_removal_intervals), d19 and d20 each rebuilt — and re-ran an
# eager localCheckpoint job for — the identical narrow
# `_doc_spans(_spread(docs))` frame on every invocation. One
# tokenize+explode+hash pass per session now. Keyed on the wide flag
# (the 128-bit action-tier key is a distinct frame). Pure sharing;
# results unchanged.
_DOC_SPANS_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}


def _doc_spans_cached(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    from rfb_data_pipeline_spark.memo import session_memo

    return session_memo(
        _DOC_SPANS_CACHE,
        spark,
        sf_dir,
        ("documents",),
        lambda: _doc_spans(
            _spread(_docs(spark, sf_dir)), wide=wide
        ).transform(stage_boundary),
        extra=(bool(wide),),
    )


def _span_removal_intervals(
    spark: SparkSession, sf_dir: str, wide: bool = False
):
    """Shared d17/d18 core: (eligible-docs frame, merged removal
    intervals).  Returns ``with_t`` = (doc_id, t, n) for documents
    with >= SPAN_TOKENS tokens, and ``intervals`` = one row per
    merged removed interval (doc_id, s0, e0, occ).  One span-hash
    shuffle + one doc_id shuffle; linear in corpus tokens."""
    from pyspark.sql.window import Window

    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _spread(_docs(spark, sf_dir))
    toks = tokens_col()
    n = F.size(toks)
    with_t = docs.select("doc_id", toks.alias("t"), n.alias("n")).filter(
        F.col("n") >= SPAN_TOKENS
    )
    sp = _doc_spans_cached(spark, sf_dir, wide=wide)
    first_rank = Window.partitionBy("h").orderBy("doc_id", "s")
    removed = (
        sp.withColumn("rn", F.row_number().over(first_rank))
        .filter(F.col("rn") > 1)
        .select("doc_id", "s", (F.col("s") + SPAN_TOKENS - 1).alias("e"))
    )
    return with_t, _merge_islands(removed)


def d17_span_dedup_action(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    with_t, intervals = _span_removal_intervals(spark, sf_dir, wide=wide)
    # occ folds into the island aggregation: counting removed windows
    # alongside per-island coverage keeps the whole budget a SINGLE
    # chain (one h-shuffle, one doc_id-shuffle — both two-level aggs
    # reuse the doc_id partitioning), instead of a second branch
    # re-paying the span-hash window.
    cov = intervals.groupBy("doc_id").agg(
        F.sum(F.col("e0") - F.col("s0") + 1)
        .cast("bigint")
        .alias("tokens_removed"),
        F.sum("occ").cast("bigint").alias("n_removed_occurrences"),
    )
    base = with_t.select("doc_id", F.col("n").cast("bigint").alias("n_tokens"))
    out = (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_removed_occurrences", F.lit(0))
            .cast("bigint")
            .alias("n_removed_occurrences"),
            F.coalesce("tokens_removed", F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
            (F.col("n_tokens") - F.coalesce("tokens_removed", F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .withColumn(
            "kept_frac",
            ratio_round(
                F.col("tokens_kept"), F.col("n_tokens"), 4, nonneg=True
            ),
        )
    )
    return out


# SQL twin of _merge_islands: marked windows (a `removed` CTE with
# doc_id, s, e) -> merged removal intervals. One copy, three
# consumers (d17/d18 via _SPAN_CTES, d19 with its own `removed`).
_ISLAND_SQL = """islands AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS new_island
  FROM removed
),
numbered AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY s
             ROWS UNBOUNDED PRECEDING) AS isl
  FROM islands
),
intervals AS (
  SELECT doc_id, isl, min(s) AS s0, max(e) AS e0, count(*) AS n_occ
  FROM numbered GROUP BY doc_id, isl
)"""

# Shared d17/d18 CTE chain (the SQL twin of _span_removal_intervals):
# tokens -> stride-1 span hashes -> first-copy rank -> removed
# windows -> merged islands.
_SPAN_CTES = f"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
sp AS (
  SELECT doc_id, len(t) AS n, s,
         md5(list_aggregate(list_slice(t, s + 1, s + {SPAN_TOKENS}),
                            'string_agg', ' ')) AS h
  FROM (SELECT doc_id, t FROM toks WHERE len(t) >= {SPAN_TOKENS}),
       unnest(range(0, len(t) - {SPAN_TOKENS} + 1)) AS u(s)
),
marked AS (
  SELECT doc_id, s,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
  FROM sp
),
removed AS (
  SELECT doc_id, s, s + {SPAN_TOKENS} - 1 AS e FROM marked WHERE rn > 1
),
{_ISLAND_SQL}"""

_D17_SQL = f"""
WITH {_SPAN_CTES},
cov AS (
  SELECT doc_id,
         CAST(sum(e0 - s0 + 1) AS BIGINT) AS tokens_removed,
         CAST(sum(n_occ) AS BIGINT) AS n_removed
  FROM intervals
  GROUP BY doc_id
),
base AS (SELECT DISTINCT doc_id, n FROM sp)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed_occurrences,
       CAST(coalesce(c.tokens_removed, 0) AS BIGINT) AS tokens_removed,
       CAST(b.n - coalesce(c.tokens_removed, 0) AS BIGINT) AS tokens_kept,
       {sql_ratio_round('b.n - coalesce(c.tokens_removed, 0)', 'b.n', 4, nonneg=True)} AS kept_frac
FROM base b
LEFT JOIN cov c USING (doc_id)
"""


# --------------------------------------------------------------------------
# d18 — cleaned-corpus materialization: APPLY d17's cut. Each
# document's kept text is its token sequence with every removed
# interval excised (later occurrences of duplicated W-token runs);
# documents below the span threshold — or with nothing removed —
# pass through verbatim (whitespace-normalized). The registered
# query returns the driver-safe summary (before/after token counts +
# an md5 of the reconstructed text) rather than the text itself; a
# pipeline run would write the cleaned column as the sink.
#
# Scale: d17's linear interval chain, then reconstruction is pure
# per-document expression work — collect_list of merged intervals is
# bounded by document length, and the filter-by-position lambda is
# O(tokens x intervals) WITHIN one document only (intervals are
# merged, so a pathological doc has at most n/2 of them). No
# corpus-wide state, no extra shuffle beyond one broadcast-able
# per-doc interval join.


def d18_cleaned_corpus(
    spark: SparkSession, sf_dir: str, wide: bool = False
) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _spread(_docs(spark, sf_dir))
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", tokens_col().alias("t")
    )
    _, intervals = _span_removal_intervals(spark, sf_dir, wide=wide)
    iv = intervals.groupBy("doc_id").agg(
        F.collect_list(F.struct("s0", "e0")).alias("iv")
    )
    joined = base.join(iv, "doc_id", "left").withColumn(
        "iv",
        F.coalesce(
            "iv", F.array().cast("array<struct<s0:int,e0:int>>")
        ),
    )
    kept = F.filter(
        F.col("t"),
        lambda tok, i: ~F.exists(
            F.col("iv"), lambda v: (i >= v["s0"]) & (i <= v["e0"])
        ),
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens_before"),
        F.size(kept).cast("bigint").alias("n_tokens_after"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_md5"),
    )


_D18_SQL = f"""
WITH {_SPAN_CTES},
pos AS (
  SELECT doc_id, p, t[p + 1] AS tok
  FROM toks, unnest(range(0, len(t))) AS u(p)
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos
  WHERE NOT EXISTS (SELECT 1 FROM intervals i
                    WHERE i.doc_id = pos.doc_id
                      AND pos.p BETWEEN i.s0 AND i.e0)
),
cleaned AS (
  SELECT doc_id, count(*) AS n_after,
         md5(string_agg(tok, ' ' ORDER BY p)) AS h
  FROM kept GROUP BY doc_id
),
alldocs AS (SELECT doc_id, len(t) AS n FROM toks WHERE t IS NOT NULL)
SELECT a.doc_id,
       CAST(a.n AS BIGINT) AS n_tokens_before,
       CAST(coalesce(c.n_after, 0) AS BIGINT) AS n_tokens_after,
       coalesce(c.h, md5('')) AS cleaned_md5
FROM alldocs a
LEFT JOIN cleaned c USING (doc_id)
"""


# --------------------------------------------------------------------------
# d19 — span-level decontamination ACTION: d08 flags documents that
# share shingles with the held-out eval set; d19 removes the
# overlapping SPANS (the GPT-3/Lee et al. decontamination rule —
# excise benchmark text from training documents instead of dropping
# whole documents). The eval set models how benchmarks actually
# arise: an EXCERPT (the first EXCERPT_TOKENS tokens) of every
# doc_id % 97 == 0 page — benchmark text is web text, and the pages
# it was excerpted from are still in the crawl, so every source page
# is contaminated by construction (non-vacuous oracle, the t13
# injected-PII discipline) and so is any OTHER page sharing the run.
# Every W-token window of every training doc whose hash appears in
# the eval excerpts is marked; marks merge via the shared island
# helper; output is the per-source decontamination budget.
#
# Scale: the eval side of a real pipeline is a benchmark suite (MBs,
# not TBs), so the distinct eval-span frame is broadcast — same
# justification as d08's broadcast shingle semi-join. The train side
# is one narrow span scan; marks merge per-document; the rollup is
# one partial-aggregated groupBy(source). No all-pairs anywhere.

EXCERPT_TOKENS = 48


def d19_decontaminate_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _spread(_docs(spark, sf_dir))
    sp = _doc_spans_cached(spark, sf_dir)
    eval_h = (
        sp.filter(
            (F.col("doc_id") % 97 == 0)
            & (F.col("s") <= EXCERPT_TOKENS - SPAN_TOKENS)
        )
        .select("h")
        .distinct()
    )
    removed = (
        sp.join(F.broadcast(eval_h), "h", "left_semi")
        .select("doc_id", "s", (F.col("s") + SPAN_TOKENS - 1).alias("e"))
    )
    cov = (
        _merge_islands(removed)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e0") - F.col("s0") + 1)
            .cast("bigint")
            .alias("removed")
        )
    )
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", F.size(tokens_col()).alias("n")
    )
    return (
        base.join(cov, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("removed").alias("n_docs_touched"),
            F.sum("n").cast("bigint").alias("tokens_total"),
            F.sum(F.coalesce("removed", F.lit(0)))
            .cast("bigint")
            .alias("tokens_removed"),
            ratio_round(
                F.sum(F.coalesce("removed", F.lit(0))),
                F.sum("n"),
                6,
                nonneg=True,
            ).alias("removed_frac"),
        )
    )


_D19_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
sp AS (
  SELECT doc_id, len(t) AS n, s,
         md5(list_aggregate(list_slice(t, s + 1, s + {SPAN_TOKENS}),
                            'string_agg', ' ')) AS h
  FROM (SELECT doc_id, t FROM toks WHERE len(t) >= {SPAN_TOKENS}),
       unnest(range(0, len(t) - {SPAN_TOKENS} + 1)) AS u(s)
),
eval_h AS (
  SELECT DISTINCT h FROM sp
  WHERE doc_id % 97 = 0 AND s <= {EXCERPT_TOKENS} - {SPAN_TOKENS}
),
removed AS (
  SELECT doc_id, s, s + {SPAN_TOKENS} - 1 AS e
  FROM sp
  WHERE h IN (SELECT h FROM eval_h)
),
{_ISLAND_SQL},
cov AS (
  SELECT doc_id, CAST(sum(e0 - s0 + 1) AS BIGINT) AS removed
  FROM intervals GROUP BY doc_id
),
base AS (
  SELECT doc_id, source, len(t) AS n
  FROM toks
  WHERE t IS NOT NULL
)
SELECT b.source,
       count(*) AS n_docs,
       count(c.removed) AS n_docs_touched,
       CAST(sum(b.n) AS BIGINT) AS tokens_total,
       CAST(sum(coalesce(c.removed, 0)) AS BIGINT) AS tokens_removed,
       {sql_ratio_round('sum(coalesce(c.removed, 0))', 'sum(b.n)', 6, nonneg=True)} AS removed_frac
FROM base b
LEFT JOIN cov c USING (doc_id)
GROUP BY b.source
"""


# --------------------------------------------------------------------------
# d20 — incremental exact-substring dedup: d17's corpus-wins rule at
# recrawl time. The existing corpus owns every span it contains
# (its occurrences all precede the batch), so a batch document's
# W-token window is removed iff its hash EXISTS in the corpus —
# membership, not ranks — plus d17's first-copy rule WITHIN the
# batch for spans the corpus has never seen (a batch that
# re-crawls the same new page twice must also dedup against
# itself). Output is the d17-shaped per-batch-doc budget. Corpus =
# doc_id % 2 == 0, batch = % 2 == 1 (the d06/d16 split).
#
# Scale: the registered query computes the corpus side inline (the
# driver contract); pipeline/ann_index.py::write_span_index
# materializes the DISTINCT corpus span hashes partitioned by
# pmod(h, SPAN_INDEX_SHARDS) and probe_span_index reproduces this
# query's removal budget from the index with the batch's shard set
# as a LITERAL partition predicate — pinned equal, and
# partition-pruning asserted, in tests/test_ann_index.py. Batch
# self-dedup is one window over batch-only span hashes.


def d20_incremental_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from rfb_data_pipeline_spark.operators.text import tokens_col

    docs = _spread(_docs(spark, sf_dir))
    sp = _doc_spans_cached(spark, sf_dir)
    corpus_h = sp.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    batch_sp = sp.filter(F.col("doc_id") % 2 == 1)
    # One pass decides both removal rules (r13, guide §2.4): the old
    # shape ran a left_semi (corpus-seen spans) AND a left_anti + rank
    # window (batch first-copy rule) against the SAME corpus_h — two
    # joins, each rebuilding the corpus-distinct aggregate and
    # re-shuffling batch_sp by h. A single left join with a presence
    # marker keeps both row sets apart, and the rank window reuses the
    # join's hash partitioning on h (sort only, no new exchange). A
    # span is removed iff its hash exists in the corpus (membership —
    # every occurrence goes) OR it is a corpus-unseen span that is not
    # the batch's first copy (rn > 1); for an unseen h the window
    # partition holds exactly the rows the old anti-join window held,
    # so the rn values — and the removed row set — are identical.
    first_rank = Window.partitionBy("h").orderBy("doc_id", "s")
    removed = (
        batch_sp.join(corpus_h.withColumn("seen", F.lit(1)), "h", "left")
        .withColumn("rn", F.row_number().over(first_rank))
        .filter(F.col("seen").isNotNull() | (F.col("rn") > 1))
        .select("doc_id", "s", (F.col("s") + SPAN_TOKENS - 1).alias("e"))
    )
    cov = (
        _merge_islands(removed)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e0") - F.col("s0") + 1)
            .cast("bigint")
            .alias("tokens_removed")
        )
    )
    base = (
        docs.filter(F.col("text").isNotNull())
        .filter(F.col("doc_id") % 2 == 1)
        .select(
            "doc_id", F.size(tokens_col()).cast("bigint").alias("n_tokens")
        )
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("tokens_removed", F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
            (F.col("n_tokens") - F.coalesce("tokens_removed", F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .withColumn(
            "kept_frac",
            ratio_round(
                F.col("tokens_kept"), F.col("n_tokens"), 4, nonneg=True
            ),
        )
    )


_D20_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
sp AS (
  SELECT doc_id, len(t) AS n, s,
         md5(list_aggregate(list_slice(t, s + 1, s + {SPAN_TOKENS}),
                            'string_agg', ' ')) AS h
  FROM (SELECT doc_id, t FROM toks WHERE len(t) >= {SPAN_TOKENS}),
       unnest(range(0, len(t) - {SPAN_TOKENS} + 1)) AS u(s)
),
corpus_h AS (SELECT DISTINCT h FROM sp WHERE doc_id % 2 = 0),
batch_sp AS (SELECT doc_id, s, h FROM sp WHERE doc_id % 2 = 1),
vs_corpus AS (
  SELECT doc_id, s FROM batch_sp WHERE h IN (SELECT h FROM corpus_h)
),
within_batch AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
    FROM batch_sp WHERE h NOT IN (SELECT h FROM corpus_h)
  ) WHERE rn > 1
),
removed AS (
  SELECT doc_id, s, s + {SPAN_TOKENS} - 1 AS e FROM vs_corpus
  UNION ALL
  SELECT doc_id, s, s + {SPAN_TOKENS} - 1 AS e FROM within_batch
),
{_ISLAND_SQL},
cov AS (
  SELECT doc_id, CAST(sum(e0 - s0 + 1) AS BIGINT) AS tokens_removed
  FROM intervals GROUP BY doc_id
),
base AS (
  SELECT doc_id, len(t) AS n FROM toks
  WHERE t IS NOT NULL AND doc_id % 2 = 1
)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(coalesce(c.tokens_removed, 0) AS BIGINT) AS tokens_removed,
       CAST(b.n - coalesce(c.tokens_removed, 0) AS BIGINT) AS tokens_kept,
       {sql_ratio_round('b.n - coalesce(c.tokens_removed, 0)', 'b.n', 4, nonneg=True)} AS kept_frac
FROM base b
LEFT JOIN cov c USING (doc_id)
"""


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_ngram_jaccard": d02_ngram_jaccard,
    "d03_minhash_lsh": d03_minhash_lsh,
    "d04_simhash": d04_simhash,
    "d05_simhash_pairs": d05_simhash_pairs,
    "d06_incremental_dedup": d06_incremental_dedup,
    "d07_dedup_clusters": d07_dedup_clusters,
    "d08_decontaminate": d08_decontaminate,
    "d09_containment": d09_containment,
    "d10_fuzzy_pairs": d10_fuzzy_pairs,
    "d12_minhash_calibration": d12_minhash_calibration,
    "d13_duplicate_spans": d13_duplicate_spans,
    "d14_dup_span_fraction": d14_dup_span_fraction,
    "d15_cc_star": d15_cc_star,
    "d16_incremental_minhash": d16_incremental_minhash,
    "d17_span_dedup_action": d17_span_dedup_action,
    "d18_cleaned_corpus": d18_cleaned_corpus,
    "d19_decontaminate_action": d19_decontaminate_action,
    "d20_incremental_span_dedup": d20_incremental_span_dedup,
}

ORACLE = {
    "d01_exact_dedup": _D01_SQL,
    "d02_ngram_jaccard": _D02_SQL,
    "d03_minhash_lsh": _minhash_sql(),
    "d04_simhash": _D04_SQL,
    "d05_simhash_pairs": _D05_SQL,
    "d06_incremental_dedup": _D06_SQL,
    "d07_dedup_clusters": _D07_SQL,
    "d08_decontaminate": _D08_SQL,
    "d09_containment": _D09_SQL,
    "d10_fuzzy_pairs": _D10_SQL,
    "d12_minhash_calibration": _d12_sql(),
    "d13_duplicate_spans": _D13_SQL,
    "d14_dup_span_fraction": _D14_SQL,
    # d15 computes the same logical result as d07 with a different
    # algorithm; sharing the oracle makes the driver hash an
    # algorithm cross-check.
    "d15_cc_star": _D15_SQL,
    "d16_incremental_minhash": _d16_sql(),
    "d17_span_dedup_action": _D17_SQL,
    "d18_cleaned_corpus": _D18_SQL,
    "d19_decontaminate_action": _D19_SQL,
    "d20_incremental_span_dedup": _D20_SQL,
}
