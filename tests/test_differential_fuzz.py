"""Differential fuzz: registry rows recomputed from scratch by BOTH
engines on RANDOM corpora (the s16 random-corpus pattern, r09,
extended to the text/dedup/sampling/events families in r11).

The driver's oracle gate runs on the driver-generated fixtures, whose
shapes every query was developed against — a shared-spec bug that
both sides encode identically for fixture-shaped data can hide there.
These tests regenerate the inputs randomly (including the edges the
fixtures avoid: empty text, whitespace-only text, NULL text/lang,
repeated documents, malformed JSON props, NULL props) and require the
full value hash to agree. A mismatch here is a real engine-parity
finding, not noise."""

from __future__ import annotations

import os

import duckdb as _duck
import numpy as np
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import UnhashableCell, _normalize, value_hash

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

_WORDS = [
    "the", "of", "and", "data", "spark", "scan", "merge", "janela",
    "ação", "über", "chät", "x1", "k", "zzz", "0012", "a-b", "a.b,c",
]


def _random_docs(
    spark, d, seed: int, n: int = 60, sparse_ids: bool = False
) -> str:
    rng = np.random.RandomState(seed)
    # sparse_ids: unique random doc_ids instead of 0..n-1 — the media
    # header tier (m05-m08) derives its payload bytes from doc_id, so
    # the id VALUES are the fuzz axis there (r12)
    ids = (
        sorted(int(x) for x in rng.choice(10**9, size=n, replace=False))
        if sparse_ids
        else list(range(n))
    )
    rows = []
    for i in ids:
        kind = rng.randint(0, 12)
        if kind == 0:
            text = None
        elif kind == 1:
            text = ""
        elif kind == 2:
            text = "   "
        elif kind == 3 and rows:
            text = rows[rng.randint(0, len(rows))][1]  # exact duplicate
        else:
            k = int(rng.randint(1, 40))
            words = [ _WORDS[rng.randint(0, len(_WORDS))] for _ in range(k) ]
            sep = "  " if rng.randint(0, 4) == 0 else " "
            text = sep.join(words)
            if rng.randint(0, 5) == 0:
                text = " " + text + "  "
        lang = [None, "en", "es", "pt", "de"][rng.randint(0, 5)]
        source = f"src{rng.randint(0, 3)}"
        rows.append((i, text, lang, source, len(text) if text else 0))
    (
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )
        .coalesce(1)
        .write.parquet(str(d / "documents.parquet"))
    )
    return str(d)


def _random_events(spark, d, seed: int, n: int = 150) -> str:
    import datetime as dt

    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 5, 1)
    types = ["view", "click", "purchase", "search"]
    rows = []
    for i in range(n):
        ts = base + dt.timedelta(
            seconds=int(rng.randint(0, 3 * 86400))
        )
        props_kind = rng.randint(0, 6)
        if props_kind == 0:
            props = None
        elif props_kind == 1:
            props = "not json at all"
        elif props_kind == 2:
            props = '{"k": null}'
        else:
            props = '{"k": %d}' % int(rng.randint(0, 25))
        rows.append(
            (
                i,
                ts,
                int(rng.randint(0, 20)),
                types[rng.randint(0, len(types))],
                float(np.round(rng.uniform(0, 100), 2)),
                props,
            )
        )
    (
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string",
        )
        .coalesce(1)
        .write.parquet(str(d / "events.parquet"))
    )
    return str(d)


def _compare(spark, sf_dir: str, name: str, table: str | None = None) -> None:
    spdf = _QUERIES[name](spark, sf_dir).toPandas()
    con = _duck.connect()
    tables = (
        [table]
        if table
        else [
            f[: -len(".parquet")]
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        ]
    )
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    opdf = con.execute(_ORACLES[name]).fetchdf()
    con.close()
    _assert_frames_match(name, spdf, opdf)


def _cells_close(a: str, b: str) -> bool:
    """Half-cent tolerance for 2-decimal-rounded float cells (VERDICT
    r13 item 1): Spark and DuckDB interpolate even-count medians /
    quantiles in float arithmetic and can land one float ulp apart on
    opposite sides of a round(x, 2) half-way boundary (252721.355 ->
    .35 vs .36 — seed-83 perturbed q23). The tolerance applies ONLY to
    cells that are exact multiples of 0.01 on BOTH sides (the rounded
    money/median class); integers, strings and full-precision fractions
    keep the exact comparison."""
    if a == b:
        return True
    if "." not in a or "." not in b:
        return False
    try:
        fa, fb = float(a), float(b)
    except ValueError:
        return False
    cents_a, cents_b = fa * 100, fb * 100
    if abs(cents_a - round(cents_a)) > 1e-6 or abs(cents_b - round(cents_b)) > 1e-6:
        return False  # not a round(x, 2) output: stay exact
    return abs(fa - fb) <= 0.01 + 1e-9


def _assert_frames_match(name: str, spdf, opdf) -> None:
    assert sorted(spdf.columns) == sorted(opdf.columns), name
    assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
    try:
        sn, on = _normalize(spdf), _normalize(opdf)
    except UnhashableCell as exc:  # would crash the driver canon too
        raise AssertionError(f"{name}: {exc}") from exc
    if value_hash(sn) == value_hash(on):
        return
    for a, b in zip(sn, on):
        if a == b:
            continue
        if not all(_cells_close(x, y) for x, y in zip(a, b)):
            raise AssertionError(f"{name}: first diff spark={a} duckdb={b}")


_DOC_QUERIES = [
    "t01_token_stats",
    "t02_quality_score",
    "t03_langid",
    "t04_fingerprint",
    "t09_bpe_token_count",
    "d01_exact_dedup",
    "d04_simhash",
    "x01_split_assign",
    "x04_chunk_documents",
    # tie-break-sensitive rows: top-k / caps / pair joins on random
    # data probe exactly where engine orderings classically diverge
    "t05_top_terms",
    "t08_top_bigrams",
    "x02_cap_per_group",
    "d02_ngram_jaccard",
    "d09_containment",
]

_EVENT_QUERIES = [
    "e01_tumbling_hourly",
    "e04_dedup_first",
    "e07_json_extract",
]


@pytest.mark.parametrize("seed", [11, 47])
@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_doc_queries_differential_random_corpus(spark, tmp_path, seed, name):
    d = tmp_path / f"docs{seed}"
    d.mkdir()
    sf_dir = _random_docs(spark, d, seed)
    _compare(spark, sf_dir, name, "documents")


@pytest.mark.parametrize("seed", [13, 59])
@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_event_queries_differential_random_stream(
    spark, tmp_path, seed, name
):
    d = tmp_path / f"ev{seed}"
    d.mkdir()
    sf_dir = _random_events(spark, d, seed)
    _compare(spark, sf_dir, name, "events")


def _perturbed_tpch(spark, d, seed: int, unique_keys: bool = False) -> str:
    """Bootstrap-perturbed copies of every sf0.001 TPC-H table:
    row-level sampling WITH replacement (duplicates + dropped rows —
    empty/singleton groups appear), cents-exact price rescaling, and
    date shifts. Mutations stay inside the data contract (no NULLs in
    NOT-NULL TPC-H columns) while breaking every distributional
    assumption the fixtures bake in. FK values remain drawn from the
    real key population, so joins stay meaningful."""
    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.001"
    rng = np.random.RandomState(seed)
    frac = float(rng.uniform(0.5, 1.0))  # sample() caps at 1 w/o repl.
    shift = int(rng.randint(-90, 90))
    scale_cents = int(rng.randint(50, 200))  # price x0.50..x2.00 exact
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = f[: -len(".parquet")]
        df = spark.read.parquet(os.path.join(src, f))
        if t in ("lineitem", "orders"):
            if unique_keys:
                # PK-preserving subset: the v-rows' oracles are
                # INJECTION-PREDICATE closed forms, valid only under
                # the orders primary-key contract — duplicated keys
                # make the Spark side's REAL detector right and the
                # closed form wrong by construction (found by this
                # suite's own first run)
                df = df.sample(frac, seed=seed)
            else:
                # bootstrap: union of two independent samples
                # approximates sampling with replacement (duplicates
                # guaranteed) — seeded, so both engines read the
                # identical bytes
                df = df.sample(frac, seed=seed).unionAll(
                    df.sample(max(0.0, frac - 0.4), seed=seed + 1)
                )
        if t == "lineitem":
            src_type = dict(df.dtypes)["l_extendedprice"]
            df = df.withColumn(
                "l_extendedprice",
                # cents-exact rescale, PRESERVING the source column's
                # dtype — a dtype change would alter the aggregate's
                # result type on the Spark side only (decimal str vs
                # float canon) and fake a mismatch
                (
                    F.round(F.col("l_extendedprice") * scale_cents / 100, 2)
                ).cast(src_type),
            ).withColumn("l_shipdate", F.date_add("l_shipdate", shift))
        if t == "orders":
            df = df.withColumn(
                "o_orderdate", F.date_add("o_orderdate", shift)
            )
        df.coalesce(1).write.parquet(str(d / f))
    return str(d)


_REL_QUERIES = [
    "q01_pricing_summary",
    "q07_semi_join",
    "q08_anti_join",
    "q15_conditional_agg",
    "q16_having",
    "q23_median_stats",
    "q27_above_nation_avg",
    "q31_stats_agg",
    "q34_histogram",
]


@pytest.mark.parametrize("seed", [5, 83])
@pytest.mark.parametrize("name", _REL_QUERIES)
def test_relational_differential_perturbed_tpch(spark, tmp_path, seed, name):
    d = tmp_path / f"tpch{seed}"
    d.mkdir()
    sf_dir = _perturbed_tpch(spark, d, seed)
    _compare(spark, sf_dir, name)


def _random_embeddings(
    spark, d, seed: int, n: int = 80, dirty: bool = False
) -> str:
    from rfb_data_pipeline_spark.operators.similarity import DIM

    rng = np.random.RandomState(seed)
    rows = []
    for vid in range(n):
        emb = [float(x) for x in rng.standard_normal(DIM)]
        if dirty:
            k = rng.randint(0, 10)
            if k == 0:
                emb = None
            elif k == 1:
                emb = emb[: DIM - 3]  # wrong dim
            elif k == 2:
                emb[int(rng.randint(0, DIM))] = float("nan")
            elif k == 3:
                emb = [0.0] * DIM  # zero norm
        rows.append((vid, emb, int(vid % 5)))
    (
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        .coalesce(1)
        .write.parquet(str(d / "embeddings.parquet"))
    )
    return str(d)


@pytest.mark.parametrize("seed", [3, 71])
@pytest.mark.parametrize(
    "name",
    ["s01_knn_bruteforce", "s04_label_centroids", "s09_vector_stats"],
)
def test_similarity_differential_random_embeddings(
    spark, tmp_path, seed, name
):
    d = tmp_path / f"emb{seed}"
    d.mkdir()
    sf_dir = _random_embeddings(spark, d, seed)
    _compare(spark, sf_dir, name, "embeddings")


@pytest.mark.parametrize("seed", [29, 101])
def test_s14_validation_differential_dirty_embeddings(
    spark, tmp_path, seed
):
    """s14's whole job is flagging invalid vectors — fuzz it with the
    invalid shapes themselves (NULL, wrong-dim, NaN, zero-norm) and
    require both engines to agree on every verdict."""
    d = tmp_path / f"dirty{seed}"
    d.mkdir()
    sf_dir = _random_embeddings(spark, d, seed, dirty=True)
    _compare(spark, sf_dir, "s14_embedding_validation", "embeddings")


# Graph rows consume events.props.k items; e-rows below cover the
# session/asof/concurrency shapes whose window semantics are the
# likeliest place for engine drift under random timestamps (ties!).
_EVENT_QUERIES_2 = [
    "e03_sessionize",
    "e09_asof_join",
    "e14_max_concurrency",
    "e21_transition_matrix",
    "g01_item_pagerank",
    "g02_item_triangles",
    "g04_item_similarity",
    "g06_lpa_communities",
]

_DOC_QUERIES_2 = [
    "x03_stratified_sample",
    "x09_pack_sequences",
    "x13_weighted_sample",
    "x16_quality_mixture",
    "t13_pii_redaction",
]


@pytest.mark.parametrize("seed", [17])
@pytest.mark.parametrize("name", _EVENT_QUERIES_2)
def test_event_graph_differential_random_stream(spark, tmp_path, seed, name):
    d = tmp_path / f"evg{seed}"
    d.mkdir()
    sf_dir = _random_events(spark, d, seed, n=220)
    _compare(spark, sf_dir, name, "events")


@pytest.mark.parametrize("seed", [23])
@pytest.mark.parametrize("name", _DOC_QUERIES_2)
def test_doc_queries_2_differential_random_corpus(
    spark, tmp_path, seed, name
):
    d = tmp_path / f"docs2_{seed}"
    d.mkdir()
    sf_dir = _random_docs(spark, d, seed, n=90)
    _compare(spark, sf_dir, name, "documents")


# Window/rank/set-op/integrity rows: duplicates and dropped rows from
# the bootstrap hit exactly the frames (ties in rank order, lag over
# repeated dates, set-op multiplicity, duplicate-key detection) where
# engine semantics classically differ.
_REL_QUERIES_2 = [
    "q02_argmin_supplier",
    "q09_topk_per_group",
    "q10_monthly_lag",
    "q12_set_ops",
    "q20_running_total",
    "q26_intersect",
    "q36_snapshot_diff",
]

# injection-predicate rows: their oracles are closed forms over the
# %-rule injections and REQUIRE the orders PK contract to hold
_REL_QUERIES_PK = ["v01_integrity_report", "v02_duplicate_keys_report"]


@pytest.mark.parametrize("seed", [37])
@pytest.mark.parametrize("name", _REL_QUERIES_2)
def test_relational_2_differential_perturbed_tpch(
    spark, tmp_path, seed, name
):
    d = tmp_path / f"tpch2_{seed}"
    d.mkdir()
    sf_dir = _perturbed_tpch(spark, d, seed)
    _compare(spark, sf_dir, name)


@pytest.mark.parametrize("seed", [37, 61])
@pytest.mark.parametrize("name", _REL_QUERIES_PK)
def test_integrity_differential_pk_preserving(spark, tmp_path, seed, name):
    d = tmp_path / f"tpchpk{seed}"
    d.mkdir()
    sf_dir = _perturbed_tpch(spark, d, seed, unique_keys=True)
    _compare(spark, sf_dir, name)


# --------------------------------------------------------------------------
# r12 extensions (VERDICT r11 item 2): the families the suite did not
# cover — media (was 0/10), the span-dedup family, and s06.

# Header tier: payload bytes are pure functions of documents.doc_id,
# so SPARSE RANDOM id values are the fuzz axis (pmod/slicing edges the
# sequential fixture ids never exercise).
_MEDIA_DOC_QUERIES = [
    "m05_header_parse",
    "m06_subtitle_parse",
    "m07_id3_tag_parse",
    "m08_wav_header_parse",
]


@pytest.mark.parametrize("seed", [7, 43])
@pytest.mark.parametrize("name", _MEDIA_DOC_QUERIES)
def test_media_header_differential_sparse_ids(spark, tmp_path, seed, name):
    d = tmp_path / f"md{seed}"
    d.mkdir()
    sf_dir = _random_docs(spark, d, seed, n=50, sparse_ids=True)
    _compare(spark, sf_dir, name, "documents")


@pytest.mark.parametrize("seed", [19, 53])
def test_media_codec_differential_random_sizes(spark, seed):
    """Codec tier (m01-m04, m09, m10): the corpus is synthesized from
    a size constant baked into BOTH engines, so the constant itself is
    the fuzz axis — every query accepts a size override (r12) and the
    SQL twin is a builder over the same parameter. Random sizes move
    every id's payload length, kind assignment, and md5 chain."""
    from rfb_data_pipeline_spark.operators import media as M

    rng = np.random.RandomState(seed)
    n = int(rng.randint(3, 64))
    n_jpeg = int(rng.randint(1, 16))
    nv, nf = int(rng.randint(1, 5)), int(rng.randint(1, 6))
    con = _duck.connect()
    try:
        cases = [
            ("m01", M.m01_image_metadata(spark, "", n_media=n), M._m01_sql(n)),
            ("m02", M.m02_media_stats(spark, "", n_media=n), M._m02_sql(n)),
            ("m03", M.m03_frame_sample(spark, "", n_media=n), M._m03_sql(n)),
            ("m04", M.m04_audio_frames(spark, "", n_media=n), M._m04_sql(n)),
            (
                "m09",
                M.m09_jpeg_roundtrip(spark, "", n_images=n_jpeg),
                M._m09_sql(n_jpeg),
            ),
            (
                "m10",
                M.m10_mjpeg_frames(spark, "", n_videos=nv, n_frames=nf),
                M._m10_sql(nv, nf),
            ),
        ]
        for name, spdf, sql in cases:
            _assert_frames_match(
                f"{name}@n={n}", spdf.toPandas(), con.execute(sql).fetchdf()
            )
    finally:
        con.close()


# Span-dedup family: random corpora with planted exact-duplicate docs
# (kind==3 in _random_docs) guarantee shared >=W-token windows, so
# d13/d14's span tables and d17/d18's removal intervals stay
# non-vacuous while lengths/whitespace/NULLs fuzz the tokenizer edge.
_SPAN_QUERIES = [
    "d13_duplicate_spans",
    "d14_dup_span_fraction",
    "d17_span_dedup_action",
    "d18_cleaned_corpus",
    "d20_incremental_span_dedup",
]


@pytest.mark.parametrize("seed", [31, 67])
@pytest.mark.parametrize("name", _SPAN_QUERIES)
def test_span_family_differential_random_corpus(spark, tmp_path, seed, name):
    d = tmp_path / f"span{seed}"
    d.mkdir()
    # longer docs than the default corpus: the W=16 span window needs
    # token runs to fuzz against, not 1-word documents alone
    sf_dir = _random_docs(spark, d, seed, n=70)
    _compare(spark, sf_dir, name, "documents")


@pytest.mark.parametrize("seed", [41, 89])
def test_s06_banded_differential_random_embeddings(spark, tmp_path, seed):
    """s06 is the banded approximation with the most downstream
    consumers; at n<=anchor the N-adaptive ladder stays at (16, 6),
    matching the frozen SQL twin, so random corpora fuzz the banding/
    verify/dedup pipeline itself."""
    d = tmp_path / f"s06e{seed}"
    d.mkdir()
    sf_dir = _random_embeddings(spark, d, seed, n=120)
    _compare(spark, sf_dir, "s06_near_dup_pairs_banded", "embeddings")
