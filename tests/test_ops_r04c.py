"""Round-4c operators: scalable connected components (d15) et al."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.dedup import cc_star


def _labels(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    return {r["doc_id"]: r["label"] for r in cc_star(edges, **kw).collect()}


def _unionfind(edge_list):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = component minimum
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: root for root, members in comp.items() for n in members}


def test_cc_star_chain_converges_in_log_rounds(spark):
    """A 64-node path graph has diameter 63: min-label propagation
    (d07's loop) needs ~63 rounds, large/small-star needs O(log n).
    max_iters=10 > log2(64) proves the round bound, not just the
    answer."""
    chain = [(i, i + 1) for i in range(63)]
    labels = _labels(spark, chain, max_iters=10)
    assert set(labels) == set(range(64))
    assert set(labels.values()) == {0}


def test_cc_star_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _unionfind(edges)
    got = _labels(spark, edges)
    assert got == expected


def test_cc_star_two_node_components_and_duplicate_edges(spark):
    edges = [(5, 9), (9, 5), (5, 9), (20, 21), (30, 31), (31, 32)]
    got = _labels(spark, edges)
    assert got == {5: 5, 9: 5, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_t15_classifier_generalizes_beyond_the_seed_rule(spark, tmp_path):
    """The NB classifier learns token weights from the seed's t02
    pseudo-labels and must generalize: an UNSEEN doc (not in the
    doc_id%3 seed) made of good-class vocabulary scores positive;
    an unseen digit-garbage doc scores negative."""
    from rfb_data_pipeline_spark.operators.text import t15_quality_classifier

    good = "the cat is in the park and it is a good day to walk"
    bad = "737 9983 118377 44 9said 83771 22 9111 40404 737812 99 38"
    rows = []
    for i in range(60):
        rows.append((i * 3, good + f" extra{i}", "en", "s"))  # seed pos
    for i in range(12):
        rows.append((i * 3 + 30 * 6, bad + f" {i}77", "en", "s"))
    # unseen (doc_id % 3 != 0): one of each class, vocabulary only
    rows.append((1001, "the cat is in the park and it is good", "en", "s"))
    rows.append((1003, "9983 44 83771 9111 40404 99", "en", "s"))
    d = str(tmp_path / "t15")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")

    out = {r["doc_id"]: r for r in t15_quality_classifier(spark, d).collect()}
    assert out[1001]["pred_quality"] == 1
    assert out[1003]["pred_quality"] == 0
    assert out[1001]["nb_logodds"] > out[1003]["nb_logodds"]
    # both probes sit OUTSIDE the seed (doc_id % 3 != 0)
    assert 1001 % 3 != 0 and 1003 % 3 != 0


def test_s13_pq_recalls_planted_neighbors(spark, tmp_path):
    """On structured data (a tight cluster around the query amid a
    spread-out background) PQ codes isolate the cluster and ADC
    retrieves the planted neighbors. On near-uniform data 12-bit codes
    cannot — that measured limit is documented on the operator."""
    import math

    from rfb_data_pipeline_spark.operators.similarity import DIM, s13_pq_ann

    rng_base = [math.sin(7 * i) for i in range(DIM)]
    rows = []
    # background: 100 vectors on distinct far-away patterns
    for vid in range(100):
        rows.append(
            (
                vid,
                [5.0 * math.cos(vid + 3 * i) for i in range(DIM)],
                vid % 4,
            )
        )
    # planted: 10 tight neighbors of the query pattern
    rows.append((200, rng_base, 9))  # the query itself
    for j in range(10):
        rows.append(
            (201 + j, [x + 0.01 * math.sin(j + i) for i, x in enumerate(rng_base)], 9)
        )
    d = str(tmp_path / "pq")
    spark.createDataFrame(
        [(v, [float(x) for x in e], lbl) for v, e, lbl in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(d + "/embeddings.parquet")

    got = {r["vec_id"] for r in s13_pq_ann(spark, d, query_vec_id=200).collect()}
    planted = set(range(201, 211))
    assert len(got & planted) >= 9


def test_s15_ivf_pq_prunes_to_probe_cells_and_recalls_planted(spark, tmp_path):
    """IVF-PQ: every result must come from a probed cell, and a tight
    planted cluster sharing the query's cell must be retrieved."""
    import math

    from rfb_data_pipeline_spark.operators.similarity import (
        DIM,
        _emb,
        _ivf_probe_cells,
        s15_ivf_pq_ann,
    )

    base = [math.sin(7 * i) for i in range(DIM)]
    rows = [(0, base, 9)]  # the query (QUERY_VEC_ID = 0), cell 9
    for vid in range(1, 101):
        rows.append(
            (vid, [5.0 * math.cos(vid + 3 * i) for i in range(DIM)], vid % 4)
        )
    for j in range(10):  # planted neighbors, same cell as the query
        rows.append(
            (201 + j, [x + 0.01 * math.sin(j + i) for i, x in enumerate(base)], 9)
        )
    d = str(tmp_path / "ivfpq")
    spark.createDataFrame(
        [(v, [float(x) for x in e], lbl) for v, e, lbl in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(d + "/embeddings.parquet")

    probe = {r["label"] for r in _ivf_probe_cells(_emb(spark, d)).collect()}
    assert 9 in probe  # the coarse quantizer finds the query's cell
    out = s15_ivf_pq_ann(spark, d).collect()
    assert all(r["label"] in probe for r in out)
    got = {r["vec_id"] for r in out}
    assert len(got & set(range(201, 211))) >= 9


def test_x14_epoch_plan_matches_python_model_and_flags_over_repeat(spark):
    """A mixture skewed toward a token-poor domain must imply >4
    epochs for it (over_repeated=1); the arithmetic is verified
    against a plain Python model of the same plan."""
    import math

    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.operators.sampling import x14_epoch_plan

    from tests.conftest import SF_SMALL as sf
    parts = {"en": 1, "de": 1, "es": 1, "fr": 1, "zh": 20}
    out = {r["lang"]: r for r in x14_epoch_plan(spark, sf, mix_parts=parts).collect()}

    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "lang", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
    )
    toks = {
        r["lang"]: r["s"]
        for r in docs.groupBy("lang").agg(F.sum("n").alias("s")).collect()
    }
    corpus = sum(toks.values())
    for lang, part in parts.items():
        target = math.floor(corpus * 3 * part / sum(parts.values()))
        assert out[lang]["target_tokens"] == target
        epochs = math.floor(target / toks[lang] * 100 + 0.5) / 100
        assert abs(out[lang]["epochs"] - epochs) < 1e-9
        assert out[lang]["over_repeated"] == (1 if epochs > 4.0 else 0)
    assert out["zh"]["over_repeated"] == 1
    assert out["en"]["over_repeated"] == 0


def _py_split(doc_id):
    """Python twin of sampling.split_col's md5-bucket rule."""
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    bucket = int(h[0], 16) * 16 + int(h[1], 16)
    pct = int(bucket * 100.0 / 256)
    return "train" if pct < 80 else ("val" if pct < 90 else "test")


def test_x15_detects_planted_split_drift(spark, tmp_path):
    """A corpus whose val-split docs use a disjoint vocabulary must
    show large KL(train||val) while the homogeneous corpus shows near
    zero — the audit actually detects drift, not just computes a
    number."""
    from rfb_data_pipeline_spark.operators.sampling import x15_split_drift

    base = "the cat sat on the mat and the dog ran in the park"
    skew = "zq xv qj vk jx kq zz vv qq xx jj kk zx vq"
    clean_rows, drift_rows = [], []
    for i in range(400):
        clean_rows.append((i, base + f" w{i % 7}", "en", "s"))
        drifted = skew if _py_split(i) == "val" else base
        drift_rows.append((i, drifted + f" w{i % 7}", "en", "s"))
    for name, rows in (("clean", clean_rows), ("drift", drift_rows)):
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        ).write.parquet(str(tmp_path / name / "documents.parquet"))

    clean = x15_split_drift(spark, str(tmp_path / "clean")).collect()[0]
    drift = x15_split_drift(spark, str(tmp_path / "drift")).collect()[0]
    assert clean["kl_train_val"] < 0.05
    assert drift["kl_train_val"] > clean["kl_train_val"] + 0.5
    # the test split was NOT drifted, so its KL stays near the clean one
    assert drift["kl_train_test"] < 0.05


def test_x16_selects_exactly_the_top_quota_by_quality(spark):
    """x16's banded selection must equal a plain Python model: per
    lang, sort by (-score, doc_id), take the x10-formula quota — the
    checksum pins WHICH docs were chosen, not just how many."""
    import math
    from collections import defaultdict

    from rfb_data_pipeline_spark.operators.sampling import (
        MIX_PARTS,
        MIX_TOTAL,
        x16_quality_mixture,
    )
    from rfb_data_pipeline_spark.operators.text import t15_quality_classifier

    from tests.conftest import SF_SMALL as sf

    scores = {
        r["doc_id"]: r["nb_logodds"]
        for r in t15_quality_classifier(spark, sf).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(sf + "/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    by_lang = defaultdict(list)
    for doc_id, s in scores.items():
        by_lang[langs[doc_id]].append((-s, doc_id))
    t_max = min(
        math.floor(len(v) * MIX_TOTAL / MIX_PARTS[lg])
        for lg, v in by_lang.items()
    )
    out = {r["lang"]: r for r in x16_quality_mixture(spark, sf).collect()}
    for lg, items in by_lang.items():
        quota = math.floor(MIX_PARTS[lg] * t_max / MIX_TOTAL)
        sel = sorted(items)[:quota]
        assert out[lg]["quota"] == quota
        assert out[lg]["n_selected"] == len(sel)
        assert out[lg]["sel_checksum"] == sum(d for _, d in sel)
        assert abs(out[lg]["quality_floor"] - round(-sel[-1][0], 3)) < 1e-9


def test_t16_extraction_roundtrips_adversarial_text(spark, tmp_path):
    """The escape→wrap→extract chain must recover the normalized
    original body (plus the known h1/footer frame) even when the
    source text contains markup metacharacters, entities-looking
    strings, and messy whitespace."""
    from pyspark.sql import functions as F

    from rfb_data_pipeline_spark.operators.text import _t16_wrap, t16_html_extract

    texts = {
        1: "plain words only here",
        2: "angle <brackets> and & ampersand and a fake <script>alert(1)</script>",
        3: "already-escaped-looking &amp;lt; stays literal",
        4: "messy   \t whitespace\n\n  everywhere",
    }
    rows = [(k, v, "en", "s") for k, v in texts.items()]
    d = str(tmp_path / "t16")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")

    out = {r["doc_id"]: r for r in t16_html_extract(spark, d).collect()}
    import hashlib
    import re

    for k, v in texts.items():
        norm = re.sub(r"\s+", " ", v).strip()
        expected = f"Doc {k} {norm} (c) 2026 Example & Co"
        assert out[k]["content_fp"] == hashlib.md5(expected.encode()).hexdigest(), k
        assert out[k]["text_len"] == len(expected)


def test_d16_flags_edited_recrawl_but_not_novel_docs(spark, tmp_path):
    """A lightly-edited re-crawl of a corpus page (high Jaccard) must
    be flagged against the signature index; a novel page must not."""
    from rfb_data_pipeline_spark.operators.dedup import d16_incremental_minhash

    base = " ".join(f"tok{i}" for i in range(60))
    edited = " ".join(("EDIT" if i == 30 else f"tok{i}") for i in range(60))
    novel = " ".join(f"other{i}" for i in range(60))
    rows = [
        (0, base, "en", "corpus"),  # corpus (even)
        (2, " ".join(f"pad{i}" for i in range(40)), "en", "corpus"),
        (1, edited, "en", "recrawl"),  # batch (odd): near-dup of 0
        (3, novel, "en", "fresh"),  # batch: novel
    ]
    d = str(tmp_path / "d16")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")

    out = {r["source"]: r for r in d16_incremental_minhash(spark, d).collect()}
    assert out["recrawl"]["n_near_dup"] == 1
    assert out["recrawl"]["first_dup_doc"] == 1
    assert out["fresh"]["n_near_dup"] == 0


def test_simhash_wide_matches_python_model(spark, tmp_path):
    """64-bit fingerprints (hi, lo) must equal an independent Python
    md5-vote model bit-for-bit."""
    import hashlib
    import re

    from rfb_data_pipeline_spark.operators.dedup import _simhash_wide_df

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "pack my box with five dozen liquor jugs today",
        3: "the quick brown fox jumps over the lazy dog",  # dup of 1
        4: "numbers 123 456 789 and symbols #$% here",
    }
    d = str(tmp_path / "sw")
    spark.createDataFrame(
        [(k, v, "en", "s") for k, v in texts.items()],
        "doc_id bigint, text string, lang string, source string",
    ).write.parquet(d + "/documents.parquet")

    def model(text):
        lo_v, hi_v = [0] * 32, [0] * 32
        for w in re.split(r"\s+", text.strip()):
            h = hashlib.md5(w.encode()).hexdigest()
            for i in range(32):
                v = int(h[i], 16)
                lo_v[i] += 1 if (v >> 3) & 1 else -1
                hi_v[i] += 1 if (v >> 2) & 1 else -1
        lo = sum(1 << i for i in range(32) if lo_v[i] > 0)
        hi = sum(1 << i for i in range(32) if hi_v[i] > 0)
        return hi, lo

    got = {r["doc_id"]: (r["hi"], r["lo"]) for r in _simhash_wide_df(spark, d).collect()}
    for k, v in texts.items():
        assert got[k] == model(v), k
    assert got[1] == got[3]  # exact dup -> identical fingerprint


def test_simhash_64bit_collapses_noise_pairs(spark, tmp_path):
    """On a corpus large enough for 32-bit random collisions, the
    64-bit pairs are a strict subset (hamming64 >= hamming-on-lo, and
    the lo word IS the 32-bit fingerprint): planted duplicates survive
    at both widths, noise pairs collapse at 64."""
    import random

    from rfb_data_pipeline_spark.operators.dedup import (
        d05_simhash_pairs,
        simhash_pairs_wide,
    )

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(4000)]
    rows = []
    for i in range(5000):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(10)), "en", "s"))
    # planted exact duplicates (hamming 0 at any width)
    for j in range(5):
        rows.append((10000 + j, rows[j][1], "en", "s"))
    d = str(tmp_path / "noise")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(d + "/documents.parquet")

    p32 = {(r["doc_a"], r["doc_b"]) for r in d05_simhash_pairs(spark, d).collect()}
    p64 = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs_wide(spark, d).collect()}
    planted = {(j, 10000 + j) for j in range(5)}
    assert planted <= p64 and planted <= p32
    assert p64 <= p32  # ham64 <= 2 implies ham(lo) <= 2
    # the 32-bit width admits random collisions at this corpus size;
    # 64-bit collapses them
    assert len(p32) > len(p64)
    assert len(p64 - planted) <= 2


def test_d15_equals_d07_on_the_corpus(spark):
    """Two independent CC algorithms over DIFFERENTLY-SOURCED pair
    graphs must produce identical cluster summaries: d07 runs
    min-label propagation on d02's exact all-pairs edges, d15 runs
    large/small-star on d03's LSH-verified edges (its r05 scale-safe
    recomposition). Equality checks both the algorithms AND that LSH
    candidate recall is total at the threshold on this corpus."""
    from rfb_data_pipeline_spark.operators.dedup import (
        d07_dedup_clusters,
        d15_cc_star,
    )

    from tests.conftest import SF_SMALL as sf
    a = d07_dedup_clusters(spark, sf).orderBy("cluster_id").collect()
    b = d15_cc_star(spark, sf).orderBy("cluster_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cc_star_d02_edges_equal_d03_edges(spark):
    """The d02-sourced cc_star variant (pre-r05 composition) is kept
    as an equality cross-check against the d03-sourced production
    query: same threshold, same verification, same clusters."""
    from pyspark.sql import functions as SF

    from rfb_data_pipeline_spark.operators.dedup import (
        _cluster_summary,
        d02_ngram_jaccard,
        d03_minhash_lsh,
    )

    from tests.conftest import SF_SMALL as sf
    by_d02 = _cluster_summary(
        cc_star(
            d02_ngram_jaccard(spark, sf).select(
                SF.col("doc_a").alias("u"), SF.col("doc_b").alias("v")
            )
        )
    ).orderBy("cluster_id").collect()
    by_d03 = _cluster_summary(
        cc_star(
            d03_minhash_lsh(spark, sf).select(
                SF.col("doc_a").alias("u"), SF.col("doc_b").alias("v")
            )
        )
    ).orderBy("cluster_id").collect()
    assert [tuple(r) for r in by_d02] == [tuple(r) for r in by_d03]


def test_stage_boundary_storage_mode_d15_d07(spark, monkeypatch):
    """The storage-backed stage boundary (reliable checkpoint — the
    'persisted intermediate table at pipeline scale' the docstrings
    promise) must be a pure materialization detail: d07 and d15 run
    through it bit-identical to local mode."""
    from rfb_data_pipeline_spark.operators.dedup import (
        d07_dedup_clusters,
        d15_cc_star,
    )

    from tests.conftest import SF_SMALL as sf

    local = {
        name: fn(spark, sf).orderBy("cluster_id").collect()
        for name, fn in (("d07", d07_dedup_clusters), ("d15", d15_cc_star))
    }
    monkeypatch.setenv("RFB_STAGE_BOUNDARY_MODE", "storage")
    for name, fn in (("d07", d07_dedup_clusters), ("d15", d15_cc_star)):
        stored = fn(spark, sf).orderBy("cluster_id").collect()
        assert [tuple(r) for r in stored] == [tuple(r) for r in local[name]], name


def test_stage_boundary_rejects_unknown_mode():
    from rfb_data_pipeline_spark.plans.stage import _resolve_mode

    import pytest as _pytest

    assert _resolve_mode(None) == "local"
    assert _resolve_mode("storage") == "storage"
    with _pytest.raises(ValueError):
        _resolve_mode("replicated")
