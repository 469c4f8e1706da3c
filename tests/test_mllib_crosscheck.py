"""Independent-implementation cross-check: our hand-rolled MinHash/
Jaccard dedup (d02 exact, d03 banded) against MLlib's MinHashLSH
(SURVEY.md §2.2 names it as the builtin alternative). Two codebases,
two hash families — agreement on the high-similarity pairs is strong
evidence neither is systematically wrong.
"""

from __future__ import annotations

import pytest
from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from rfb_data_pipeline_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _doc_shingles,
    _docs,
)
from tests.conftest import SF_SMALL

_QUERIES = entry_mod.queries()


def test_minhash_agrees_with_mllib(spark):
    # our exact pairs (the d02 verifier of record)
    exact = {
        (r.doc_a, r.doc_b)
        for r in _QUERIES["d02_ngram_jaccard"](spark, SF_SMALL).collect()
    }
    assert exact, "corpus must contain near-dup pairs"

    # MLlib pipeline over the SAME shingle sets
    shingle_sets = (
        _doc_shingles(_docs(spark, SF_SMALL))
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("shingles"))
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingle_sets).filter(
        F.size("shingles") > 0
    )
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(
        feats, feats, 1.0 - JACCARD_THRESHOLD + 0.05, distCol="jdist"
    )
    mllib_pairs = {
        (r.a, r.b)
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    # MLlib's candidate set (hash-feature Jaccard, its own MinHash
    # family) must recover the overwhelming majority of the exact
    # pairs; both directions are probabilistic so exact set equality
    # is not the contract.
    recovered = len(exact & mllib_pairs) / len(exact)
    assert recovered >= 0.9, (recovered, len(exact), len(mllib_pairs))
