"""Training-corpus export sink: composition consistency (the written
corpus must agree with the x01/x05/x06 query surface), determinism /
idempotence, and partition-pruned reads."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.pipeline.export import (
    curated_docs,
    export_training_corpus,
)
from tests.conftest import SF_SMALL

_QUERIES = entry_mod.queries()


def test_export_counts_match_curation_funnel(spark, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = export_training_corpus(spark, SF_SMALL, out)
    total_written = manifest.agg(F.sum("n_docs")).collect()[0][0]
    funnel = _QUERIES["x05_corpus_curation"](spark, SF_SMALL)
    total_kept = funnel.agg(F.sum("n_kept")).collect()[0][0]
    assert total_written == total_kept


def test_export_split_and_shard_match_query_surface(spark, tmp_path):
    out = str(tmp_path / "corpus")
    export_training_corpus(spark, SF_SMALL, out)
    back = spark.read.parquet(out)
    # every written doc carries the same split x01 assigns and the
    # same shard x06 assigns (survivors are a subset of all docs)
    from rfb_data_pipeline_spark.operators.sampling import (
        N_SHARDS,
        _docs,
        _hash_bucket,
        split_col,
    )

    expected = _docs(spark, SF_SMALL).select(
        "doc_id",
        split_col(F.col("doc_id")).alias("esplit"),
        (_hash_bucket(F.col("doc_id")) % N_SHARDS).alias("eshard"),
    )
    joined = back.join(expected, "doc_id")
    bad = joined.filter(
        (F.col("split") != F.col("esplit")) | (F.col("shard") != F.col("eshard"))
    ).count()
    assert bad == 0


def test_export_idempotent_and_deterministic(spark, tmp_path):
    out = str(tmp_path / "corpus")
    m1 = {
        (r.split, r.shard): (r.n_docs, r.n_tokens, r.content_checksum)
        for r in export_training_corpus(spark, SF_SMALL, out).collect()
    }
    # overwrite in place: same manifest, no duplication, no loss
    m2 = {
        (r.split, r.shard): (r.n_docs, r.n_tokens, r.content_checksum)
        for r in export_training_corpus(spark, SF_SMALL, out).collect()
    }
    assert m1 == m2
    assert m1  # non-empty


def test_export_reads_are_partition_pruned(spark, tmp_path):
    out = str(tmp_path / "corpus")
    export_training_corpus(spark, SF_SMALL, out)
    pruned = spark.read.parquet(out).filter(
        (F.col("split") == "train") & (F.col("shard") == 0)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:250]
    assert "split" in pf and "shard" in pf
    # no eval-set docs ever reach the corpus
    leaked = (
        spark.read.parquet(out)
        .filter(F.col("doc_id") % 97 == 0)
        .count()
    )
    assert leaked == 0


def test_curated_docs_excludes_contaminated_and_dups(spark):
    cur = curated_docs(spark, SF_SMALL)
    rows = cur.collect()
    assert rows
    # exact-dup groups are collapsed to one survivor
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts))
