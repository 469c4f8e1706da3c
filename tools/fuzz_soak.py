"""Seed soak for the differential fuzz suite: sweep MANY seeds through
the same generators + comparator the pytest probes use (two seeds per
family there, to bound suite runtime). A divergence here is a real
engine-parity finding to pin as a regression test.

Usage: python tools/fuzz_soak.py [n_seeds_per_family]
Prints one line per (family, seed): ok / FAIL <first mismatching row>.
Exit code 1 if any probe failed.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from rfb_data_pipeline_spark.session import get_spark

    import tests.test_differential_fuzz as fz

    spark = get_spark("fuzz-soak")
    failures = 0
    work = Path(tempfile.mkdtemp(prefix="fuzz_soak_"))

    def probe(family: str, seed: int, gen, names, table, **gen_kw):
        nonlocal failures
        d = work / f"{family}{seed}"
        d.mkdir()
        sf_dir = gen(spark, d, seed, **gen_kw)
        for name in names:
            try:
                fz._compare(spark, sf_dir, name, table)
                print(f"ok   {family} seed={seed} {name}", flush=True)
            except AssertionError as exc:
                failures += 1
                print(f"FAIL {family} seed={seed} {name}: {exc}", flush=True)

    for i in range(n):
        seed = 1000 + 37 * i
        probe("docs", seed, fz._random_docs,
              fz._DOC_QUERIES + fz._DOC_QUERIES_2, "documents")
        probe("events", seed, fz._random_events,
              fz._EVENT_QUERIES + fz._EVENT_QUERIES_2, "events", n=200)
        probe("tpch", seed, fz._perturbed_tpch,
              fz._REL_QUERIES + fz._REL_QUERIES_2, None)
        probe("tpch_pk", seed,
              lambda s, d, sd: fz._perturbed_tpch(s, d, sd, unique_keys=True),
              fz._REL_QUERIES_PK, None)
        probe("emb", seed, fz._random_embeddings,
              ["s01_knn_bruteforce", "s04_label_centroids",
               "s09_vector_stats"], "embeddings")
        probe("emb_dirty", seed,
              lambda s, d, sd: fz._random_embeddings(s, d, sd, dirty=True),
              ["s14_embedding_validation"], "embeddings")
        # r12 families: media header tier (sparse ids), span-dedup
        # family (longer random corpora), s06's banded pipeline
        probe("media_docs", seed,
              lambda s, d, sd: fz._random_docs(s, d, sd, n=50,
                                               sparse_ids=True),
              fz._MEDIA_DOC_QUERIES, "documents")
        probe("span", seed,
              lambda s, d, sd: fz._random_docs(s, d, sd, n=70),
              fz._SPAN_QUERIES, "documents")
        probe("s06", seed,
              lambda s, d, sd: fz._random_embeddings(s, d, sd, n=120),
              ["s06_near_dup_pairs_banded"], "embeddings")
        # codec tier: size-parameterized twins, not table views
        try:
            fz.test_media_codec_differential_random_sizes(spark, seed)
            print(f"ok   media_codec seed={seed}", flush=True)
        except AssertionError as exc:
            failures += 1
            print(f"FAIL media_codec seed={seed}: {exc}", flush=True)
    print(f"\nsoak done: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
