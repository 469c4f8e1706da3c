"""v02 key-derivation injectivity (ADVICE r07): the
(cnpj_basico, cnpj_ordem, cnpj_dv) triple must identify o_orderkey
uniquely, or distinct base rows would collide into duplicates that v5
counts but the %31-slice oracle twin does not — a silent hash break
that would only fire at sf >= ~17 (keys past 1e8). The derivation
(integrity.cnpj_triple) now carries the Euclidean quotient in
cnpj_ordem (injective to 1e12) and FAILS LOUD outside that range.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rfb_data_pipeline_spark.operators.integrity import (
    cnpj_triple,
    v02_duplicate_keys_report,
)


def _derive(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "o_orderkey bigint")
    return df.select(*cnpj_triple(F.col("o_orderkey")))


def test_triple_injective_past_1e8(spark):
    # keys that COLLIDE under a k%1e8-only derivation
    keys = [42, 100000042, 200000042, 10**12 - 1]
    rows = _derive(spark, keys).collect()
    triples = {(r.cnpj_basico, r.cnpj_ordem, r.cnpj_dv) for r in rows}
    assert len(triples) == len(keys), "triple must stay injective"


def test_out_of_range_key_fails_loud(spark):
    for bad in (-1, 10**12):
        with pytest.raises(Exception) as ei:
            _derive(spark, [bad]).collect()
        assert "injective" in str(ei.value), bad


def test_v02_output_unchanged_on_fixture(spark):
    """The derivation change must not alter v02's report at fixture
    scale (quotient is 0 below 1e8, so only cnpj_ordem's VALUE
    changed, never multiplicity)."""
    from tests.conftest import SF_SMALL

    row = v02_duplicate_keys_report(spark, SF_SMALL).collect()[0]
    assert row.n_rows_in_dups == 2 * row.n_duplicate_keys
    assert row.max_multiplicity == 2
    assert row.n_duplicate_keys > 0  # non-vacuous by construction


def test_triple_injective_property(spark):
    """Property sweep: ANY set of distinct keys in [0, 1e12) must map
    to distinct triples — one Spark job over a seeded random draw plus
    the adversarial boundary band (collision candidates under the old
    k%1e8-only derivation are explicitly planted)."""
    import random

    rng = random.Random(80823)
    keys = {rng.randrange(0, 10**12) for _ in range(400)}
    # planted old-derivation collision pairs: same k mod 1e8
    base = rng.randrange(0, 10**8)
    keys |= {base + j * 10**8 for j in range(6)}
    keys |= {0, 1, 10**8 - 1, 10**8, 10**12 - 1}
    rows = _derive(spark, sorted(keys)).collect()
    triples = {(r.cnpj_basico, r.cnpj_ordem, r.cnpj_dv) for r in rows}
    assert len(triples) == len(keys)
