"""g-series graph analytics vs an independent pure-Python model.

The oracle gate already proves Spark==DuckDB on the g queries; this
suite proves both engines match a THIRD implementation (dict-based
Python: brute-force triangles, quantized power iteration) on a
synthetic events set small enough to enumerate, plus the
non-vacuousness facts the oracle row silently depends on (the
per-user cap BINDS on stock data; triangles exist; ranks differ).
"""

from __future__ import annotations

import datetime as dt
import itertools
import math

import pytest

from tests.conftest import SF_SMALL

_CAP = 48
_SCALE = 10**12


def _synthetic_rows():
    # 6 users × hand-placed items: user 5 is the hyper-user whose
    # distinct-item count exceeds the cap once _CAP is monkeypatched
    # down (the cap-binding path is exercised against stock data in
    # test_cap_binds_on_stock_corpus instead — at _CAP=48 this
    # synthetic set stays under the cap so the model stays simple).
    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    engagements = {
        1: [10, 11, 12],
        2: [10, 11, 13],
        3: [11, 12, 13, 14],
        4: [20, 21],
        5: list(range(30)),  # high-degree hub user
        6: [10, 12],
        7: [50, 51],  # disconnected component (g03's unreachable path)
    }
    for user, items in engagements.items():
        for rep, item in enumerate(items):
            eid += 1
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=eid),
                    user,
                    "view",
                    1.0,
                    '{"k": %d}' % item,
                )
            )
    # malformed props rows must be quarantined, not crash
    rows.append((eid + 1, base, 1, "view", 1.0, "{bad json"))
    rows.append((eid + 2, base, 2, "view", 1.0, None))
    return rows, engagements


def _py_graph(engagements):
    """Independent model: capped engagement → weighted edges → degree,
    strength, brute-force triangles, quantized PageRank."""
    eng = {
        u: sorted(items)[:_CAP] for u, items in engagements.items()
    }  # every item appears once per user; count ties break by item asc
    from collections import Counter

    w: Counter = Counter()
    for items in eng.values():
        for a, b in itertools.combinations(sorted(items), 2):
            w[(a, b)] += 1
    nodes = sorted({i for items in eng.values() for i in items})
    adj = {n: set() for n in nodes}
    strength = {n: 0 for n in nodes}
    for (a, b), wt in w.items():
        adj[a].add(b)
        adj[b].add(a)
        strength[a] += wt
        strength[b] += wt
    deg = {n: len(adj[n]) for n in nodes}
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in w and (a, c) in w and (b, c) in w:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    # BFS from the strongest item (ties by item asc), 4 rounds max
    root = min(nodes, key=lambda v: (-strength[v], v))
    hops = {v: None for v in nodes}
    hops[root] = 0
    frontier = {root}
    for depth in range(1, 5):
        frontier = {
            nb for v in frontier for nb in adj[v] if hops[nb] is None
        }
        for nb in frontier:
            hops[nb] = depth
        if not frontier:
            break
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        units = {v: 0 for v in nodes}
        for (a, b), wt in w.items():
            units[b] += math.floor(rank[a] * wt / strength[a] * _SCALE)
            units[a] += math.floor(rank[b] * wt / strength[b] * _SCALE)
        rank = {v: 0.15 / n + 0.85 * (units[v] / _SCALE) for v in nodes}
    return {
        v: {
            "strength": strength[v],
            "rank_units": math.floor(rank[v] * _SCALE),
            "deg": deg[v],
            "tri": tri[v],
            "root": root,
            "hops": hops[v],
        }
        for v in nodes
    }


@pytest.fixture(scope="module")
def graph_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("graphsyn")
    rows, engagements = _synthetic_rows()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp / "events.parquet"))
    return str(tmp), engagements


def test_g01_matches_python_model(spark, graph_dir):
    from rfb_data_pipeline_spark.operators.graph import g01_item_pagerank

    sf_dir, engagements = graph_dir
    got = {
        r["item"]: r for r in g01_item_pagerank(spark, sf_dir).collect()
    }
    model = _py_graph(engagements)
    assert set(got) == set(model)
    for item, m in model.items():
        assert got[item]["strength"] == m["strength"], item
        assert got[item]["rank_units"] == m["rank_units"], item
    # probability mass survives quantization (each floor loses < 1e-12)
    total = sum(r["rank_units"] for r in got.values()) / _SCALE
    assert 0.999 < total <= 1.000001


def test_g02_matches_python_model(spark, graph_dir):
    from rfb_data_pipeline_spark.operators.graph import g02_item_triangles

    sf_dir, engagements = graph_dir
    got = {
        r["item"]: r for r in g02_item_triangles(spark, sf_dir).collect()
    }
    model = _py_graph(engagements)
    # node universes differ by design: g02 reports over nodes WITH
    # edges (deg >= 1); the synthetic set has no isolated items
    assert set(got) == {v for v, m in model.items() if m["deg"] > 0}
    for item, r in got.items():
        m = model[item]
        assert r["deg"] == m["deg"], item
        assert r["n_triangles"] == m["tri"], item
        den = m["deg"] * (m["deg"] - 1)
        if den <= 0:
            assert r["clustering"] is None
        else:
            q = (2 * m["tri"] * 10**6 * 2 + den) // (2 * den)  # HALF_UP
            assert r["clustering"] == q / 10**6, item
    assert sum(r["n_triangles"] for r in got.values()) > 0


def test_g04_matches_python_model(spark, graph_dir):
    from collections import Counter

    from rfb_data_pipeline_spark.operators.graph import g04_item_similarity

    sf_dir, engagements = graph_dir
    eng = {u: sorted(items)[:_CAP] for u, items in engagements.items()}
    w: Counter = Counter()
    for items in eng.values():
        for a, b in itertools.combinations(sorted(items), 2):
            w[(a, b)] += 1
    strength = Counter()
    for (a, b), wt in w.items():
        strength[a] += wt
        strength[b] += wt
    sims = sorted(
        (
            (
                -math.floor(
                    wt * 1e6 / math.sqrt(strength[a] * strength[b])
                ),
                a,
                b,
                wt,
            )
            for (a, b), wt in w.items()
        )
    )[:20]
    want = [(a, b, wt, -neg) for neg, a, b, wt in sims]
    got = [
        (r["src"], r["dst"], r["w"], r["sim_units"])
        for r in g04_item_similarity(spark, sf_dir).collect()
    ]
    assert got == want


def test_g03_matches_python_model(spark, graph_dir):
    from rfb_data_pipeline_spark.operators.graph import g03_bfs_hops

    sf_dir, engagements = graph_dir
    got = {r["item"]: r for r in g03_bfs_hops(spark, sf_dir).collect()}
    model = _py_graph(engagements)
    assert set(got) == set(model)
    for item, m in model.items():
        assert got[item]["root_item"] == m["root"], item
        assert got[item]["hops"] == m["hops"], item
    # the disconnected component must actually be unreachable
    assert got[50]["hops"] is None and got[51]["hops"] is None
    # and multi-hop structure must exist (depth >= 1 beyond the root)
    assert any(
        r["hops"] is not None and r["hops"] >= 1 for r in got.values()
    )


def test_g05_matches_python_model(spark, graph_dir):
    from collections import Counter

    from rfb_data_pipeline_spark.operators.graph import g05_graph_summary

    sf_dir, engagements = graph_dir
    eng = {u: sorted(items)[:_CAP] for u, items in engagements.items()}
    w: Counter = Counter()
    for items in eng.values():
        for a, b in itertools.combinations(sorted(items), 2):
            w[(a, b)] += 1
    nodes = sorted({i for items in eng.values() for i in items})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in w:
        parent[find(a)] = find(b)
    deg = Counter()
    for a, b in w:
        deg[a] += 1
        deg[b] += 1
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in w and (a, c) in w and (b, c) in w
    )
    row = g05_graph_summary(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(w)
    assert row["total_weight"] == sum(w.values())
    assert row["max_degree"] == max(deg.values())
    assert row["n_isolated"] == len(nodes) - len(deg)
    assert row["n_components"] == len({find(n) for n in nodes})
    assert row["n_triangles"] == tri
    den = len(nodes) * (len(nodes) - 1)
    q = (2 * len(w) * 10**6 * 2 + den) // (2 * den)
    assert row["density"] == q / 10**6
    # the planted disconnected pair must be visible in the card
    assert row["n_components"] >= 2


def test_cap_binds_on_stock_corpus(spark):
    """The per-user top-K cap must BIND on stock data, otherwise its
    oracle mirroring is vacuous (the d19 lesson)."""
    from rfb_data_pipeline_spark.operators.graph import (
        _USER_ITEM_CAP,
        engagement,
    )
    from rfb_data_pipeline_spark.operators.graph import _events

    ev = _events(spark, SF_SMALL)
    from pyspark.sql import functions as F

    raw = (
        ev.select(
            "user_id",
            F.from_json("props", "struct<k:int>").getField("k").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("user_id")
        .agg(F.countDistinct("item").alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("total"))
        .collect()[0]
    )
    assert raw["mx"] > _USER_ITEM_CAP, "cap no longer binds — retune it"
    capped_total = engagement(ev).count()
    assert capped_total < raw["total"], "cap removed zero rows"


def test_g01_ranks_are_differentiated(spark):
    from rfb_data_pipeline_spark.operators.graph import g01_item_pagerank

    units = [
        r["rank_units"]
        for r in g01_item_pagerank(spark, SF_SMALL).collect()
    ]
    assert len(set(units)) > 1, "degenerate uniform ranks"


# ---------------------------------------------------------------------------
# Property test: arbitrary small engagement maps, not just the hand
# fixture — the degree-ordered orientation and the quantized power
# iteration must match the Python model on EVERY graph shape
# hypothesis finds (stars, cliques, chains, isolated edges).

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ENG = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.sets(st.integers(min_value=0, max_value=9), min_size=1, max_size=6),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_ENG)
def test_graph_family_matches_model_on_random_graphs(spark, eng):
    from rfb_data_pipeline_spark.operators.graph import (
        g01_item_pagerank,
        g02_item_triangles,
    )

    engagements = {u: sorted(items) for u, items in eng.items()}
    base = dt.datetime(2024, 5, 1)
    rows = [
        (1000 * u + i, base, u, "view", 1.0, '{"k": %d}' % item)
        for u, items in engagements.items()
        for i, item in enumerate(items)
    ]
    tmp = tempfile.mkdtemp(prefix="graphprop_")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(tmp + "/events.parquet")
    model = _py_graph(engagements)
    got1 = {r["item"]: r for r in g01_item_pagerank(spark, tmp).collect()}
    assert {v: m["rank_units"] for v, m in model.items()} == {
        i: r["rank_units"] for i, r in got1.items()
    }
    assert {v: m["strength"] for v, m in model.items()} == {
        i: r["strength"] for i, r in got1.items()
    }
    got2 = {r["item"]: r for r in g02_item_triangles(spark, tmp).collect()}
    expected2 = {v: m for v, m in model.items() if m["deg"] > 0}
    assert {v: m["tri"] for v, m in expected2.items()} == {
        i: r["n_triangles"] for i, r in got2.items()
    }
    assert {v: m["deg"] for v, m in expected2.items()} == {
        i: r["deg"] for i, r in got2.items()
    }


# ---------------------------------------------------------------------------
# Negative item ids: props.k < 0 must flow through every graph query
# identically in both engines (the test_negative_ids discipline for
# the events axis — no pmod/element_at in this family, but the sweep
# keeps it that way).

import duckdb as _duckdb

from tools.check_oracle import _normalize, value_hash


def test_graph_family_parity_with_negative_items(spark, tmp_path):
    import __spark_entry__ as entry_mod

    rows = []
    eid = 0
    for u, items in {
        1: [-5, -3, -1],
        2: [-3, -1, 0],
        3: [0, 2, -5],
        4: [-9],
    }.items():
        for item in items:
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 6, 1) + dt.timedelta(minutes=eid),
                    u,
                    "view",
                    1.0,
                    '{"k": %d}' % item,
                )
            )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('%s/*.parquet')"
        % str(tmp_path / "events.parquet")
    )
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    for name in sorted(n for n in q if n.startswith("g")):
        spdf = q[name](spark, str(tmp_path)).toPandas()
        opdf = con.execute(o[name]).fetchdf()
        assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
        assert value_hash(_normalize(spdf)) == value_hash(
            _normalize(opdf)
        ), name
    con.close()


def test_g06_matches_python_model(spark, graph_dir):
    from collections import Counter

    from rfb_data_pipeline_spark.operators.graph import g06_lpa_communities

    sf_dir, engagements = graph_dir
    eng = {u: sorted(items)[:_CAP] for u, items in engagements.items()}
    w: Counter = Counter()
    for items in eng.values():
        for a, b in itertools.combinations(sorted(items), 2):
            w[(a, b)] += 1
    nodes = sorted({i for items in eng.values() for i in items})
    adj = {n: set() for n in nodes}
    for a, b in w:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: v for v in nodes}
    for _ in range(3):
        new = {}
        for v in nodes:
            votes: dict = {}
            for nb in adj[v]:
                k = (min(v, nb), max(v, nb))
                votes[labels[nb]] = votes.get(labels[nb], 0) + w[k]
            new[v] = (
                min(votes, key=lambda l: (-votes[l], l))
                if votes
                else labels[v]
            )
        labels = new
    sizes = Counter(labels.values())
    want = {v: (labels[v], sizes[labels[v]]) for v in nodes}
    got = {
        r["item"]: (r["community"], r["community_size"])
        for r in g06_lpa_communities(spark, sf_dir).collect()
    }
    assert got == want
    # community structure must be non-trivial: more than one
    # community, and at least one multi-node community
    assert len(sizes) > 1 and max(sizes.values()) > 1


# ---------------------------------------------------------------------------
# Power-law hub skew (VERDICT r05 item 3): one hot item in ~30% of
# users' capped sets makes the co-engagement edge groupBy(src,dst) —
# the family's only skew-exposed shuffle — maximally unbalanced, and
# concentrates strength/rank mass on the hub. Every g query must
# still match DuckDB exactly on this shape (rank quantization,
# degree-ordered triangle orientation, BFS-from-hub, LPA votes, and
# the replayed edge maintenance all stress differently under a hub).


def test_graph_family_parity_with_powerlaw_hub(spark, tmp_path):
    import random

    import __spark_entry__ as entry_mod

    rng = random.Random(7)
    HUB = 999
    rows = []
    eid = 0
    for u in range(1, 41):
        items = rng.sample(range(100), rng.randint(4, 8))
        if u % 10 < 3:  # 30% of users engage the hub item
            items.append(HUB)
        for item in items:
            for _ in range(rng.randint(1, 3)):  # engagement-count ties vary
                eid += 1
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 7, 1) + dt.timedelta(minutes=eid),
                        u,
                        "view",
                        1.0,
                        '{"k": %d}' % item,
                    )
                )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('%s/*.parquet')"
        % str(tmp_path / "events.parquet")
    )
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    # non-vacuousness: the hub really is a hub (top strength, degree
    # above every non-hub item)
    from rfb_data_pipeline_spark.operators.graph import co_engagement_edges

    ev = spark.read.parquet(str(tmp_path / "events.parquet"))
    edges = co_engagement_edges(ev).collect()
    hub_w = sum(r["w"] for r in edges if HUB in (r["src"], r["dst"]))
    other_max = max(
        sum(r["w"] for r in edges if i in (r["src"], r["dst"]))
        for i in range(100)
    )
    assert hub_w > 2 * other_max, (hub_w, other_max)
    for name in sorted(n for n in q if n.startswith("g")):
        spdf = q[name](spark, str(tmp_path)).toPandas()
        opdf = con.execute(o[name]).fetchdf()
        assert len(spdf) == len(opdf), (name, len(spdf), len(opdf))
        assert value_hash(_normalize(spdf)) == value_hash(
            _normalize(opdf)
        ), name
    con.close()
