"""Graph analytics over the user-item co-engagement graph.

The ``events`` table is the edge source: ``props.k`` is the item a
user engaged with (the e07 JSON idiom), and two items are connected
when at least one user engaged with both. This is the standard
recsys/curation substrate — item centrality (PageRank) weights
catalog curation the way CommonCrawl-style pipelines weight domains
by link centrality, and triangle counts/clustering coefficients are
the classic cohesion signals.

Scale design (the 100 TB story):
- Per-user top-K engagement cap (``_USER_ITEM_CAP``): the within-user
  pair join is quadratic in a user's distinct items, so a bot with
  10^6 items would emit 10^12 pairs. The cap is the df-cap discipline
  from the dedup shingle tiers — deterministic (engagement count desc,
  item asc), mirrored in the DuckDB twin, and it BINDS on stock data
  (~half the users exceed 48 items), so the oracle row exercises it.
- PageRank is the Pregel-on-DataFrames shape: each iteration is one
  equi-join (ranks × arcs) + one groupBy(sum) over |V|-row state;
  the FIXED-depth loop chains declaratively (shuffle-stage outputs
  persist and survive executor loss), with stage boundaries only on
  the shared materialized base — see g01's in-function rationale.
- Triangle counting uses degree-ordered orientation (each undirected
  edge directed low→high by (degree, id)), which bounds the wedge
  join by the graph's arboricity — the Suri–Vassilvitskii MapReduce
  algorithm — instead of the naive high-degree wedge blowup.

Cross-engine determinism: PageRank is float-iterative, so every
iteration quantizes the neighbor contributions to integer 1e-12 units
(``floor(rank*w/s*1e12)`` as BIGINT) before summing — integer sums are
order-independent, and rebuilding the next rank from the integer sum
keeps both engines on bit-identical doubles (the s08/e14 decimal
discipline, in integer form). The SQL twins use scientific-notation
literals (``0.85e0``) because bare decimal literals are DECIMAL-typed
in DuckDB and would silently switch the twin to decimal arithmetic.

Reference parity note: the reference pipeline (src/main.py) has no
graph surface; this family is part of the north-star training-data
capabilities (SURVEY.md §2.2 "beyond the reference").
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.functions.exactround import (
    ratio_round,
    sql_ratio_round,
)
from rfb_data_pipeline_spark.plans.stage import stage_boundary

_USER_ITEM_CAP = 48  # binds on stock data (max distinct items/user ~67)
_PR_ITERS = 5
_PR_SCALE = 1e12  # contribution quantization: integer 1e-12 units


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("events",), register_views=False)[
        "events"
    ]


def per_user_item_counts(ev: DataFrame) -> DataFrame:
    """(user_id, item, n_ev) engagement counts — the e07 JSON guard
    on ``props.k``. The streaming twin runs this on each micro-batch
    frame (its log stores exactly these rows, batch-keyed)."""
    item = F.from_json("props", "struct<k:int>").getField("k")
    return (
        ev.select("user_id", item.alias("item"))
        .where(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )


def capped_engagement(per_ui: DataFrame) -> DataFrame:
    """Top-``_USER_ITEM_CAP`` items per user by engagement count
    (ties by item asc) from a (user_id, item, n_ev) frame. The cap is
    what makes the downstream within-user pair join safe against
    hyper-engaged users at corpus scale — and it is deliberately
    NON-monotone (an item can fall out of a user's top-K as counts
    grow), which the streaming twin's delta maintenance handles."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_ev").desc(), F.col("item").asc()
    )
    return (
        per_ui.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _USER_ITEM_CAP)
        .select("user_id", "item")
    )


def engagement(ev: DataFrame) -> DataFrame:
    """Distinct capped (user_id, item) pairs straight from events."""
    return capped_engagement(per_user_item_counts(ev))


def user_item_pairs(eng: DataFrame) -> DataFrame:
    """Per-user co-engaged item pairs (user_id, src, dst), src < dst.

    One equi-join on user_id (never a cartesian); the per-user cap
    bounds each user's contribution to C(cap, 2) pairs."""
    a, b = eng.alias("a"), eng.alias("b")
    return (
        a.join(b, "user_id")
        .where(F.col("a.item") < F.col("b.item"))
        .select(
            "user_id",
            F.col("a.item").alias("src"),
            F.col("b.item").alias("dst"),
        )
    )


def co_engagement_edges(ev: DataFrame) -> DataFrame:
    """Undirected weighted edges (src < dst, w = co-engaged users).

    Map-side partial aggregation collapses the per-user pair stream
    before the shuffle (distinct item pairs <= C(|items|, 2),
    independent of user count)."""
    return user_item_pairs(engagement(ev)).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w")
    )


# The shared CTE prefix of both SQL twins — the e07 JSON-validity
# guard (DuckDB CAST on malformed JSON errors where from_json NULLs),
# the capped engagement set, and the weighted undirected edge list.
_EDGES_CTE = f"""
eng AS (
  SELECT user_id, item FROM (
    SELECT user_id, item, count(*) AS n_ev,
           row_number() OVER (
             PARTITION BY user_id ORDER BY count(*) DESC, item ASC
           ) AS rn
    FROM (
      SELECT user_id,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(json_extract(props, '$.k') AS INTEGER)
             END AS item
      FROM events
    )
    WHERE item IS NOT NULL
    GROUP BY user_id, item
  )
  WHERE rn <= {_USER_ITEM_CAP}
),
edges AS (
  SELECT a.item AS src, b.item AS dst, count(*) AS w
  FROM eng a JOIN eng b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
)
"""


# --------------------------------------------------------------------------
# g01 — item PageRank over the co-engagement graph (weighted, damping
# 0.85, 5 iterations). Integer-unit quantized contributions keep the
# iterated doubles bit-identical across engines; the output emits the
# final rank in 1e-12 units (BIGINT) so no float ever reaches the
# hash compare.


# Session-scoped memo of the shared graph base (the cc_labels_cached /
# t15_scores_cached idiom): every g-series query starts from the SAME
# engagement → capped-pairs → weighted-edges construction, so within a
# session (bench, driver correctness pass, test suite) the base is
# built and materialized ONCE. Keyed on (events fingerprint, session
# identity) so a rewritten fixture or restarted SparkContext can never
# serve a stale or dead frame. Pure sharing — the logical frames are
# identical to the un-memoized build, so query results are unchanged.
#
# r13 (optimization): the payload grew from (eng, edges) to the full
# set of frames the g-family rebuilt — and re-ran an eager
# localCheckpoint job for — on EVERY query invocation: the node
# universe (g01/g03/g04/g05/g06), the degree table and the
# degree-ordered oriented arc list (g02/g05), the strength-annotated
# arc list (g01's per-iteration join input), and the 1-row node-count
# frame. Each is logically identical to the frame the queries built
# inline before, so results are unchanged; the builds move into the
# one timed base build (guide §2.4 — share the exchange, don't repeat
# it).
_GRAPH_BASE_CACHE: dict[str, tuple[SparkSession, tuple]] = {}


class _GraphShared(NamedTuple):
    eng: DataFrame  # capped (user_id, item), materialized
    edges: DataFrame  # weighted undirected (src < dst), materialized
    arcs: DataFrame  # edges symmetrized (both directions), lazy union
    nodes: DataFrame  # (item, s, n) node universe, materialized
    n1: DataFrame  # 1-row (n) frame, materialized (broadcast side)
    deg: DataFrame  # (item, deg) over edges, materialized
    tri_arcs: DataFrame  # degree-ordered oriented arcs, materialized
    arcs_s: DataFrame  # arcs + src strength s, materialized (g01)


def _graph_shared(spark: SparkSession, sf_dir: str) -> "_GraphShared":
    """The g-family's shared frames — each materialized once per
    (session, events fingerprint)."""
    from rfb_data_pipeline_spark.memo import session_memo

    def _build() -> _GraphShared:
        eng = engagement(_events(spark, sf_dir)).transform(stage_boundary)
        edges = (
            user_item_pairs(eng)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("w"))
            .transform(stage_boundary)
        )
        arcs = edges.union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        strength = arcs.groupBy(F.col("src").alias("item")).agg(
            F.sum("w").alias("s")
        )
        eng_items = eng.select("item").distinct()
        n1 = eng_items.agg(F.count(F.lit(1)).alias("n")).transform(
            stage_boundary
        )
        nodes = (
            eng_items.join(strength, "item", "left")
            .select("item", F.coalesce(F.col("s"), F.lit(0)).alias("s"))
            .crossJoin(F.broadcast(n1))
            .transform(stage_boundary)
        )
        deg = _degrees(edges).transform(stage_boundary)
        tri_arcs = _oriented_arcs(edges, deg).transform(stage_boundary)
        arcs_s = arcs.join(
            nodes.where(F.col("s") > 0).select(
                F.col("item").alias("src"), "s"
            ),
            "src",
        ).transform(stage_boundary)
        return _GraphShared(
            eng, edges, arcs, nodes, n1, deg, tri_arcs, arcs_s
        )

    return session_memo(
        _GRAPH_BASE_CACHE, spark, sf_dir, ("events",), _build
    )


def _graph_base(spark: SparkSession, sf_dir: str):
    """(arcs, nodes) shared by g01/g03/g04/g05/g06: ONE materialized
    engagement frame feeds both the edge build and the node universe
    (isolated items keep their rank/teleport mass); n arrives as a
    broadcast 1-row frame, never a driver-side collect (the q34
    idiom). Since r13 both frames come from the session memo."""
    gb = _graph_shared(spark, sf_dir)
    return gb.arcs, gb.nodes


def g01_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _graph_shared(spark, sf_dir)
    nodes, arcs_s, n1 = gb.nodes, gb.arcs_s, gb.n1
    # The FIXED-depth iteration chains declaratively — each round's
    # groupBy is a shuffle stage whose output is already persisted by
    # the engine, which on a real cluster is a stronger recovery story
    # than executor-local checkpoints (shuffle files survive an
    # executor loss; localCheckpoint does not). stage_boundary is
    # reserved for UNBOUNDED iterative growth (d07/cc_star); a
    # depth-5 plan is not that.
    #
    # r13 loop restructure (guide §2.4 — remove shuffles outright):
    # the per-iteration recomposition `nodes LEFT JOIN units` is gone.
    # The source strength s rides on the memoized arcs_s instead of
    # the rank state, so only (item, rank) crosses the iteration
    # boundary; and because arcs are symmetric, the items receiving
    # contributions each round are EXACTLY the non-isolated nodes
    # (s > 0) — so next round's rank state is units' rank expression
    # UNIONed with the constant teleport rank 0.15/n of the isolated
    # nodes (s = 0), no join. 3 exchanges/iteration → 2. Every rank
    # expression is unchanged term for term, so the quantized doubles
    # are bit-identical to the old plan (the module-head discipline).
    #
    # r13 session 2: the isolated-node union is gone from the loop
    # entirely — iso items (s = 0) are by construction absent from
    # arcs_s.src (w >= 1 ⇒ any item with an arc has s > 0), so the
    # unioned rows never matched the join, and nothing else reads the
    # intermediate ranks: they were dead state. Dropping them also
    # stops the union erasing the groupBy's hash partitioning on item,
    # so the next round's join reuses it (sort only, no ranks
    # exchange): 2 exchanges/iteration → 1. The final left join
    # against the full node universe re-attaches isolated items with
    # u = NULL exactly as before — identical rank expressions,
    # bit-identical output.
    ranks = nodes.select("item", (F.lit(1.0) / F.col("n")).alias("rank"))
    units = None
    for _ in range(_PR_ITERS):
        units = (
            ranks.join(arcs_s, ranks["item"] == arcs_s["src"])
            .select(
                F.col("dst").alias("item"),
                F.floor(
                    F.col("rank") * F.col("w") / F.col("s") * F.lit(_PR_SCALE)
                ).alias("u"),
            )
            .groupBy("item")
            .agg(F.sum("u").alias("u"))
        )
        ranks = units.crossJoin(F.broadcast(n1)).select(
            "item",
            (
                F.lit(0.15) / F.col("n")
                + F.lit(0.85)
                * (F.coalesce(F.col("u"), F.lit(0)) / F.lit(_PR_SCALE))
            ).alias("rank"),
        )
    return nodes.join(units, "item", "left").select(
        "item",
        F.col("s").alias("strength"),
        F.floor(
            (
                F.lit(0.15) / F.col("n")
                + F.lit(0.85)
                * (F.coalesce(F.col("u"), F.lit(0)) / F.lit(_PR_SCALE))
            )
            * F.lit(_PR_SCALE)
        ).alias("rank_units"),
    )


def _g01_sql() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.item, n.s, 0.15e0 / (SELECT n FROM nn)
         + 0.85e0 * (COALESCE(c.u, 0) / 1e12) AS rank
  FROM nodes n LEFT JOIN (
    SELECT d.dst AS item,
           SUM(CAST(floor(r.rank * d.w / r.s * 1e12) AS BIGINT)) AS u
    FROM {prev} r JOIN dir d ON r.item = d.src
    GROUP BY 1
  ) c ON n.item = c.item
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH {_EDGES_CTE},
dir AS (
  SELECT src, dst, w FROM edges
  UNION ALL
  SELECT dst, src, w FROM edges
),
nodes AS (
  SELECT i.item, COALESCE(st.s, 0) AS s
  FROM (SELECT DISTINCT item FROM eng) i
  LEFT JOIN (SELECT src AS item, SUM(w) AS s FROM dir GROUP BY 1) st
    ON i.item = st.item
),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT item, s, 1.0e0 / (SELECT n FROM nn) AS rank FROM nodes),
{chain}
SELECT item, CAST(s AS BIGINT) AS strength,
       CAST(floor(rank * 1e12) AS BIGINT) AS rank_units
FROM {prev}
"""


# --------------------------------------------------------------------------
# g02 — per-item triangle count + clustering coefficient via
# degree-ordered orientation: every undirected edge becomes one arc
# low→high in the (degree, item) total order, a triangle a<b<c in
# that order is found exactly once as arcs a→b, a→c closed by b→c.
# All-integer outputs except the clustering ratio, which goes through
# the engine-exact ratio_round (NULL for deg <= 1 on both sides).


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("item"))
        .union(edges.select(F.col("dst").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _oriented_arcs(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-ordered orientation of an undirected edge list: each
    edge directed low→high in the (degree, item) total order."""
    e = (
        edges.join(
            deg.select(F.col("item").alias("src"), F.col("deg").alias("ds")),
            "src",
        ).join(
            deg.select(F.col("item").alias("dst"), F.col("deg").alias("dd")),
            "dst",
        )
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("dd")).otherwise(F.col("ds")).alias("dv"),
    )


def oriented_triangles(
    edges: DataFrame, deg: DataFrame, arcs: DataFrame | None = None
) -> DataFrame:
    """(a, b, c) triangle rows via degree-ordered orientation — shared
    by g02 (per-item counts) and g05 (global total). ``arcs`` lets a
    caller pass the session-memoized oriented arc list instead of
    re-materializing it per invocation (r13)."""
    if arcs is None:
        arcs = _oriented_arcs(edges, deg).transform(stage_boundary)
    x = arcs.alias("x")
    y = arcs.select(
        F.col("u").alias("u2"), F.col("v").alias("w2"), F.col("dv").alias("dw")
    ).alias("y")
    z = arcs.select(F.col("u").alias("zb"), F.col("v").alias("zc")).alias("z")
    wedge_order = (F.col("x.dv") < F.col("y.dw")) | (
        (F.col("x.dv") == F.col("y.dw")) & (F.col("x.v") < F.col("y.w2"))
    )
    tri = (
        x.join(y, (F.col("x.u") == F.col("y.u2")) & wedge_order)
        .join(z, (F.col("z.zb") == F.col("x.v")) & (F.col("z.zc") == F.col("y.w2")))
        .select(
            F.col("x.u").alias("a"), F.col("x.v").alias("b"), F.col("y.w2").alias("c")
        )
    )
    return tri


def g02_item_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _graph_shared(spark, sf_dir)  # same frames as
    # co_engagement_edges(_events(...)), materialized once per session
    edges, deg = gb.edges, gb.deg
    tri = oriented_triangles(edges, deg, gb.tri_arcs)
    per_node = (
        tri.select(F.col("a").alias("item"))
        .union(tri.select("b"))
        .union(tri.select("c"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return deg.join(per_node, "item", "left").select(
        "item",
        "deg",
        F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
        ratio_round(
            F.lit(2) * F.coalesce(F.col("n_tri"), F.lit(0)),
            F.col("deg") * (F.col("deg") - F.lit(1)),
            6,
            nonneg=True,
        ).alias("clustering"),
    )


def _g02_sql() -> str:
    clustering = sql_ratio_round(
        "2 * COALESCE(p.n_tri, 0)", "d.deg * (d.deg - 1)", 6, nonneg=True
    )
    return f"""
WITH {_EDGES_CTE},
deg AS (
  SELECT item, count(*) AS deg FROM (
    SELECT src AS item FROM edges UNION ALL SELECT dst FROM edges
  ) GROUP BY 1
),
arcs AS (
  SELECT CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS u,
         CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS v,
         CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN db.deg ELSE da.deg END AS dv
  FROM edges e
  JOIN deg da ON e.src = da.item
  JOIN deg db ON e.dst = db.item
),
tri AS (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM arcs x
  JOIN arcs y ON x.u = y.u
             AND ((x.dv < y.dv) OR (x.dv = y.dv AND x.v < y.v))
  JOIN arcs z ON z.u = x.v AND z.v = y.v
),
pern AS (
  SELECT item, count(*) AS n_tri FROM (
    SELECT a AS item FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY 1
)
SELECT d.item, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_triangles,
       {clustering} AS clustering
FROM deg d LEFT JOIN pern p ON d.item = p.item
"""


# --------------------------------------------------------------------------
# g03 — BFS hop distances from the strongest item (highest weighted
# degree, ties by item asc): frontier relaxation, one equi-join + one
# groupBy(min) per round over |V|-row state — the reachability member
# of the family (g01 centrality / g02 cohesion / g03 traversal).
# Rounds are FIXED at 4 so the oracle unrolls exactly (the s08
# fixed-iteration discipline); items beyond 4 hops keep NULL. All
# integer state — no float crosses the engines.

_BFS_ROUNDS = 4


def g03_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    arcs, nodes = _graph_base(spark, sf_dir)
    root = (
        nodes.orderBy(F.col("s").desc(), F.col("item").asc())
        .limit(1)
        .select(F.col("item").alias("root_item"))
    )
    # r13 loop restructure (guide §2.4): the old round was
    # relax-join + per-dst min-aggregate + a LEFT JOIN against the
    # full node universe to merge new distances into |V|-row state —
    # 3 exchanges over |V| rows. BFS distances are monotone (a node's
    # dist never improves once set with unit weights), so the merge
    # `keep dist if dist <= m else m` IS `min` — the reached-set state
    # unions raw neighbor candidates (dist + 1, no pre-aggregate) and
    # one groupBy(min) does both the per-dst min and the merge:
    # 2 exchanges per round, state = reached rows only, and the node
    # universe is joined exactly once at the end. Integer arithmetic
    # throughout — values unchanged.
    reached = root.select(F.col("root_item").alias("item"), F.lit(0).alias("dist"))
    for _ in range(_BFS_ROUNDS):
        cand = reached.join(arcs, reached["item"] == arcs["src"]).select(
            F.col("dst").alias("item"), (F.col("dist") + F.lit(1)).alias("dist")
        )
        reached = (
            reached.unionByName(cand)
            .groupBy("item")
            .agg(F.min("dist").alias("dist"))
        )
    return (
        nodes.crossJoin(F.broadcast(root))
        .join(reached, "item", "left")
        .select("item", "root_item", F.col("dist").cast("int").alias("hops"))
    )


def _g03_sql() -> str:
    prev = "d0"
    rounds = []
    for i in range(1, _BFS_ROUNDS + 1):
        rounds.append(
            f"""d{i} AS (
  SELECT p.item,
         CASE WHEN p.dist IS NOT NULL AND (c.m IS NULL OR p.dist <= c.m)
              THEN p.dist ELSE c.m END AS dist
  FROM {prev} p LEFT JOIN (
    SELECT d.dst AS item, MIN(q.dist) + 1 AS m
    FROM {prev} q JOIN dir d ON q.item = d.src
    WHERE q.dist IS NOT NULL
    GROUP BY 1
  ) c ON p.item = c.item
)"""
        )
        prev = f"d{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH {_EDGES_CTE},
dir AS (
  SELECT src, dst, w FROM edges
  UNION ALL
  SELECT dst, src, w FROM edges
),
nodes AS (SELECT DISTINCT item FROM eng),
st AS (SELECT src AS item, SUM(w) AS s FROM dir GROUP BY 1),
root AS (
  SELECT n.item FROM nodes n LEFT JOIN st ON n.item = st.item
  ORDER BY COALESCE(st.s, 0) DESC, n.item ASC LIMIT 1
),
d0 AS (
  SELECT item,
         CASE WHEN item = (SELECT item FROM root) THEN 0 END AS dist
  FROM nodes
),
{chain}
SELECT item, (SELECT item FROM root) AS root_item,
       CAST(dist AS INT) AS hops
FROM {prev}
"""


# --------------------------------------------------------------------------
# g04 — item-item cosine similarity over co-engagement (the
# item-based collaborative-filtering score): sim(i, j) =
# w_ij / sqrt(s_i * s_j), published as floor(sim * 1e6) integer
# units. floor, not round: sqrt/divide are correctly-rounded IEEE
# ops, so both engines compute the identical double, and floor of an
# identical double cannot diverge — while round() at a terminating
# boundary can (1/32 = 0.03125 rounds .0313 vs .0312 across engines,
# the exactround class; no sqrt-free rewrite exists here, so the
# output stays in floor units). Top-20 pairs by (units desc, src,
# dst) — deterministic total order, TakeOrdered.


def g04_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    arcs, nodes = _graph_base(spark, sf_dir)
    edges = arcs.where(F.col("src") < F.col("dst"))
    sim = (
        edges.join(
            nodes.select(F.col("item").alias("src"), F.col("s").alias("si")),
            "src",
        )
        .join(
            nodes.select(F.col("item").alias("dst"), F.col("s").alias("sj")),
            "dst",
        )
        .select(
            "src",
            "dst",
            "w",
            F.floor(
                F.col("w")
                * F.lit(1e6)
                / F.sqrt(F.col("si") * F.col("sj"))
            ).alias("sim_units"),
        )
    )
    return sim.orderBy(
        F.desc("sim_units"), F.asc("src"), F.asc("dst")
    ).limit(20)


def _g04_sql() -> str:
    return f"""
WITH {_EDGES_CTE},
dir AS (
  SELECT src, dst, w FROM edges
  UNION ALL
  SELECT dst, src, w FROM edges
),
st AS (SELECT src AS item, SUM(w) AS s FROM dir GROUP BY 1)
SELECT e.src, e.dst, e.w,
       CAST(floor(e.w * 1e6 / sqrt(si.s * sj.s)) AS BIGINT) AS sim_units
FROM edges e
JOIN st si ON e.src = si.item
JOIN st sj ON e.dst = sj.item
ORDER BY sim_units DESC, e.src ASC, e.dst ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# g05 — one-row graph health card: node/edge/weight totals, max
# degree, isolated count, CONNECTED COMPONENTS (the d15 cc_star
# machinery re-used on a second graph — isolated items count as their
# own components), global triangle total, and density through the
# engine-exact ratio rounding. The DuckDB twin derives components
# with d07's recursive reachability CTE — a third, structurally
# different CC implementation cross-checking cc_star once more.


def g05_graph_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.operators.dedup import cc_star

    gb = _graph_shared(spark, sf_dir)
    # arcs.where(src < dst) is row-identical to the materialized edges
    # frame (the reversed copies all have src > dst), so g05 reads the
    # memoized edges/deg/tri_arcs directly instead of re-deriving and
    # re-checkpointing them per invocation (r13).
    nodes, edges, deg = gb.nodes, gb.edges, gb.deg
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    e_stats = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.coalesce(F.sum("w"), F.lit(0)).alias("total_weight"),
    )
    d_stats = deg.agg(
        F.coalesce(F.max("deg"), F.lit(0)).alias("max_degree"),
        F.count(F.lit(1)).alias("n_connected"),
    )
    # The memoized edges frame is distinct with src < dst strictly, so
    # the big→small intake is a column swap off already-materialized
    # blocks: pre_oriented skips the orient+distinct exchange and
    # materialized skips the per-call intake checkpoint job (re-scans
    # of the memoized blocks are what the boundary would do anyway).
    comp = cc_star(
        edges.select(
            F.col("dst").cast("bigint").alias("u"),
            F.col("src").cast("bigint").alias("v"),
        ),
        pre_oriented=True,
        materialized=True,
    ).agg(F.countDistinct("label").alias("n_edge_components"))
    tri = oriented_triangles(edges, deg, gb.tri_arcs).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        n_nodes.crossJoin(F.broadcast(e_stats))
        .crossJoin(F.broadcast(d_stats))
        .crossJoin(F.broadcast(comp))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("total_weight").cast("bigint").alias("total_weight"),
            F.col("max_degree").cast("bigint").alias("max_degree"),
            (F.col("n_nodes") - F.col("n_connected"))
            .cast("bigint")
            .alias("n_isolated"),
            (
                F.col("n_edge_components")
                + (F.col("n_nodes") - F.col("n_connected"))
            )
            .cast("bigint")
            .alias("n_components"),
            "n_triangles",
            ratio_round(
                F.lit(2) * F.col("n_edges"),
                F.col("n_nodes") * (F.col("n_nodes") - F.lit(1)),
                6,
                nonneg=True,
            ).alias("density"),
        )
    )


def _g05_sql() -> str:
    density = sql_ratio_round(
        "2 * (SELECT count(*) FROM edges)",
        "(SELECT n FROM nn) * ((SELECT n FROM nn) - 1)",
        6,
        nonneg=True,
    )
    return f"""
WITH RECURSIVE {_EDGES_CTE},
nodes AS (SELECT DISTINCT item FROM eng),
nn AS (SELECT count(*) AS n FROM nodes),
sym AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT dst, src FROM edges
),
deg AS (SELECT src AS item, count(*) AS deg FROM sym GROUP BY 1),
reach(node, lbl) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN sym e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
arcs AS (
  SELECT CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.src ELSE e.dst END AS u,
         CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN e.dst ELSE e.src END AS v,
         CASE WHEN (da.deg < db.deg)
                OR (da.deg = db.deg AND e.src < e.dst)
              THEN db.deg ELSE da.deg END AS dv
  FROM edges e
  JOIN deg da ON e.src = da.item
  JOIN deg db ON e.dst = db.item
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM arcs x
  JOIN arcs y ON x.u = y.u
             AND ((x.dv < y.dv) OR (x.dv = y.dv AND x.v < y.v))
  JOIN arcs z ON z.u = x.v AND z.v = y.v
)
SELECT (SELECT n FROM nn) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       CAST((SELECT coalesce(sum(w), 0) FROM edges) AS BIGINT)
         AS total_weight,
       CAST((SELECT coalesce(max(deg), 0) FROM deg) AS BIGINT)
         AS max_degree,
       CAST((SELECT n FROM nn) - (SELECT count(*) FROM deg) AS BIGINT)
         AS n_isolated,
       CAST((SELECT count(DISTINCT lbl) FROM comp)
            + (SELECT n FROM nn) - (SELECT count(*) FROM deg) AS BIGINT)
         AS n_components,
       CAST((SELECT n_triangles FROM tri) AS BIGINT) AS n_triangles,
       {density} AS density
"""


# --------------------------------------------------------------------------
# g06 — weighted label propagation communities (synchronous LPA,
# 3 FIXED rounds): labels start as item ids; each round every node
# adopts the label with the LARGEST total edge weight among its
# neighbors' current labels (ties → smallest label; isolated nodes
# keep their own). Algorithmically distinct from the min-label CC
# family (d07/cc_star/g05): LPA finds denser-than-connectivity
# community structure via weighted argmax, not reachability.
# Determinism: integer vote sums, explicit (sum DESC, label ASC)
# row_number tie-break in BOTH engines — never arg_max, whose
# tie-breaking is unspecified. Fixed rounds keep the oracle an
# unrolled CTE chain (the s08/g01/g03 discipline); synchronous LPA
# can oscillate on bipartite structure, but with fixed rounds and
# total-order tie-breaks the output is deterministic regardless.
# Per round: one equi-join + one (node, label) aggregate + one
# node-partitioned window — all key-partitioned, |V|-row state.

_LPA_ROUNDS = 3


def g06_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _graph_shared(spark, sf_dir)
    arcs, nodes = gb.arcs, gb.nodes
    labels = nodes.select("item", F.col("item").alias("lbl"))
    # r13 loop restructure (guide §2.4): the (s DESC, lbl ASC)
    # row_number window is an argmin over the lexicographic key
    # (-s, lbl) — identical winner and tie-break — expressed as a
    # hash aggregate with map-side partial combining instead of a
    # full-partition sort (s is a BIGINT count sum, so -s never
    # overflows). And because arcs are symmetric, every non-isolated
    # node receives a vote every round while isolated nodes (s = 0)
    # can never receive one — so the per-round `labels LEFT JOIN
    # votes` recomposition is a UNION with the constant isolated-node
    # labels instead. One exchange + one sort fewer per round; label
    # values are integers, unchanged.
    # r13 session 2: the isolated-node union is HOISTED out of the
    # loop — iso items (s = 0) receive no vote and cast none (absent
    # from arcs.src), so carrying their constant labels through every
    # round only erased the groupBy's hash partitioning on item and
    # forced a labels re-exchange at the next round's join. Loop state
    # is now the voted (non-isolated) labels only; the single
    # post-loop union restores the exact final row set. Identical
    # labels, one fewer exchange per round.
    iso_lbl = nodes.where(F.col("s") == 0).select(
        "item", F.col("item").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        labels = (
            labels.join(arcs, labels["item"] == arcs["src"])
            .groupBy(F.col("dst").alias("item"), "lbl")
            .agg(F.sum("w").alias("s"))
            .groupBy("item")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("s")).alias("ns"), F.col("lbl").alias("lbl")
                    )
                ).alias("top")
            )
            .select("item", F.col("top.lbl").alias("lbl"))
        )
    out = labels.unionByName(iso_lbl).select(
        "item", F.col("lbl").alias("community")
    )
    # size via groupBy + equi-join, NOT a community-partitioned
    # window: a giant community would land in one window task, while
    # the aggregate keeps map-side partial combining.
    sizes = out.groupBy("community").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return out.join(sizes, "community").select(
        "item", "community", "community_size"
    )


def _g06_sql() -> str:
    prev = "l0"
    rounds = []
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""v{i} AS (
  SELECT item, lbl FROM (
    SELECT d.dst AS item, l.lbl, SUM(d.w) AS s
    FROM {prev} l JOIN dir d ON l.item = d.src
    GROUP BY 1, 2
  )
  QUALIFY row_number() OVER (
    PARTITION BY item ORDER BY s DESC, lbl ASC
  ) = 1
),
l{i} AS (
  SELECT p.item, COALESCE(v.lbl, p.lbl) AS lbl
  FROM {prev} p LEFT JOIN v{i} v ON p.item = v.item
)"""
        )
        prev = f"l{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH {_EDGES_CTE},
dir AS (
  SELECT src, dst, w FROM edges
  UNION ALL
  SELECT dst, src, w FROM edges
),
nodes AS (SELECT DISTINCT item FROM eng),
l0 AS (SELECT item, item AS lbl FROM nodes),
{chain}
SELECT f.item, f.lbl AS community, sz.community_size
FROM {prev} f
JOIN (
  SELECT lbl, count(*) AS community_size FROM {prev} GROUP BY 1
) sz ON f.lbl = sz.lbl
"""


# --------------------------------------------------------------------------
# g07 — incremental edge-maintenance batch replay: the driver-visible
# twin of streaming/graph_stream.py (VERDICT r05 item 4; the
# e16/e18/e19 batch-replay pattern). Events replay as K ordered
# micro-batches (batch id = pmod(event_id, K) — the availableNow
# drain order); each batch's ±1 edge deltas come from the ONE shared
# ``edge_deltas_core`` the live foreachBatch path runs, with the
# pre-batch state taken from the same batch-keyed engagement-log
# layout the stream materializes (here a static batch-id column
# instead of a `_batch_id` parquet partition). The returned edge
# table is the delta sum with w > 0 — the stream's ``current_edges``
# — and the oracle is the batch recompute (`_EDGES_CTE` reshaped),
# so the driver row pins replay == batch INCLUDING the non-monotone
# top-K cap evictions (negative deltas) the cap induces on stock
# data. Per batch the work is touched-users × C(cap, 2) pairs — the
# stream's own bound — and K is fixed, so the plan is a fixed-depth
# declarative chain like g01's.

_REPLAY_BATCHES = 4


def g07_edge_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    item = F.from_json("props", "struct<k:int>").getField("k")
    per_bui = (
        ev.select(
            F.pmod(F.col("event_id"), F.lit(_REPLAY_BATCHES)).alias("b"),
            "user_id",
            item.alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("b", "user_id", "item")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        # LAZY boundary (r13 cc_star pattern): the final action is
        # full-frame, so the first consumer stage materializes the
        # cache and the separate per-invocation checkpoint job
        # disappears (7 -> 6 jobs/rep, wall flat at sf0.1). A
        # changed/unchanged split of the pair join (halves the
        # generated pair mass) was prototyped and measured SLOWER
        # (1.39 -> 1.55 s, 7 -> 11 jobs) — reverted, see
        # OPTIMIZATION_r14.md.
        .transform(lambda d: stage_boundary(d, eager=False))
    )
    # ONE cumulative plan over the batch axis (VERDICT r08 item 3;
    # the r07 fold was already O(K) in state but still submitted
    # 2K plans from a driver loop). For every (touched batch bt,
    # user): the user's engagement state BEFORE bt is the cumulative
    # sum over batches bh < bt, AFTER is bh <= bt — one expansion
    # join (<= K-fold, K fixed at 4) + one aggregate builds every
    # batch's before/after state at once; pairs then carry
    # d = [both endpoints in the after-cap] - [both in the before-
    # cap], so summing ALL pair instances reproduces exactly the sum
    # of the per-batch +-1 delta frames the live stream's
    # edge_deltas_core emits — including the non-monotone cap
    # evictions (an item falling out of a user's top-K yields the
    # same -1 here as in the stream's old_pairs side). Equality with
    # the per-batch core is pinned by
    # tests/test_graph_stream.py::test_g07_single_plan_matches_per_batch_core.
    touched = per_bui.select(F.col("b").alias("bt"), "user_id").distinct()
    hist = per_bui.select("user_id", F.col("b").alias("bh"), "item", "n_ev")
    state = (
        hist.join(touched, "user_id")
        .where(F.col("bh") <= F.col("bt"))
        .groupBy("bt", "user_id", "item")
        .agg(
            F.sum(
                F.when(F.col("bh") < F.col("bt"), F.col("n_ev"))
            ).alias("n_before"),
            F.sum("n_ev").alias("n_after"),
        )
    )
    # both caps rank within the same (bt, user) partitioning -> one
    # exchange feeds both windows; NULL n_before (no prior history)
    # sorts last and is excluded from the before-cap explicitly
    w_after = Window.partitionBy("bt", "user_id").orderBy(
        F.col("n_after").desc(), F.col("item").asc()
    )
    w_before = Window.partitionBy("bt", "user_id").orderBy(
        F.col("n_before").desc_nulls_last(), F.col("item").asc()
    )
    capped = (
        state.withColumn(
            "in_after", F.row_number().over(w_after) <= _USER_ITEM_CAP
        )
        .withColumn(
            "in_before",
            F.col("n_before").isNotNull()
            & (F.row_number().over(w_before) <= _USER_ITEM_CAP),
        )
        .where(F.col("in_after") | F.col("in_before"))
        .select("bt", "user_id", "item", "in_after", "in_before")
    )
    a, c = capped.alias("a"), capped.alias("c")
    pairs = (
        a.join(c, ["bt", "user_id"])
        .where(F.col("a.item") < F.col("c.item"))
        .select(
            F.col("a.item").alias("src"),
            F.col("c.item").alias("dst"),
            (
                (F.col("a.in_after") & F.col("c.in_after")).cast("int")
                - (F.col("a.in_before") & F.col("c.in_before")).cast("int")
            ).alias("d"),
        )
        .where(F.col("d") != 0)
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.sum("d").cast("bigint").alias("w"))
        .where(F.col("w") > 0)
    )


def _g07_sql() -> str:
    return f"""
WITH {_EDGES_CTE}
SELECT src, dst, w FROM edges
"""


QUERIES = {
    "g01_item_pagerank": g01_item_pagerank,
    "g02_item_triangles": g02_item_triangles,
    "g03_bfs_hops": g03_bfs_hops,
    "g04_item_similarity": g04_item_similarity,
    "g05_graph_summary": g05_graph_summary,
    "g06_lpa_communities": g06_lpa_communities,
    "g07_edge_stream_replay": g07_edge_stream_replay,
}

ORACLE: dict[str, str] = {
    "g01_item_pagerank": _g01_sql(),
    "g02_item_triangles": _g02_sql(),
    "g03_bfs_hops": _g03_sql(),
    "g04_item_similarity": _g04_sql(),
    "g05_graph_summary": _g05_sql(),
    "g06_lpa_communities": _g06_sql(),
    "g07_edge_stream_replay": _g07_sql(),
}
