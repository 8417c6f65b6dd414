"""Graph analytics over the verified near-duplicate pair graph.

The dedup pipeline's pair graph (MinHash-LSH candidates verified at
Jaccard >= tau, see operators/similarity.py) is a graph worth analyzing
in its own right: PageRank surfaces the most-connected duplicates (the
"template" documents spam farms stamp out — high centrality = high
boilerplate suspicion), and the triangle census measures how clique-like
the duplicate clusters are (near-dup clusters from one template are
near-cliques; chains of pairwise-similar-but-drifting revisions are
triangle-free — the two need different curation responses).

Both operators share the scale posture of connected components
(operators/components.py): the edge list is match-bounded (≪ corpus at
any scale — millions of edges at 100 TB, not trillions), so iteration
cost is ∝ duplication, not corpus size. PageRank is the canonical
iterative-Spark shape — join + aggregate per round with
``localCheckpoint`` lineage truncation — with the same scale-adaptive
driver shortcut as CC: a tiny measured edge list solves in microseconds
on the driver instead of paying ~1 s/round of scheduler latency.

Reference: the reference has no graph layer at all (its dedup story
stops at pandas drop_duplicates, dwh_lab/dwh/general_lib.py); this
module is part of the beyond-reference training-data surface.

Oracles: the shared ``_MINHASH_PAIRS_CTES`` pair pipeline (so the graph
and the dedup operators can never disagree about what an edge is), then
PageRank unrolled to its fixed iteration count in chained CTEs and the
triangle census as one 3-way self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jlp_spark.operators.similarity import _MINHASH_PAIRS_CTES, dedup_minhash_lsh
from etl_jlp_spark.registry import query

PR_DAMPING = 0.85
PR_ITERS = 5  # fixed (not to-convergence) so the oracle can unroll it
PR_ROUND = 6
# Same rationale as components.DRIVER_CC_MAX_EDGES: below this, 5
# distributed rounds are pure scheduler latency; the count that gates
# the switch also sizes the distributed path's shuffle width.
DRIVER_PR_MAX_EDGES = 100_000

_GRAPH_CTES = (
    _MINHASH_PAIRS_CTES
    + """
, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS node FROM edges
), deg AS (
  SELECT a AS node, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY a
)"""
)


def _pagerank_iter_ctes() -> str:
    """r1..rK chained CTEs, each one power-iteration step. The float
    expressions are written so BOTH engines evaluate the identical IEEE
    ops: ``1 - 0.85`` stays symbolic (each engine computes the same
    double), contributions are rank/deg sums over the same edge rows."""
    out = f"""
, nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)
, r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for i in range(1, PR_ITERS + 1):
        out += f"""
, r{i} AS (
  SELECT n.node,
         (1 - {PR_DAMPING}) / (SELECT n FROM nn) + {PR_DAMPING} * COALESCE(s.c, 0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.b AS node, sum(r.rank / d.deg) AS c
    FROM edges e JOIN r{i - 1} r ON e.a = r.node JOIN deg d ON e.a = d.node
    GROUP BY e.b
  ) s ON n.node = s.node
)"""
    return out


def _driver_pagerank(rows: list) -> list[tuple[int, float]]:
    """Power iteration over collected (src, dst) rows — the tiny-graph
    shortcut. Same arithmetic as the distributed loop and the oracle."""
    nbrs: dict[int, list[int]] = {}
    for s, d in rows:
        nbrs.setdefault(s, []).append(d)
    n = float(len(nbrs))
    ranks = {v: 1.0 / n for v in nbrs}
    for _ in range(PR_ITERS):
        contrib: dict[int, float] = {v: 0.0 for v in nbrs}
        for src, outs in nbrs.items():
            share = ranks[src] / len(outs)
            for dst in outs:
                contrib[dst] += share
        ranks = {v: (1 - PR_DAMPING) / n + PR_DAMPING * contrib[v] for v in nbrs}
    return sorted((v, round(r, PR_ROUND)) for v, r in ranks.items())


@query(
    "graph_pagerank",
    oracle=_GRAPH_CTES
    + _pagerank_iter_ctes()
    + f"""
SELECT CAST(node AS BIGINT) AS node, round(rank, {PR_ROUND}) AS pagerank
FROM r{PR_ITERS}
""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 fixed iterations) over the undirected
    near-dup pair graph: rank mass concentrates on the hub documents
    every other duplicate links to — template/boilerplate detectors
    threshold on it. Undirected graph ⇒ no dangling nodes (every node
    has degree ≥ 1), so the teleport term is the only mass correction.

    Scale: iteration operand is the match-bounded edge list, never the
    corpus. Tiny graphs (≤ {DRIVER_PR_MAX_EDGES:,} measured edges — the
    count is paid anyway to size the shuffle) solve driver-side;
    otherwise the classic join-agg loop runs with ``localCheckpoint``
    truncating lineage per round (the iterative-Spark pitfall CC
    already documents)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.unionAll(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .persist()
    )
    n_edges = edges.count()
    if n_edges <= DRIVER_PR_MAX_EDGES:
        out = _driver_pagerank([(r["src"], r["dst"]) for r in edges.collect()])
        edges.unpersist()
        return spark.createDataFrame(out, "node long, pagerank double")
    sc = edges.sparkSession.sparkContext
    n_part = max(1, min(sc.defaultParallelism, n_edges // 100_000 + 1))
    edges = edges.repartition(n_part, "src")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    n_nodes = deg.count()
    ranks = deg.select(
        F.col("src").alias("node"), "deg", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            ranks.drop("rank")
            .join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                "deg",
                (
                    F.lit((1 - PR_DAMPING) / n_nodes)
                    + F.lit(PR_DAMPING) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return ranks.select(
        F.col("node").cast("long").alias("node"),
        F.round("rank", PR_ROUND).alias("pagerank"),
    )


@query(
    "graph_triangle_stats",
    oracle=_GRAPH_CTES
    + """
, und AS (SELECT doc_a AS a, doc_b AS b FROM pairs)
, tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM und e1 JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), wedges AS (
  SELECT CAST(sum(CAST(deg AS BIGINT) * (CAST(deg AS BIGINT) - 1)) / 2 AS BIGINT) AS w
  FROM deg
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
       (SELECT n FROM tri) AS n_triangles,
       CASE WHEN (SELECT w FROM wedges) > 0
            THEN round(3.0 * (SELECT n FROM tri) / (SELECT w FROM wedges), 6)
       END AS clustering_coeff
""",
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph: count of triangles plus
    the global clustering coefficient 3·triangles / wedges — ≈1 means
    duplicate clusters are cliques (one template, many stamps), ≈0
    means pairwise drift chains (revision histories). One row out.

    Plan: triangles via the a<b<c oriented 3-way self-join of the
    UNIQUE-edge list — each triangle counted exactly once, join
    operands are the match-bounded pair list (broadcast at any
    realistic dup rate); wedges are one agg over the degree table.
    All-pairs never materializes anywhere."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a")) & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .count()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).distinct()
    deg = edges.groupBy("doc_a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - F.lit(1))) / F.lit(2)).cast("long").alias("w"),
    ).first()
    n_edges = pairs.count()
    pairs.unpersist()
    n_nodes, wedges = stats["n_nodes"], stats["w"]
    coeff = round(3.0 * tri / wedges, 6) if wedges and wedges > 0 else None
    return spark.createDataFrame(
        [(n_nodes, n_edges, tri, coeff)],
        "n_nodes long, n_edges long, n_triangles long, clustering_coeff double",
    )


# ---------------------------------------------------------------------------
# Label propagation (Raghavan et al. 2007), synchronous variant with a
# deterministic tie-break — community labels for the near-dup graph
# without CC's full transitive closure: after k rounds every node holds
# the (max-frequency, then min) label of its neighborhood, which
# separates template clusters that CC would merge through one weak
# bridge pair.
# ---------------------------------------------------------------------------

LPA_ITERS = 4  # fixed so the oracle can unroll it
DRIVER_LPA_MAX_EDGES = 100_000


def _lpa_iter_ctes() -> str:
    out = """
, l0 AS (SELECT node, node AS label FROM nodes)"""
    for i in range(1, LPA_ITERS + 1):
        out += f"""
, l{i} AS (
  SELECT node, label FROM (
    SELECT t.node, t.label,
           row_number() OVER (PARTITION BY t.node ORDER BY t.c DESC, t.label) AS rn
    FROM (
      SELECT e.b AS node, l.label, count(*) AS c
      FROM edges e JOIN l{i - 1} l ON e.a = l.node
      GROUP BY e.b, l.label
    ) t
  ) q WHERE rn = 1
)"""
    return out


def _driver_lpa(rows: list) -> list[tuple[int, int]]:
    """Synchronous LPA over collected (src, dst) rows — the tiny-graph
    shortcut, same update rule as the distributed loop and the oracle."""
    nbrs: dict[int, list[int]] = {}
    for s, d in rows:
        nbrs.setdefault(d, []).append(s)
    labels = {v: v for v in nbrs}
    for _ in range(LPA_ITERS):
        nxt = {}
        for v, ins in nbrs.items():
            freq: dict[int, int] = {}
            for u in ins:
                lab = labels[u]
                freq[lab] = freq.get(lab, 0) + 1
            nxt[v] = min(lab for lab, c in freq.items() if c == max(freq.values()))
        labels = nxt
    return sorted(labels.items())


@query(
    "graph_label_propagation",
    oracle=_GRAPH_CTES
    + _lpa_iter_ctes()
    + f"""
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS community,
       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS community_size
FROM l{LPA_ITERS}
""",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LPA_ITERS} synchronous label-propagation rounds over the
    near-dup graph: each node adopts its neighborhood's
    (max-frequency, min-on-tie) label; output is (node, community,
    community_size).

    Plan: per round ONE edges⋈labels join + a (node, label) count +
    a per-node top-1 window — all keyed on the match-bounded edge
    list, with ``localCheckpoint`` truncating lineage between rounds.
    Graphs ≤ {DRIVER_LPA_MAX_EDGES:,} measured edges short-circuit to
    the driver (the count is paid anyway to size the shuffle). The
    oracle unrolls the same {LPA_ITERS} rounds as chained CTEs."""
    from pyspark.sql import Window

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.unionAll(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .persist()
    )
    n_edges = edges.count()
    if n_edges <= DRIVER_LPA_MAX_EDGES:
        labs = _driver_lpa([(r["src"], r["dst"]) for r in edges.collect()])
        edges.unpersist()
        sizes: dict[int, int] = {}
        for _, lab in labs:
            sizes[lab] = sizes.get(lab, 0) + 1
        return spark.createDataFrame(
            [(n, lab, sizes[lab]) for n, lab in labs],
            "node long, community long, community_size long",
        )
    sc = edges.sparkSession.sparkContext
    n_part = max(1, min(sc.defaultParallelism, n_edges // 100_000 + 1))
    edges = edges.repartition(n_part, "dst")
    labels = (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), "label")
    for _ in range(LPA_ITERS):
        labels = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumnRenamed("node2", "node")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    wsize = Window.partitionBy("label")
    return labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("community"),
        F.count(F.lit(1)).over(wsize).cast("long").alias("community_size"),
    )
