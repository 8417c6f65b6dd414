"""Structural invariants of the Lloyd k-means operator, complementing
its unrolled-CTE DuckDB value-hash oracle."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_kmeans_assigns_every_vector_once(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.embeddings import KM_K

    out = QS["kmeans_lloyd_assign"](spark, SF_SMALL)
    rows = out.collect()
    n_vec = load_table(spark, SF_SMALL, "embeddings").count()
    assert len(rows) == n_vec
    assert len({r["vec_id"] for r in rows}) == n_vec
    for r in rows:
        assert 0 <= r["cluster"] < KM_K
        assert r["d2"] >= 0.0


def test_kmeans_cluster_sizes_reconcile(spark):
    rows = QS["kmeans_lloyd_assign"](spark, SF_SMALL).collect()
    by_cl: dict[int, int] = {}
    for r in rows:
        by_cl[r["cluster"]] = by_cl.get(r["cluster"], 0) + 1
    for r in rows:
        assert r["cluster_size"] == by_cl[r["cluster"]]
    assert sum(by_cl.values()) == len(rows)


def test_kmeans_matches_numpy_replica(spark):
    """Replay the exact Lloyd recipe (min-vec_id seeds, per-round 6dp
    centroid rounding, (d2, cl) tie-break) in NumPy and require the
    identical final assignment and 4dp-rounded distances."""
    import numpy as np

    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.embeddings import KM_ITERS, KM_K

    rows = {r["vec_id"]: r for r in QS["kmeans_lloyd_assign"](spark, SF_SMALL).collect()}
    data = sorted(
        (r["vec_id"], np.array([float(x) for x in r["embedding"]], dtype=np.float64))
        for r in load_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [i for i, _ in data]
    X = np.stack([v for _, v in data])
    cent = X[:KM_K].copy()  # data is vec_id-sorted → min-vec_id seeds

    def assign(c):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1), d2  # argmin takes lowest cl on ties

    for _ in range(KM_ITERS):
        a, _ = assign(cent)
        cent = np.stack(
            [np.round(X[a == k].mean(axis=0), 6) for k in range(KM_K)]
        )
    a, d2 = assign(cent)
    for idx, vid in enumerate(ids):
        r = rows[vid]
        assert r["cluster"] == int(a[idx]), vid
        assert abs(r["d2"] - round(float(d2[idx, a[idx]]), 4)) <= 1e-3, vid


def test_kmeans_plan_broadcasts_centroids_no_cartesian(spark):
    plan = (
        QS["kmeans_lloyd_assign"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # k-row centroid side must ride a broadcast, and seeding must be a
    # distributed top-k, not a single-partition global window over the table
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan, plan[:3000]
