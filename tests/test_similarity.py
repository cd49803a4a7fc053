"""ANN similarity search: exactness of the brute-force baseline and the
IVF recall gate promised in operators/similarity.py (recall >= 0.9 vs
exact top-k with clustered data and n_probe=4 of 12 centroids)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


DIM = 16
N_CLUSTERS = 12
N_VECS = 360
N_QUERIES = 30
K = 5


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, N_VECS)
    vecs = centers[assign] + 0.15 * rng.normal(size=(N_VECS, DIM))
    pdf = pd.DataFrame({
        "vec_id": np.arange(N_VECS, dtype=np.int64),
        "embedding": [v.astype(np.float64).tolist() for v in vecs],
    })
    cents = pd.DataFrame({
        "c_id": np.arange(N_CLUSTERS, dtype=np.int64),
        "c_vec": [c.astype(np.float64).tolist() for c in centers],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    cdf = spark.createDataFrame(cents, "c_id long, c_vec array<double>")
    return vecs, df, cdf


def _brute_topk(vecs, q_ids, k):
    """NumPy oracle: exact cosine top-k (excluding self), ties by id."""
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    out = {}
    for q in q_ids:
        s = sims[q].copy()
        s[q] = -np.inf
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        out[int(q)] = [int(t) for t in order]
    return out


def test_cosine_topk_exact(spark, vectors):
    from raster2dggs_spark.operators.similarity import cosine_topk

    vecs, df, _ = vectors
    q = df.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    t = df.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_vec"))
    out = cosine_topk(q, t, k=K).toPandas()
    got = {int(qid): [int(x) for x in grp.sort_values("rank")["t_id"]]
           for qid, grp in out.groupby("q_id")}
    assert got == _brute_topk(vecs, range(N_QUERIES), K)


def test_ivf_recall_gate(spark, vectors):
    from raster2dggs_spark.operators.similarity import ivf_topk

    vecs, df, cdf = vectors
    q = df.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    t = df.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_vec"))
    out = ivf_topk(q, t, cdf, k=K, n_probe=4).toPandas()
    exact = _brute_topk(vecs, range(N_QUERIES), K)
    hits = total = 0
    for qid, grp in out.groupby("q_id"):
        approx = {int(x) for x in grp["t_id"]}
        hits += len(approx & set(exact[int(qid)]))
        total += K
    recall = hits / total
    assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9"


def test_ivf_returns_k_rows_per_query(spark, vectors):
    from raster2dggs_spark.operators.similarity import ivf_topk

    _, df, cdf = vectors
    q = df.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    t = df.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_vec"))
    out = ivf_topk(q, t, cdf, k=K, n_probe=4)
    counts = out.groupBy("q_id").count().toPandas()
    assert (counts["count"] == K).all()
    assert len(counts) == N_QUERIES


def test_train_centroids_improves_ivf(spark, vectors):
    """Lloyd-trained centroids: objective structure holds (each centroid
    near a true cluster center) and IVF recall with trained centroids
    meets the gate without privileged 'first 12 vectors' seeding."""
    from raster2dggs_spark.operators.similarity import ivf_topk, train_centroids

    vecs, df, _ = vectors
    cents = train_centroids(df, k=N_CLUSTERS, iters=4)
    cpdf = cents.toPandas()
    assert len(cpdf) == N_CLUSTERS
    assert sorted(cpdf["c_id"]) == list(range(N_CLUSTERS))
    q = df.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    t = df.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_vec"))
    out = ivf_topk(q, t, cents, k=K, n_probe=4).toPandas()
    exact = _brute_topk(vecs, range(N_QUERIES), K)
    hits = sum(len({int(x) for x in grp["t_id"]} & set(exact[int(qid)]))
               for qid, grp in out.groupby("q_id"))
    recall = hits / (N_QUERIES * K)
    assert recall >= 0.9, f"trained-centroid IVF recall {recall:.3f}"


def test_hyperplane_near_dup(spark, vectors):
    """LSH near-dup recovers synthesized twins (>=0.9 recall) and emits
    no pair below the cosine threshold (exact verification stage)."""
    from raster2dggs_spark.operators.similarity import hyperplane_near_dup

    _, df, _ = vectors
    base = df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    twin = base.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + 0.1),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    out = hyperplane_near_dup(base.unionByName(twin),
                              threshold=0.99).toPandas()
    assert (out["cosine"] >= 0.99).all()
    twins_found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])
                   if b == a + 10_000}
    assert len(twins_found) >= 0.9 * N_VECS
    # non-twin pairs that slip through buckets are cosine-verified: with
    # clustered vectors some legitimately exceed the threshold, but every
    # reported pair must satisfy it (checked above)


def test_hyperplane_near_dup_bucket_cap(spark):
    """Round-3 VERDICT #2: the band key has only 2^(n_planes/bands)
    values, so a degenerate near-identical corpus saturates one bucket
    and the self-join goes quadratic.  The cap must drop over-cap
    buckets BEFORE the join (groupBy-count + broadcast anti-join),
    keeping the candidate stage sub-quadratic, while leaving normal
    buckets untouched."""
    from raster2dggs_spark.operators.similarity import hyperplane_near_dup

    rng = np.random.default_rng(7)
    base = rng.normal(size=DIM)
    base /= np.linalg.norm(base)
    n = 400
    # near-identical: every vector lands in the same bucket per band
    vecs = base[None, :] + 1e-4 * rng.normal(size=(n, DIM))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")

    capped = hyperplane_near_dup(df, threshold=0.9, max_bucket=100).count()
    assert capped == 0  # the hot bucket (400 > 100) is dropped entirely

    uncapped = hyperplane_near_dup(df, threshold=0.9, max_bucket=None).count()
    assert uncapped == n * (n - 1) // 2  # quadratic without the cap

    # a corpus whose buckets sit under the cap is unaffected
    spread = rng.normal(size=(60, DIM))
    pdf2 = pd.DataFrame({
        "vec_id": np.arange(60, dtype=np.int64),
        "embedding": [v.tolist() for v in spread],
    })
    df2 = spark.createDataFrame(pdf2, "vec_id long, embedding array<double>")
    a = hyperplane_near_dup(df2, threshold=0.5, max_bucket=100).toPandas()
    b = hyperplane_near_dup(df2, threshold=0.5, max_bucket=None).toPandas()
    key = lambda d: sorted(zip(d["id_a"], d["id_b"]))
    assert key(a) == key(b)


def test_train_centroids_plan_depth_bounded(spark, vectors):
    """Round-2 advice: each Lloyd iteration localCheckpoints, so the
    returned plan is a materialized scan — not a chain of every prior
    iteration's crossJoin+window (which re-derives all iterations and
    grows planning time linearly)."""
    from raster2dggs_spark.operators.similarity import train_centroids

    _vecs, df, _cdf = vectors
    cents = train_centroids(df, k=3, iters=6)
    plan = cents._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert cents.count() == 3


def test_pq_encode_and_adc_recall(spark, vectors):
    """PQ: every vector gets one code per subspace; ADC top-k over the
    32x-compressed codes recovers a usable fraction of the exact
    neighbours (unit-normalized so L2 ordering == cosine ordering), and
    per-subspace k-means training beats the data-independent md5
    codebooks."""
    from raster2dggs_spark.operators.similarity import (
        pq_encode, pq_topk, pq_train_codebooks,
    )

    vecs, _, _ = vectors
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf = pd.DataFrame({
        "vec_id": np.arange(unit.shape[0], dtype=np.int64),
        "embedding": [v.tolist() for v in unit],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    codes = pq_encode(df, dim=DIM, m=8, k=16)
    assert codes.count() == unit.shape[0] * 8
    assert codes.where("dist < 0").count() == 0

    q = df.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = _brute_topk(unit, range(20), K)

    def recall(out):
        got = out.toPandas()
        hit = tot = 0
        for qi in range(20):
            g = set(got[got.q_id == qi]["vec_id"])
            e = set(exact[qi])
            hit += len(g & e)
            tot += len(e)
        return hit / tot

    r_md5 = recall(pq_topk(q, codes, dim=DIM, m=8, k=16, topn=K))
    trained = pq_train_codebooks(df, dim=DIM, m=8, k=16, iters=3)
    codes_t = pq_encode(df, dim=DIM, m=8, k=16, codebooks=trained)
    r_tr = recall(pq_topk(q, codes_t, dim=DIM, m=8, k=16, topn=K,
                          codebooks=trained))
    assert r_md5 >= 0.2          # data-independent baseline is usable
    assert r_tr >= r_md5         # training never hurts on clustered data
    assert r_tr >= 0.5


def test_ivfpq_topk(spark, vectors):
    """IVF-PQ composition: candidates prune to the probed buckets
    (strictly fewer ADC evaluations than plain PQ), recall stays usable
    on clustered data with trained codebooks."""
    from raster2dggs_spark.operators.similarity import (
        ivfpq_topk, pq_train_codebooks,
    )

    vecs, _, cdf = vectors
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf = pd.DataFrame({
        "vec_id": np.arange(unit.shape[0], dtype=np.int64),
        "embedding": [v.tolist() for v in unit],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    q = df.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    trained = pq_train_codebooks(df, dim=DIM, m=8, k=16, iters=2)
    out = ivfpq_topk(q, df, cdf, dim=DIM, m=8, k=16, topn=K, n_probe=4,
                     codebooks=trained).toPandas()
    assert (out.groupby("q_id").size() == K).all()
    exact = _brute_topk(unit, range(20), K)
    hits = sum(len(set(g["vec_id"]) & set(exact[int(qi)]))
               for qi, g in out.groupby("q_id"))
    assert hits / (20 * K) >= 0.3


def test_pq_encode_vectorized_bit_identical(spark, vectors):
    """The Arrow fast path (auto above dim·k > 4096) must reproduce the
    relational encode BIT-IDENTICALLY — the 6dp-round-then-argmin
    contract is what makes the oracle transferable to production runs."""
    from raster2dggs_spark.operators.similarity import pq_encode

    _, df, _ = vectors
    a = pq_encode(df, dim=DIM, m=4, k=16, vectorized=False).toPandas()
    b = pq_encode(df, dim=DIM, m=4, k=16, vectorized=True).toPandas()
    key = ["vec_id", "sub"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["code"].values == b["code"].values).all()
    assert (a["dist"].values == b["dist"].values).all()


def test_hyperplane_near_dup_saturation_observable(spark):
    """Round-4 ADVICE: dropped LSH buckets silently lose true near-dups
    — the ``stats`` dict must report saturation so callers can raise
    ``n_planes``."""
    from raster2dggs_spark.operators.similarity import hyperplane_near_dup

    rng = np.random.default_rng(11)
    base = rng.normal(size=DIM)
    base /= np.linalg.norm(base)
    n = 300
    vecs = base[None, :] + 1e-4 * rng.normal(size=(n, DIM))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")

    stats = {}
    hyperplane_near_dup(df, threshold=0.9, max_bucket=100,
                        stats=stats).count()
    # every vector collides per band -> one saturated bucket per band
    assert stats["buckets_dropped"] >= 1
    assert stats["rows_dropped"] >= n
    assert stats["max_bucket_size"] == n

    # an unsaturated corpus reports zero drops
    spread = rng.normal(size=(50, DIM))
    pdf2 = pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [v.tolist() for v in spread],
    })
    df2 = spark.createDataFrame(pdf2, "vec_id long, embedding array<double>")
    stats2 = {}
    hyperplane_near_dup(df2, threshold=0.5, max_bucket=100,
                        stats=stats2).count()
    assert stats2["buckets_dropped"] == 0
    assert stats2["rows_dropped"] == 0
    assert 0 < stats2["max_bucket_size"] <= 100


def test_knn_recall_known_sets(spark):
    import pandas as pd
    import pytest as _pytest

    from raster2dggs_spark.operators.similarity import knn_recall

    ref = spark.createDataFrame(pd.DataFrame(
        {"q_id": [1, 1, 1, 2, 2, 3],
         "t_id": [10, 11, 12, 20, 21, 30]}))
    cand = spark.createDataFrame(pd.DataFrame(
        {"q_id": [1, 1, 1, 2, 2],
         "t_id": [10, 11, 99, 77, 78]}))
    out = {r.q_id: (r.n_ref, r.n_hit, r.recall)
           for r in knn_recall(ref, cand).collect()}
    assert out[1] == (3, 2, _pytest.approx(2 / 3, abs=1e-6))
    assert out[2] == (2, 0, 0.0)   # no overlap
    assert out[3] == (1, 0, 0.0)   # query absent from candidate
    assert len(out) == 3
