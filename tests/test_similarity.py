"""Similarity search vs DuckDB list_cosine_similarity oracle."""

from __future__ import annotations

import numpy as np

from conftest import SF_CHECK, assert_frames_match, to_pdf

EMB = f"{SF_CHECK}/embeddings.parquet"
QUERY_IDS = list(range(10))


def _knn_oracle(ddb, k: int = 10):
    return ddb.sql(
        f"""
        WITH q AS (SELECT vec_id, embedding FROM '{EMB}' WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 list_cosine_similarity(q.embedding, e.embedding) AS cosine
          FROM q CROSS JOIN '{EMB}' e
          WHERE q.vec_id <> e.vec_id
        )
        SELECT query_id, neighbor_id, cosine FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored
        ) WHERE rn <= {k}
        """
    ).df()


def test_knn_bruteforce_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.similarity import knn_bruteforce

    ds = read_table(EMB, columns=["vec_id", "embedding"])
    actual = to_pdf(knn_bruteforce(ds, query_ids=QUERY_IDS, k=10))
    expected = _knn_oracle(ddb, 10)
    assert_frames_match(actual, expected, atol=1e-6)


def test_knn_ivf_recall_vs_bruteforce(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.similarity import knn_bruteforce, knn_ivf

    ds = read_table(EMB, columns=["vec_id", "embedding"])
    exact = to_pdf(knn_bruteforce(ds, query_ids=QUERY_IDS, k=10))
    approx = to_pdf(knn_ivf(ds, n_queries=10, k=10, n_clusters=8, nprobe=4))
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))
    approx_pairs = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"
    # approx results are still true cosines (no made-up scores)
    m = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert np.allclose(m.cosine_a, m.cosine_e, atol=1e-9)


def test_embedding_neardup_pairs_matches_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.similarity import embedding_neardup_pairs

    ds = read_table(EMB, columns=["vec_id", "embedding"])
    threshold = 0.4
    actual = to_pdf(embedding_neardup_pairs(ds, threshold=threshold))
    expected = ddb.sql(
        f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(a.embedding, b.embedding) AS cosine
        FROM '{EMB}' a JOIN '{EMB}' b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
        """
    ).df()
    assert_frames_match(actual, expected, atol=1e-6)


def test_embedding_neardup_lsh_full_recall_at_09():
    """The banded random-projection route finds every pair the exact
    block-nested-loop finds at threshold 0.9 (planted near-dups), with
    identical cosines (verification is exact) and no false positives."""
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.similarity import (
        embedding_neardup_lsh, embedding_neardup_pairs)

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 32))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float64)}
            for i in range(60)]
    # planted near-dups: tiny perturbations of vectors 0-7
    for j in range(8):
        v = base[j] + rng.standard_normal(32) * 0.02
        rows.append({"vec_id": 100 + j, "embedding": v})
    df = pd.DataFrame(rows)

    exact = embedding_neardup_pairs(
        ray.data.from_pandas(df), threshold=0.9).to_pandas()
    assert len(exact) >= 8  # the planted pairs are really above 0.9

    lsh = embedding_neardup_lsh(
        ray.data.from_pandas(df), threshold=0.9).to_pandas()
    e = exact.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    l = lsh.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # full recall on this corpus + exact verify => identical pair sets
    pd.testing.assert_frame_equal(
        e[["id_a", "id_b"]].astype("int64"), l[["id_a", "id_b"]].astype("int64"))
    np.testing.assert_allclose(e.cosine.to_numpy(), l.cosine.to_numpy(), rtol=1e-12)


def test_pca_fit_transform_properties():
    """Exact PCA from moment partials: scores match a direct eigh on the
    locally-computed covariance (up to the documented sign rule), pc1
    variance >= pc2 variance, components orthogonal, and the result is
    invariant to input blocking."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from conftest import SF_CHECK, to_pdf
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.similarity import pca_fit_transform

    EMB = f"{SF_CHECK}/embeddings.parquet"
    out = to_pdf(pca_fit_transform(
        read_table(EMB, columns=["vec_id", "embedding"]).repartition(8),
        n_components=2,
    )).sort_values("vec_id").reset_index(drop=True)
    out2 = to_pdf(pca_fit_transform(
        read_table(EMB, columns=["vec_id", "embedding"]).repartition(3),
        n_components=2,
    )).sort_values("vec_id").reset_index(drop=True)
    np.testing.assert_allclose(out.pc1, out2.pc1, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(out.pc2, out2.pc2, rtol=1e-9, atol=1e-9)

    raw = pq.read_table(EMB).to_pandas()
    x = np.stack(raw.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    w = evecs[:, order]
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(2)])
    ref = xc @ (w * flip)
    np.testing.assert_allclose(out.pc1, ref[:, 0], rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(out.pc2, ref[:, 1], rtol=1e-7, atol=1e-7)
    assert out.pc1.var() >= out.pc2.var()
    # orthogonality of scores (centered): correlation ~ 0
    c = np.corrcoef(out.pc1, out.pc2)[0, 1]
    assert abs(c) < 1e-6


def test_kmeans_lloyd_planted_clusters():
    """Planted well-separated clusters are recovered exactly; result is
    invariant to input blocking; inertia decreases monotonically."""
    import numpy as np
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(11)
    centers = np.array([[0.0] * 8, [50.0] * 8, [-50.0] * 8])
    rows = []
    truth = []
    for i in range(300):
        c = i % 3
        truth.append(c)
        rows.append((i, (centers[c] + rng.normal(0, 1, 8)).tolist()))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    out = to_pdf(kmeans_lloyd(
        ray.data.from_pandas(df).repartition(6),
        n_clusters=3, n_iter=4,
    )).sort_values("vec_id").reset_index(drop=True)
    out2 = to_pdf(kmeans_lloyd(
        ray.data.from_pandas(df).repartition(2),
        n_clusters=3, n_iter=4,
    )).sort_values("vec_id").reset_index(drop=True)
    assert (out.cluster.to_numpy() == out2.cluster.to_numpy()).all()
    # planted recovery: each true cluster maps to exactly one label
    m = pd.crosstab(pd.Series(truth), out.cluster)
    assert (m.gt(0).sum(axis=1) == 1).all()
    assert out.cluster.nunique() == 3


def test_embedding_neardup_size_guard_routes_to_lsh():
    """Above ``exact_max_rows`` the exact op self-routes through the LSH +
    exact-verify path (VERDICT r3 #8): one code path selected by corpus
    size, same pair set on a full-recall corpus."""
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 32))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float64)}
            for i in range(60)]
    for j in range(8):
        v = base[j] + rng.standard_normal(32) * 0.02
        rows.append({"vec_id": 100 + j, "embedding": v})
    df = pd.DataFrame(rows)

    exact = embedding_neardup_pairs(
        ray.data.from_pandas(df), threshold=0.9, exact_max_rows=None).to_pandas()
    routed = embedding_neardup_pairs(
        ray.data.from_pandas(df), threshold=0.9, exact_max_rows=10).to_pandas()
    e = exact.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    r = routed.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        e[["id_a", "id_b"]].astype("int64"), r[["id_a", "id_b"]].astype("int64"))
    np.testing.assert_allclose(e.cosine.to_numpy(), r.cosine.to_numpy(), rtol=1e-12)


def test_centroid_similarity_golden():
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.similarity import centroid_similarity

    # label 0 centroids to (1,0); label 1 to (0,1); label 2 to (1,1)/norm
    rows = [
        (0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [1.0, 1.0], 2), (4, [1.0, 1.0], 2),
    ]
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    out = centroid_similarity(ray.data.from_pandas(df)) \
        .to_pandas().set_index(["label_a", "label_b"])
    assert abs(out.loc[(0, 1), "cosine"] - 0.0) < 1e-12
    assert abs(out.loc[(0, 2), "cosine"] - 1 / np.sqrt(2)) < 1e-12
    assert abs(out.loc[(1, 2), "cosine"] - 1 / np.sqrt(2)) < 1e-12
    assert len(out) == 3


def test_kmeans_silhouette_planted_vs_overlapping():
    import numpy as np
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.stages.similarity import kmeans_silhouette

    rng = np.random.default_rng(9)

    def corpus(sep):
        centers = rng.normal(0, 1, (4, 16)) * sep
        rows = []
        for c in range(4):
            rows.append(centers[c] + rng.normal(0, 0.05, (120, 16)))
        x = np.concatenate(rows)
        # interleave blob membership across ids: the deterministic init
        # takes the smallest-id sample rows, which must span the blobs
        perm = np.arange(len(x)).reshape(4, -1).T.ravel()
        x = x[perm]
        return pa.table({
            "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
            "embedding": pa.array(list(x.astype(np.float32))),
        })

    tight = kmeans_silhouette(
        ray.data.from_arrow(corpus(6.0)), n_clusters=4, n_iter=8
    ).to_pandas()
    loose = kmeans_silhouette(
        ray.data.from_arrow(corpus(0.12)), n_clusters=4, n_iter=8
    ).to_pandas()
    assert tight["n_vecs"].sum() == 480
    assert (tight["mean_silhouette"] > 0.9).all()
    assert loose["mean_silhouette"].mean() < tight["mean_silhouette"].mean()


def test_pq_distortion_planted_and_monotone():
    import numpy as np
    import pyarrow as pa
    import ray
    from s_tsfe_dl_ray.stages.similarity import pq_distortion

    rng = np.random.default_rng(17)
    # planted: every 8-dim subvector drawn from a 4-entry codebook ->
    # PQ with n_codes >= 4 reconstructs (near) exactly
    codebook = rng.normal(0, 1, (4, 8))
    picks = rng.integers(0, 4, (300, 8))
    x = np.concatenate([codebook[picks[:, j]] for j in range(8)], axis=1)
    t = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array(list(x.astype(np.float32))),
    })
    out = pq_distortion(ray.data.from_arrow(t), m=8, n_codes=8,
                        sample_size=300).to_pandas()
    assert out["pq_mse_e6"].max() < 1.0  # ~float32 noise only

    # random vectors: distortion decreases as the codebook grows
    y = rng.normal(0, 1, (400, 64)).astype(np.float32)
    t2 = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.array(list(y)),
    })
    mse = {}
    for k in (2, 16):
        mse[k] = pq_distortion(ray.data.from_arrow(t2), m=8, n_codes=k,
                               sample_size=400).to_pandas()["pq_mse_e6"].mean()
    assert mse[16] < mse[2]
    assert mse[16] > 0


def test_knn_ivf_pq_recall_and_planted_neighbors():
    import numpy as np
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.similarity import knn_bruteforce, knn_ivf_pq

    rng = np.random.default_rng(13)
    # planted: each of the 10 query vectors has 3 tight neighbors
    base = rng.standard_normal((200, 32))
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float64)}
            for i in range(200)]
    nid = 500
    for q in range(10):
        for _ in range(3):
            rows.append({"vec_id": nid,
                         "embedding": base[q] + rng.standard_normal(32) * 0.05})
            nid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    exact = to_pdf(knn_bruteforce(ds, query_ids=list(range(10)), k=3))
    approx = to_pdf(knn_ivf_pq(
        ray.data.from_pandas(df), query_ids=list(range(10)), k=3,
        n_clusters=8, nprobe=4, m=8, n_codes=32))
    # the planted near-identical neighbors survive PQ compression
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall
    # scores are PQ approximations of true cosines: close, not equal
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"])
    assert np.abs(merged.cosine_pq - merged.cosine).max() < 0.2


def test_label_separability_matches_bruteforce_pairs():
    """The |S|^2 - T combiner identity == literal pairwise mean cosine."""
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.similarity import label_separability

    rng = np.random.default_rng(7)
    rows, expected = [], {}
    for lab, n in [("a", 5), ("b", 2), ("c", 1), ("d", 30)]:
        mat = rng.standard_normal((n, 16))
        for v in mat:
            rows.append({"vec_id": len(rows), "label": lab,
                         "embedding": [float(x) for x in v]})
        u = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        if n > 1:
            cos = u @ u.T
            expected[lab] = (cos.sum() - np.trace(cos)) / (n * (n - 1))
        else:
            expected[lab] = np.nan
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(label_separability(ds)).set_index("label")
    for lab, exp in expected.items():
        got = out.loc[lab, "mean_intra_cosine"]
        if np.isnan(exp):
            assert np.isnan(got)
        else:
            assert abs(got - exp) < 1e-9, (lab, got, exp)
    assert out.loc["d", "n_vectors"] == 30


def test_dim_moments_matches_numpy():
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.similarity import dim_moments

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((200, 8)) * np.arange(1, 9)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"embedding": [[float(x) for x in v] for v in mat]}))
    out = to_pdf(dim_moments(ds)).sort_values("dim")
    assert list(out.dim) == list(range(1, 9))
    np.testing.assert_allclose(out["mean"], mat.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(out["variance"], mat.var(axis=0, ddof=1),
                               rtol=1e-12)


def test_als_recovers_planted_block_structure():
    import numpy as np
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.similarity import als_factorize

    # two taste groups over four items: A-users rate {x, y} = 5,
    # B-users rate {z, w} = 5; no cross ratings (implicit 0)
    rows_u, rows_i, rows_r = [], [], []
    for u in range(20):
        items = ["x", "y"] if u % 2 == 0 else ["z", "w"]
        for it in items:
            rows_u.append(u)
            rows_i.append(it)
            rows_r.append(5.0)
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "item": pa.array(rows_i, pa.string()),
        "r": pa.array(rows_r, pa.float64())}))
    uf, vf = als_factorize(ds, user_col="user_id", item_col="item",
                           rating_col="r", rank=2, n_iter=12)
    u = uf.to_pandas().set_index("user_id").sort_index()
    v = vf.set_index("item")
    fu = u[[c for c in u.columns]].to_numpy()
    fv = v[[c for c in v.columns]].to_numpy()
    items = list(v.index)
    pred = fu @ fv.T  # users × items reconstruction
    xi, zi = items.index("x"), items.index("z")
    # group-A users prefer x over z; group-B the reverse — every user
    a_pref = pred[0::2, xi] - pred[0::2, zi]
    b_pref = pred[1::2, zi] - pred[1::2, xi]
    assert (a_pref > 1.0).all() and (b_pref > 1.0).all()
    # in-block reconstruction lands near the planted 5
    assert abs(float(pred[0, xi]) - 5.0) < 1.0
    assert abs(float(pred[1, zi]) - 5.0) < 1.0


def test_als_empty_items():
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.similarity import als_factorize

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "item": pa.array([], pa.string()),
        "r": pa.array([], pa.float64())}))
    uf, vf = als_factorize(ds, user_col="user_id", item_col="item",
                           rating_col="r", rank=2, n_iter=2)
    assert len(uf.to_pandas()) == 0 and len(vf) == 0
