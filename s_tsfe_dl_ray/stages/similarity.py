"""Similarity search over embedding columns (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k per query — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read in every actor),
  per-batch partial top-k, tiny final merge.  The baseline.
- ``knn_ivf``: IVF-bucketed approximate variant — deterministic k-means
  centroids, cluster assignment per batch, queries probe the ``nprobe``
  nearest clusters only.  The scale path: search cost drops by
  ~n_clusters/nprobe.
- ``embedding_neardup_pairs``: exact cosine near-duplicate pairs vs a
  broadcast matrix (small-side pattern; the LSH analog for >memory
  corpora is ``stages.dedup``).

Reference analog: trained-model batch scoring — weights loaded once per
worker, pure vectorized inference per batch (test_keras.py:66
``model.predict``; SURVEY.md §2.3 "load-once-score-many").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _stack_embeddings(batch: pd.DataFrame, col: str) -> np.ndarray:
    return np.stack(batch[col].to_numpy()).astype(np.float64)


def _partial_topk(row: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k values INCLUDING everything tied with the k-th.

    Plain ``argpartition(...)[:k]`` keeps an arbitrary subset of the
    candidates tied at the k-boundary, which can discard a tied neighbor
    with a smaller id inside a batch before the final merge applies the
    documented smaller-id tie rule.  Keeping the whole tie class makes the
    partial top-k merge-safe (the final sort still emits exactly k rows).
    """
    if k >= len(row):
        return np.arange(len(row))
    part = np.argpartition(-row, k - 1)[:k]
    kth = row[part].min()
    return np.flatnonzero(row >= kth)


class _KnnScorer:
    """Actor: holds the normalized query matrix (fetched once from the
    object store in ``__init__``); emits per-batch partial top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        import ray

        self.qids, qmat = ray.get(queries_ref)
        self.qmat = _l2_normalize(qmat)  # (Q, D)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _l2_normalize(_stack_embeddings(batch, self.emb_col))  # (B, D)
        ids = batch[self.id_col].to_numpy()
        cos = self.qmat @ mat.T  # (Q, B)
        out_q, out_n, out_c = [], [], []
        k = min(self.k + 1, cos.shape[1])  # +1 so self can be dropped later
        for qi, qid in enumerate(self.qids):
            row = cos[qi]
            idx = _partial_topk(row, k)
            out_q.extend([qid] * len(idx))
            out_n.extend(ids[idx])
            out_c.extend(row[idx])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})


def knn_bruteforce(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: list[int] | None = None,
    n_queries: int = 10,
    k: int = 10,
    concurrency: int | tuple[int, int] = (1, 16),
    source_path: str | None = None,
) -> Dataset:
    """Exact cosine top-k neighbors for each query vector.

    Queries default to the ``n_queries`` smallest ids (deterministic).
    Self-matches are excluded.  Ties break on smaller neighbor_id
    (same rule the SQL oracle uses).

    ``source_path``: when given with ``query_ids``, the query rows are
    fetched by a direct predicate-pushdown parquet read (row-group
    pruned, no Ray pass) instead of a full ``map_batches`` filter scan
    over the corpus — the whole pipeline then makes exactly ONE
    distributed pass over the corpus (the scoring pass).
    """
    import pyarrow.compute as pc
    import ray

    sel = ds.select_columns([id_col, emb_col])
    if query_ids is not None and source_path is not None:
        import pyarrow.parquet as pq

        qdf_q = pq.read_table(
            source_path, columns=[id_col, emb_col],
            filters=[(id_col, "in", list(query_ids))],
        ).to_pandas().sort_values(id_col)
    elif query_ids is not None:
        # materialize ONLY the query rows (vectorized semi-filter)
        qarr = pa.array(list(query_ids))
        qdf_q = sel.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=qarr)),
            batch_format="pyarrow",
        ).to_pandas().sort_values(id_col)
    else:
        # deterministic default: first rows in storage order (parquet written
        # sorted by id); pass explicit query_ids when that doesn't hold
        qdf_q = sel.limit(n_queries).to_pandas().sort_values(id_col)
    queries_ref = ray.put(
        (qdf_q[id_col].to_numpy(), _stack_embeddings(qdf_q, emb_col))
    )
    partials = ds.map_batches(
        _KnnScorer,
        fn_constructor_kwargs={
            "queries_ref": queries_ref, "k": k, "id_col": id_col, "emb_col": emb_col,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.query_id != g.neighbor_id]
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return partials.groupby("query_id").map_groups(topk_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant
# ---------------------------------------------------------------------------


def _kmeans_fit(mat: np.ndarray, n_clusters: int, iters: int = 10) -> np.ndarray:
    """Deterministic k-means on normalized vectors: init = first
    ``n_clusters`` rows (by id order), fixed iteration count."""
    cent = mat[:n_clusters].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _l2_normalize(cent)
    return cent


class _IvfScorer:
    """Actor: centroids + query matrix broadcast once; per batch, score
    queries only against rows whose cluster is probed by that query."""

    def __init__(self, state_ref, k: int, id_col: str, emb_col: str, nprobe: int):
        import ray

        self.qids, qmat, self.cent = ray.get(state_ref)
        self.qmat = _l2_normalize(qmat)
        # (Q, nprobe) probed cluster ids per query
        sims = self.qmat @ self.cent.T
        self.probes = np.argsort(-sims, axis=1)[:, :nprobe]
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _l2_normalize(_stack_embeddings(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy()
        assign = (mat @ self.cent.T).argmax(axis=1)  # cluster per row
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            row = self.qmat[qi] @ mat[mask].T
            sub_ids = ids[mask]
            k = min(self.k + 1, len(row))
            idx = _partial_topk(row, k)
            out_q.extend([qid] * len(idx))
            out_n.extend(sub_ids[idx])
            out_c.extend(row[idx])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})


def knn_ivf(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: list[int] | None = None,
    n_queries: int = 10,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    concurrency: int | tuple[int, int] = (1, 16),
    source_path: str | None = None,
) -> Dataset:
    """Approximate cosine top-k via IVF cluster probing.

    Centroids are fit driver-side on a bounded ``random_sample`` of the
    corpus (never the full table — the sample size is ~50 rows per
    cluster regardless of corpus size); cluster assignment happens
    distributed inside each scoring actor.  Recall vs brute force is
    tested, not assumed.
    """
    import ray

    sel = ds.select_columns([id_col, emb_col])
    # bounded, seeded sample for k-means; corpus count via parquet metadata
    target = max(50 * n_clusters, 4 * n_clusters)
    cnt = sel.count()
    frac = min(1.0, target / max(cnt, 1))
    sample = (
        sel.random_sample(frac, seed=42).to_pandas()
        if frac < 1.0 else sel.to_pandas()
    ).sort_values(id_col)
    if len(sample) < n_clusters:  # random_sample undershoot on tiny inputs
        # distributed sort+limit: the same smallest-id rows, bounded
        # driver pull on EVERY path (the emb_index_job fix, VERDICT r4 #2)
        sample = (sel.sort(id_col).limit(int(max(n_clusters, target)))
                  .to_pandas().sort_values(id_col))
    mat = _l2_normalize(_stack_embeddings(sample, emb_col))
    cent = _kmeans_fit(mat, n_clusters)
    # queries: explicit query_ids (optionally via predicate-pushdown read
    # when source_path is given) beat the storage-order default, which
    # silently changes the evaluated set if the parquet isn't id-sorted
    if query_ids is not None and source_path is not None:
        import pyarrow.parquet as pq

        q = pq.read_table(
            source_path, columns=[id_col, emb_col],
            filters=[(id_col, "in", list(query_ids))],
        ).to_pandas().sort_values(id_col)
    elif query_ids is not None:
        import pyarrow.compute as pc

        qarr = pa.array(list(query_ids))
        q = sel.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=qarr)),
            batch_format="pyarrow",
        ).to_pandas().sort_values(id_col)
    else:
        # deterministic default: first rows in storage order (parquet
        # written sorted by id)
        q = sel.limit(n_queries).to_pandas().sort_values(id_col)
    state_ref = ray.put((q[id_col].to_numpy(), _stack_embeddings(q, emb_col), cent))
    partials = ds.map_batches(
        _IvfScorer,
        fn_constructor_kwargs={
            "state_ref": state_ref, "k": k, "id_col": id_col,
            "emb_col": emb_col, "nprobe": nprobe,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.query_id != g.neighbor_id]
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return partials.groupby("query_id").map_groups(topk_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact near-duplicate pairs
# ---------------------------------------------------------------------------


class _NearDupScorer:
    def __init__(self, ref, threshold: float, id_col: str, emb_col: str):
        import ray

        self.all_ids, amat = ray.get(ref)
        self.amat = _l2_normalize(amat)
        self.threshold = threshold
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _l2_normalize(_stack_embeddings(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy()
        cos = mat @ self.amat.T  # (B, N)
        bi, ni = np.nonzero(cos >= self.threshold)
        a = ids[bi]
        b = self.all_ids[ni]
        keep = a < b  # dedupe (a,b)/(b,a) and self
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep], "cosine": cos[bi, ni][keep]})


def embedding_neardup_pairs(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    concurrency: int | tuple[int, int] = (1, 16),
    chunk_rows: int = 65_536,
    exact_max_rows: int | None = 262_144,
) -> Dataset:
    """All pairs with cosine ≥ threshold (exact, block-nested-loop).

    Size guard (VERDICT r3 #8): above ``exact_max_rows`` the quadratic
    block-nested loop is the wrong tool, and the call routes itself
    through :func:`embedding_neardup_lsh` — banded random projections →
    partitioned collision pairs → EXACT cosine verify (so false positives
    never survive; recall ≥99.6% at threshold 0.9 with the default band
    layout).  One code path selected by corpus size; pass
    ``exact_max_rows=None`` to force the exact path at any size (the
    oracle twin).

    The right side is broadcast ONE BOUNDED CHUNK at a time (streamed off
    the dataset via ``iter_batches``): each chunk pass executes EAGERLY
    (materialized pair outputs are tiny) and its broadcast ref is
    released before the next chunk is put, so the object store holds one
    chunk + the surviving pairs at any moment — never the full matrix.
    ``a < b`` keeps each unordered pair exactly once because the chunks
    partition the corpus.  Quadratic compare work — and one full corpus
    scan per chunk, the classic block-nested-loop — is inherent to the
    exact op (the sub-quadratic scale route is the banded LSH in
    ``stages.dedup``); this layout makes the MEMORY footprint scale-safe:
    O(batch × chunk) per actor.
    """
    import ray

    sel = ds.select_columns([id_col, emb_col])
    if exact_max_rows is not None and sel.count() > exact_max_rows:
        return embedding_neardup_lsh(
            ds, id_col=id_col, emb_col=emb_col, threshold=threshold,
            concurrency=concurrency,
        )
    parts: list[Dataset] = []
    for chunk in sel.iter_batches(batch_size=chunk_rows, batch_format="pandas"):
        ref = ray.put((chunk[id_col].to_numpy(), _stack_embeddings(chunk, emb_col)))
        part = ds.map_batches(
            _NearDupScorer,
            fn_constructor_kwargs={
                "ref": ref, "threshold": threshold, "id_col": id_col, "emb_col": emb_col,
            },
            batch_format="pandas",
            concurrency=concurrency,
        ).materialize()  # eager: chunk ref freed before the next ray.put
        del ref
        parts.append(part)
    if not parts:  # empty corpus → empty, correctly-typed pair table
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }))
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


# ---------------------------------------------------------------------------
# banded random-projection near-dup (the production-scale route)
# ---------------------------------------------------------------------------


class _RPSigner:
    """Actor: random-hyperplane (SimHash-for-vectors) band signer.

    ``bands × rows_per_band`` seeded hyperplanes are built once per actor
    on the first batch (dimension discovered from the data); each vector's
    sign pattern packs into one integer key per band.  Two vectors at
    angle θ agree on one hyperplane with probability 1−θ/π, so a band of
    ``r`` rows collides with (1−θ/π)^r — at threshold 0.9 (θ≈26°) the
    default 16×8 layout catches a true pair with ≥99.6% probability.
    """

    def __init__(self, id_col: str, emb_col: str, bands: int, rows_per_band: int,
                 seed: int):
        self.id_col = id_col
        self.emb_col = emb_col
        self.bands = bands
        self.r = rows_per_band
        self.seed = seed
        self.H: np.ndarray | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _l2_normalize(_stack_embeddings(batch, self.emb_col))
        if self.H is None:
            rng = np.random.default_rng(self.seed)
            self.H = rng.standard_normal((self.bands * self.r, mat.shape[1]))
        bits = (mat @ self.H.T) > 0  # (B, bands*r)
        keys = np.zeros((len(batch), self.bands), dtype=np.int64)
        for j in range(self.r):
            keys = (keys << 1) | bits[:, j::self.r][:, : self.bands]
        n = len(batch)
        return pd.DataFrame({
            "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n),
            "band_key": keys.reshape(-1),
            self.id_col: np.repeat(batch[self.id_col].to_numpy(), self.bands),
        })


def embedding_neardup_lsh(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 16,
    rows_per_band: int = 8,
    seed: int = 42,
    concurrency: int | tuple[int, int] = (1, 16),
    num_partitions: int = 64,
) -> Dataset:
    """Near-duplicate pairs (cosine ≥ threshold) via banded random
    projections — the sub-quadratic production route.

    Dataflow: sign each vector against ``bands × rows_per_band`` seeded
    hyperplanes (actor pool, hyperplanes built once per actor) → explode
    to (band_id, band_key, id) rows → partitioned collision-pair
    expansion (``stages.dedup._collision_pairs``) → fetch BOTH vectors of
    each candidate through the fully partitioned two-sided join
    (``_pair_side_join``; vectors travel as float64 blobs because Acero
    joins can't carry list columns) → exact cosine verify.  No broadcast,
    no driver hop, no corpus re-scan — total cost is one signing pass +
    shuffles proportional to corpus + candidates, vs the block-nested
    loop's O(N²/chunk) scans in :func:`embedding_neardup_pairs` (kept as
    the exact/oracle path).

    Probabilistic recall: a true pair is missed only if every band
    disagrees — P(miss) = (1−(1−θ/π)^r)^bands; tune ``bands`` up (or
    ``rows_per_band`` down) for lower thresholds.  Verification is exact,
    so false positives never survive.
    """
    from .dedup import _collision_pairs, _pair_side_join

    sel = ds.select_columns([id_col, emb_col])
    banded = sel.map_batches(
        _RPSigner,
        fn_constructor_kwargs={
            "id_col": id_col, "emb_col": emb_col, "bands": bands,
            "rows_per_band": rows_per_band, "seed": seed,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )
    cands = _collision_pairs(
        banded, id_col=id_col, bucket_cols=["band_id", "band_key"],
        num_partitions=num_partitions,
    )

    def to_blob(b: pd.DataFrame) -> pa.Table:
        # typed arrow output: a pandas object column of bytes would be
        # schema-inferred as string and fail UTF8 validation downstream
        mat = _l2_normalize(_stack_embeddings(b, emb_col))
        return pa.table({
            id_col: pa.array(b[id_col].to_numpy()),
            "emb_bin": pa.array([row.tobytes() for row in mat], pa.binary()),
        })

    side = sel.map_batches(to_blob, batch_format="pandas")
    # materialize the candidate pairs: _pair_side_join's pairs.schema()
    # probe would otherwise re-execute the entire sign/collide chain a
    # second time (the minhash fix); the side schema is known statically
    from .dedup import _as_arrow_schema

    id_type = _as_arrow_schema(sel).field(id_col).type
    withvecs = _pair_side_join(
        cands.materialize(), side, id_col=id_col, value_cols=["emb_bin"],
        num_partitions=num_partitions,
        side_schema=pa.schema([(id_col, id_type),
                               ("emb_bin", pa.binary())]),
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        a = np.stack([np.frombuffer(x, dtype=np.float64) for x in b["emb_bin_a"]])
        c = np.stack([np.frombuffer(x, dtype=np.float64) for x in b["emb_bin_b"]])
        cos = np.einsum("ij,ij->i", a, c)
        out = pd.DataFrame({"id_a": b["id_a"].to_numpy(),
                            "id_b": b["id_b"].to_numpy(), "cosine": cos})
        return out[out["cosine"] >= threshold]

    return withvecs.map_batches(verify, batch_format="pandas")


def label_centroids(
    ds: Dataset,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    num_partitions: int = 16,
) -> Dataset:
    """Per-label element-wise mean of an embedding column (class
    centroids — the fit step of a nearest-centroid classifier and the
    exact analog of one k-means update over given assignments, cf. the
    sampled `_kmeans_fit` above).

    Combiner discipline for vector aggregates: each batch reduces to one
    (label, dim, partial_sum, n) LONG row per label×dimension — labels ×
    dims rows regardless of batch size — so the exchange carries sketch-
    sized partials, never embeddings.  Long output keeps the op
    SQL-checkable (`avg(embedding[dim])` per label).  ``dim`` is 1-based
    to match SQL list indexing.
    """
    from .rollup import _stable_pkey

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                label_col: pa.array([], t[label_col].type),
                "dim": pa.array([], pa.int64()),
                "_s": pa.array([], pa.float64()),
                "_n": pa.array([], pa.int64()),
                "_pkey": pa.array([], pa.int64()),
            })
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        assert len(flat) == t.num_rows * d, "ragged embedding lengths"
        mat = flat.reshape(t.num_rows, d)
        labs = t[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        out = pa.table({
            label_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
            "_s": pa.array(sums.ravel()),
            "_n": pa.array(np.repeat(counts, d)),
        })
        return out.append_column("_pkey", _stable_pkey(out[label_col], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([label_col, "dim"], sort=False).agg(
            _s=("_s", "sum"), _n=("_n", "sum")
        ).reset_index()
        g["centroid"] = g["_s"] / g["_n"]
        g = g.rename(columns={"_n": "n_vectors"})
        return g[[label_col, "dim", "n_vectors", "centroid"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def pca_fit_transform(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 2,
    num_partitions: int = 16,
) -> Dataset:
    """Exact distributed PCA over an embedding column: fit the principal
    axes from the full covariance, project every vector onto the top
    ``n_components``.  The dimensionality-reduction front door of
    embedding analytics (visualization, cheap ANN pre-filtering,
    whitening) — the engine's linear sibling of the reference's
    autoencoder bottleneck (reference TSFEDL/models_keras.py:1055-1091
    encode/decode compression).

    Two passes, both combiner-shaped:

    1. FIT: each batch reduces to d + d² + 1 raw moments (mean vector,
       XᵀX, count) carried as ONE long (i, j, v) partial table —
       vectorized matmul per batch, merged by a tiny single-partition
       sum; the d×d eigendecomposition runs once on the driver (µs for
       embedding-sized d) and the component matrix broadcasts back in
       the scoring closure.
    2. TRANSFORM: one vectorized ``(X − µ) @ W`` per batch.

    Determinism: eigenvectors have a sign ambiguity — each component is
    flipped so its largest-|weight| element is positive, making scores
    reproducible across runs/blockings.  Output: ``id_col, pc1..pcK``
    (float64).  No SQL twin (eigendecomposition); tests pin variance
    ordering, orthogonality, and blocking invariance.
    """
    if n_components < 1:
        raise ValueError("n_components must be >= 1")

    def moments(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        x = flat.reshape(t.num_rows, d)
        m = x.T @ x                       # d×d
        s = x.sum(axis=0)                 # d
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        rows_i = np.concatenate([ii.ravel(), np.arange(d), [-1]])
        rows_j = np.concatenate([jj.ravel(), np.full(d, -1), [-1]])
        vals = np.concatenate([m.ravel(), s, [float(t.num_rows)]])
        return pa.table({"_i": pa.array(rows_i, pa.int64()),
                         "_j": pa.array(rows_j, pa.int64()),
                         "_v": pa.array(vals)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["_i", "_j"], sort=True)["_v"].sum().reset_index()

    stats = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .take_all()  # d² + d + 1 tiny rows — the broadcast small side
    )
    n = next(r["_v"] for r in stats if r["_i"] == -1)
    d = max(r["_i"] for r in stats) + 1
    s = np.zeros(d)
    m = np.zeros((d, d))
    for r in stats:
        if r["_i"] == -1:
            continue
        if r["_j"] == -1:
            s[r["_i"]] = r["_v"]
        else:
            m[r["_i"], r["_j"]] = r["_v"]
    mu = s / n
    cov = (m - np.outer(s, mu)) / max(n - 1.0, 1.0)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    w = evecs[:, order]
    # deterministic sign: largest-|weight| element of each axis positive
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    w = w * flip

    def transform(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(t.num_rows, len(mu))
        scores = (x - mu) @ w
        cols = {id_col: t[id_col]}
        for k in range(n_components):
            cols[f"pc{k + 1}"] = pa.array(scores[:, k])
        return pa.table(cols)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_lloyd(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 5,
    cluster_col: str = "cluster",
    sample_size: int | None = None,
) -> Dataset:
    """Full-corpus Lloyd k-means (Euclidean): the iterative-algorithm
    class done Ray-Data-style — each iteration is ONE combiner pass over
    the corpus (assignment to broadcast centroids fused with the
    per-cluster (sum, n) reduction inside the same batch kernel), the
    tiny k×d centroid table updates on the driver, and a final pass
    emits assignments.  The exact full-data big sibling of the bounded-
    sample ``_kmeans_fit`` the IVF index uses; reference analog: the
    two-phase fit-then-apply training loop (reference
    experiments/arrythmia_experiment.py:92-99 fit → predict).

    Determinism: init = the ``n_clusters`` vectors with the smallest
    ids from a seeded bounded sample (corpus-size-independent);
    empty clusters keep their previous centroid; ties in assignment
    break toward the lower cluster index (argmin).  n_iter passes +
    one assignment pass; at petabyte scale checkpoint the (tiny)
    centroid state between iterations rather than rereading — the
    per-iteration dataflow is unchanged.

    Output: ``id_col, cluster_col (int64)``.  No SQL twin (iterative);
    tests pin monotone inertia, blocking invariance, and planted-
    cluster recovery.
    """
    cent = _lloyd_fit(ds, id_col=id_col, vec_col=vec_col,
                      n_clusters=n_clusters, n_iter=n_iter,
                      sample_size=sample_size)
    c = cent
    c2 = (c * c).sum(axis=1)
    d = c.shape[1]

    def final_assign(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        x = (vecs.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(t.num_rows, d))
        a = (c2[None, :] - 2.0 * (x @ c.T)).argmin(axis=1)
        return pa.table({id_col: t[id_col],
                         cluster_col: pa.array(a.astype(np.int64))})

    return ds.map_batches(final_assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def _lloyd_fit(
    ds: Dataset,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    n_iter: int,
    sample_size: int | None,
) -> np.ndarray:
    """The deterministic bounded-init Lloyd fit loop shared by
    :func:`kmeans_lloyd` and :func:`kmeans_silhouette` — returns the
    k×d centroid array (tiny, driver-resident)."""
    if n_clusters < 1 or n_iter < 1:
        raise ValueError("n_clusters and n_iter must be >= 1")
    sample_size = sample_size or max(50 * n_clusters, 500)

    # deterministic bounded init (the knn_ivf pattern): smallest-id rows
    # of a seeded fractional sample, NOT the whole corpus
    sel = ds.select_columns([id_col, vec_col])
    cnt = sel.count()
    frac = min(1.0, sample_size / max(cnt, 1))
    sample = (
        sel.random_sample(frac, seed=0).to_pandas()
        if frac < 1.0 else sel.to_pandas()
    ).sort_values(id_col)
    if len(sample) < n_clusters:  # random_sample undershoot on tiny inputs
        # distributed sort+limit: identical smallest-id init rows with a
        # bounded driver pull (the emb_index_job fix, VERDICT r4 #2)
        sample = (sel.sort(id_col).limit(int(n_clusters))
                  .to_pandas().sort_values(id_col))
    cent = np.stack(sample[vec_col].head(n_clusters).to_numpy()).astype(np.float64)
    d = cent.shape[1]

    def iter_pass(centroids: np.ndarray):
        c = centroids.copy()
        c2 = (c * c).sum(axis=1)

        def assign_reduce(t: pa.Table) -> pa.Table:
            vecs = t[vec_col].combine_chunks()
            x = (vecs.flatten().to_numpy(zero_copy_only=False)
                 .astype(np.float64).reshape(t.num_rows, d))
            # argmin ||x - c||² = argmin (c² - 2 x·c); ties -> lower index
            a = (c2[None, :] - 2.0 * (x @ c.T)).argmin(axis=1)
            sums = np.zeros((n_clusters, d))
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=n_clusters).astype(np.float64)
            ii = np.repeat(np.arange(n_clusters), d)
            return pa.table({
                "_c": pa.array(np.concatenate([ii, np.arange(n_clusters)]),
                               pa.int64()),
                "_dim": pa.array(np.concatenate(
                    [np.tile(np.arange(d), n_clusters),
                     np.full(n_clusters, -1)]), pa.int64()),
                "_v": pa.array(np.concatenate([sums.ravel(), cnt])),
            })

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["_c", "_dim"], sort=True)["_v"].sum().reset_index()

        rows = (
            ds.map_batches(assign_reduce, batch_format="pyarrow",
                           zero_copy_batch=True)
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None)
            .take_all()  # k×(d+1) tiny rows
        )
        sums = np.zeros((n_clusters, d))
        cnt = np.zeros(n_clusters)
        for r in rows:
            if r["_dim"] == -1:
                cnt[r["_c"]] = r["_v"]
            else:
                sums[r["_c"], r["_dim"]] = r["_v"]
        new = centroids.copy()
        nonempty = cnt > 0
        new[nonempty] = sums[nonempty] / cnt[nonempty, None]
        return new

    for _ in range(n_iter):
        cent = iter_pass(cent)
    return cent


def kmeans_silhouette(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    n_iter: int = 5,
    sample_size: int | None = None,
) -> Dataset:
    """Per-cluster SIMPLIFIED silhouette of the Lloyd fit — the
    clustering-quality gate a 100 TB embedding pipeline runs before
    trusting k-means buckets (IVF lists, dedup blocks).  Simplified
    silhouette uses centroid distances instead of all-pairs member
    distances (the classic variant is O(N²)): per vector,
    ``a`` = distance to its own centroid, ``b`` = distance to the
    nearest OTHER centroid, ``s = (b − a) / max(a, b)`` (1 = compact
    and far from neighbors, <0 = likely misassigned).

    One extra combiner pass after the shared :func:`_lloyd_fit`
    (broadcast k×d centroids, per-batch (cluster, n, Σs) partials, tiny
    k-row fold).  No SQL twin (iterative fit); tests pin planted
    well-separated recovery ≈ 1 and an overlapping-blob degradation.

    Output: ``cluster (int64), n_vecs (int64), mean_silhouette
    (float64)``, one row per non-empty cluster.
    """
    if n_clusters < 2:
        raise ValueError("silhouette needs n_clusters >= 2")
    cent = _lloyd_fit(ds, id_col=id_col, vec_col=vec_col,
                      n_clusters=n_clusters, n_iter=n_iter,
                      sample_size=sample_size)
    c = cent
    d = c.shape[1]

    def score_reduce(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        x = (vecs.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(t.num_rows, d))
        # full distance matrix to the (tiny) centroid set
        d2 = ((x * x).sum(axis=1)[:, None]
              + (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T))
        np.maximum(d2, 0.0, out=d2)
        assign = d2.argmin(axis=1)
        rows = np.arange(len(x))
        a = np.sqrt(d2[rows, assign])
        d2[rows, assign] = np.inf
        b = np.sqrt(d2.min(axis=1))
        denom = np.maximum(a, b)
        s = np.where(denom > 0, (b - a) / np.where(denom > 0, denom, 1.0), 0.0)
        n = np.bincount(assign, minlength=n_clusters).astype(np.int64)
        ssum = np.bincount(assign, weights=s, minlength=n_clusters)
        return pa.table({
            "_c": pa.array(np.arange(n_clusters, dtype=np.int64)),
            "_n": pa.array(n),
            "_s": pa.array(ssum),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_c", sort=True)[["_n", "_s"]].sum().reset_index()
        g = g[g["_n"] > 0]
        return pd.DataFrame({
            "cluster": g["_c"].astype(np.int64),
            "n_vecs": g["_n"].astype(np.int64),
            "mean_silhouette": g["_s"].to_numpy() / g["_n"].to_numpy(),
        })

    return (
        ds.map_batches(score_reduce, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def cosine_to_centroid(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cos_centroid",
) -> Dataset:
    """Cosine similarity of every vector to the corpus MEAN vector — the
    cheapest global "how typical is this embedding" score (outliers →
    low similarity), the single-centroid degenerate case of the k-means
    assignment pass and the first filter of embedding-quality triage.

    Two passes, both combiner-shaped (same discipline as
    :func:`pca_fit_transform`): (1) FIT — each batch reduces to a d+1
    moment row-set (Σx per dim + count), merged in one tiny final
    partition and broadcast via closure; (2) SCORE — one vectorized
    matvec + row-norm per batch.  All math in float64 (float32 inputs
    cast exactly), matching the SQL twin's DOUBLE arithmetic.  Zero
    vectors (or a zero centroid) give NULL, mirroring SQL x/0.
    Output: ``id_col, out_col``.
    """

    def moments(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        x = flat.reshape(t.num_rows, d)
        return pa.table({"_i": pa.array(
            np.concatenate([np.arange(d), [-1]]).astype(np.int64)),
            "_v": pa.array(np.concatenate([x.sum(axis=0), [float(t.num_rows)]]))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("_i", sort=True)["_v"].sum().reset_index()

    stats = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .take_all()  # d + 1 tiny rows — the broadcast small side
    )
    n = next(r["_v"] for r in stats if r["_i"] == -1)
    d = sum(1 for r in stats if r["_i"] >= 0)
    c = np.zeros(d)
    for r in stats:
        if r["_i"] >= 0:
            c[r["_i"]] = r["_v"]
    c = c / n
    norm_c = float(np.sqrt(np.dot(c, c)))

    def score(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(t.num_rows, d)
        dot = x @ c
        norms = np.sqrt((x * x).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot / (norms * norm_c)
        cos = np.where(np.isfinite(cos), cos, np.nan)
        return pa.table({id_col: t[id_col], out_col: pa.array(cos)})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def centroid_similarity(
    ds: Dataset,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    num_partitions: int = 16,
) -> Dataset:
    """Pairwise cosine similarity between per-label centroids — the
    class-confusability matrix (which clusters sit close in embedding
    space), the standard diagnostic before nearest-centroid routing or
    coarse quantization.

    Rides :func:`label_centroids` (labels×dims long partials; raw
    embeddings never shuffled); the |labels|²-sized pairwise step runs
    in a single final partition, which is scale-safe because label
    cardinality — unlike corpus size — is small and fixed.
    Output: ``label_a, label_b, cosine`` for label_a < label_b.
    """
    cents = label_centroids(ds, label_col=label_col, vec_col=vec_col,
                            num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"label_a": [], "label_b": [],
                                 "cosine": []})
        piv = df.pivot(index=label_col, columns="dim", values="centroid") \
                .sort_index()
        mat = piv[sorted(piv.columns)].to_numpy(dtype=np.float64)
        labs = piv.index.to_numpy()
        norms = np.sqrt((mat * mat).sum(axis=1))
        sim = (mat @ mat.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(labs), k=1)
        return pd.DataFrame({
            "label_a": labs[iu[0]], "label_b": labs[iu[1]],
            "cosine": sim[iu],
        })

    return cents.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def quantize_error(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
    num_partitions: int = 1,
) -> Dataset:
    """Per-vector reconstruction error of uint8 MIN-MAX quantization —
    the storage decision every ANN index makes at 100 TB (4×
    compression of the embedding store vs how much cosine structure it
    costs).  Per dimension: ``q = round_half_up((x−mn)/(mx−mn)·L)``,
    ``recon = mn + q·(mx−mn)/L``; constant dimensions reconstruct
    exactly.

    Two combiner passes (the :func:`pca_fit_transform` discipline):
    FIT folds per-batch per-dim min/max partials into a tiny d-row
    table broadcast via closure; SCORE is one vectorized
    quantize→reconstruct→error per batch, no shuffle.  Errors are
    reported ×1e6 (``mse_e6``) so the 6-decimal driver rounding keeps
    ~7 significant digits of an inherently ~1e-6-magnitude number.
    Rounding is half-AWAY-FROM-ZERO (np.floor(v+0.5) on the
    nonnegative scale) to match SQL ``round``, not banker's.
    Output: ``id_col, mse_e6``.
    """
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def minmax(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        x = flat.reshape(t.num_rows, d)
        dim = np.arange(d, dtype=np.int64)
        return pa.table({"dim": pa.array(dim),
                         "mn": pa.array(x.min(axis=0)),
                         "mx": pa.array(x.max(axis=0))})

    mm = _grouped_min(
        ds.map_batches(minmax, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["dim"], agg_cols=[("mn", "min"), ("mx", "max")],
        pkey_col="dim", num_partitions=num_partitions).take_all()
    d = len(mm)
    mn = np.empty(d)
    mx = np.empty(d)
    for row in mm:
        mn[int(row["dim"])] = row["mn"]
        mx[int(row["dim"])] = row["mx"]
    rng = mx - mn
    ok = rng > 0.0

    def score(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(t.num_rows, d)
        scaled = np.where(ok, (x - mn) / np.where(ok, rng, 1.0) * levels, 0.0)
        q = np.floor(scaled + 0.5)
        recon = np.where(ok, mn + q * (rng / levels), mn + np.zeros_like(x))
        err = x - recon
        mse = (err * err).mean(axis=1) * 1e6
        return pa.table({id_col: t[id_col], "mse_e6": pa.array(mse)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def norm_stats(
    ds: Dataset,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> Dataset:
    """Per-label L2-norm profile of the embedding column — the first
    sanity gate on an embedding store (un-normalized vectors silently
    break cosine ANN; a label whose norms drift is a bad encoder batch).

    One combiner pass: per-batch per-label ``(n, Σ‖x‖, min, max)``
    partials (norms in float64, numpy sequential 64-dim sums == the SQL
    twin's per-vector sum order), tiny label-row fold.
    Output: ``label, n_vecs (int64), norm_mean, norm_min, norm_max``.
    """

    def partial(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        d = len(vecs[0])
        x = (vecs.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(t.num_rows, d))
        nrm = np.sqrt((x * x).sum(axis=1))
        base = pa.table({label_col: t[label_col], "_n": nrm})
        out = base.group_by([label_col], use_threads=False).aggregate(
            [("_n", "count"), ("_n", "sum"), ("_n", "min"), ("_n", "max")]
        )
        return out.rename_columns([label_col, "_c", "_s", "_mn", "_mx"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(label_col, sort=True).agg(
            _c=("_c", "sum"), _s=("_s", "sum"),
            _mn=("_mn", "min"), _mx=("_mx", "max")).reset_index()
        return pd.DataFrame({
            label_col: g[label_col],
            "n_vecs": g["_c"].astype(np.int64),
            "norm_mean": g["_s"].to_numpy() / g["_c"].to_numpy(),
            "norm_min": g["_mn"],
            "norm_max": g["_mx"],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def pq_distortion(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    n_iter: int = 10,
    sample_size: int = 2000,
) -> Dataset:
    """Product-quantization reconstruction error per vector — the OTHER
    embedding-store compression audit (:func:`quantize_error` is the
    scalar path): split each d-dim vector into ``m`` subvectors, learn a
    ``n_codes``-entry codebook per subspace, reconstruct from the
    nearest codes.  PQ at m=8/k=256 is what IVF-PQ indexes ship at
    100 TB (d·4 bytes → m bytes per vector).

    Scale shape (the IVF ``_kmeans_fit`` discipline): codebooks train
    driver-side on a BOUNDED seeded sample (corpus-size-independent,
    deterministic smallest-id init), broadcast via closure; scoring is
    ONE distributed pass — per batch, m small (B×n_codes) distance
    matmuls, no shuffle.  No SQL twin (iterative fit); tests pin
    monotone-in-codes distortion and exact recovery of a planted
    codebook.  Output: ``id_col, pq_mse_e6 (float64)``.
    """
    if m < 1 or n_codes < 1:
        raise ValueError("m and n_codes must be >= 1")

    sel = ds.select_columns([id_col, vec_col])
    cnt = sel.count()
    frac = min(1.0, sample_size / max(cnt, 1))
    sample = (
        sel.random_sample(frac, seed=0).to_pandas()
        if frac < 1.0 else sel.to_pandas()
    ).sort_values(id_col)
    if len(sample) < n_codes:
        # bounded undershoot fallback (the emb_index_job fix): tiny
        # tables return whole-table rows unchanged, big tables cap at
        # the configured sample budget instead of a full driver pull
        sample = (sel.sort(id_col)
                  .limit(int(max(n_codes, sample_size)))
                  .to_pandas().sort_values(id_col))
    smat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    d = smat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m

    def _fit_subspace(x: np.ndarray) -> np.ndarray:
        cent = x[:n_codes].copy()
        for _ in range(n_iter):
            d2 = ((x * x).sum(1)[:, None] + (cent * cent).sum(1)[None, :]
                  - 2.0 * (x @ cent.T))
            a = d2.argmin(axis=1)
            for c in range(n_codes):
                mem = x[a == c]
                if len(mem):
                    cent[c] = mem.mean(axis=0)
        return cent

    books = np.stack([
        _fit_subspace(smat[:, j * sub:(j + 1) * sub]) for j in range(m)
    ])  # (m, n_codes, sub)

    def score(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        x = (vecs.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(t.num_rows, d))
        err = np.zeros(t.num_rows)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            cb = books[j]
            d2 = ((xs * xs).sum(1)[:, None] + (cb * cb).sum(1)[None, :]
                  - 2.0 * (xs @ cb.T))
            a = d2.argmin(axis=1)
            diff = xs - cb[a]
            err += (diff * diff).sum(axis=1)
        return pa.table({id_col: t[id_col],
                         "pq_mse_e6": pa.array(err / d * 1e6)})

    return sel.map_batches(score, batch_format="pyarrow",
                           zero_copy_batch=True)


class _IvfPqScorer:
    """Actor: coarse centroids + per-subspace PQ codebooks + query matrix
    broadcast once; per batch, probed-list rows are scored against their
    PQ RECONSTRUCTION (asymmetric distance by reconstruction — the query
    stays exact, the corpus side is m bytes/vector)."""

    def __init__(self, state_ref, k: int, id_col: str, emb_col: str,
                 nprobe: int):
        import ray

        self.qids, qmat, self.cent, self.books = ray.get(state_ref)
        self.qmat = _l2_normalize(qmat)
        sims = self.qmat @ self.cent.T
        self.probes = np.argsort(-sims, axis=1)[:, :nprobe]
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self.m, self.n_codes, self.sub = self.books.shape

    def _reconstruct(self, x: np.ndarray) -> np.ndarray:
        out = np.empty_like(x)
        for j in range(self.m):
            xs = x[:, j * self.sub:(j + 1) * self.sub]
            cb = self.books[j]
            d2 = ((xs * xs).sum(1)[:, None] + (cb * cb).sum(1)[None, :]
                  - 2.0 * (xs @ cb.T))
            out[:, j * self.sub:(j + 1) * self.sub] = cb[d2.argmin(axis=1)]
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _l2_normalize(_stack_embeddings(batch, self.emb_col))
        ids = batch[self.id_col].to_numpy()
        assign = (mat @ self.cent.T).argmax(axis=1)
        recon = _l2_normalize(self._reconstruct(mat))
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            row = self.qmat[qi] @ recon[mask].T
            sub_ids = ids[mask]
            k = min(self.k + 1, len(row))
            idx = _partial_topk(row, k)
            out_q.extend([qid] * len(idx))
            out_n.extend(sub_ids[idx])
            out_c.extend(row[idx])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "cosine_pq": out_c})


def knn_ivf_pq(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: list[int] | None = None,
    n_queries: int = 10,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 32,
    concurrency: int | tuple[int, int] = (1, 16),
) -> Dataset:
    """IVF-PQ approximate cosine top-k — the last rung of the engine's
    ANN ladder (brute → IVF → IVF-PQ): coarse quantizer prunes the
    corpus to ``nprobe`` lists, product quantization compresses each
    candidate to ``m`` bytes, and scoring runs against the PQ
    reconstruction (asymmetric: the query stays exact).  At 100 TB this
    is what makes the candidate set RAM-resident (d·4 bytes → m per
    vector); scores are approximations, so the output column is
    ``cosine_pq``, not ``cosine`` — recall and score fidelity are
    pinned by tests, never assumed.

    Both codebooks fit driver-side on ONE bounded seeded sample
    (corpus-size-independent, the knn_ivf discipline) and broadcast via
    ``ray.put``; one distributed scoring pass, tiny per-query merge.
    """
    import ray

    sel = ds.select_columns([id_col, emb_col])
    target = max(50 * n_clusters, 4 * n_clusters, 20 * n_codes)
    cnt = sel.count()
    frac = min(1.0, target / max(cnt, 1))
    sample = (
        sel.random_sample(frac, seed=42).to_pandas()
        if frac < 1.0 else sel.to_pandas()
    ).sort_values(id_col)
    if len(sample) < max(n_clusters, n_codes):
        # distributed sort+limit (the emb_index_job fix): same rows,
        # bounded pull
        sample = (sel.sort(id_col)
                  .limit(int(max(n_clusters, n_codes, target)))
                  .to_pandas().sort_values(id_col))
    mat = _l2_normalize(_stack_embeddings(sample, emb_col))
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    cent = _kmeans_fit(mat, n_clusters)
    sub = d // m

    def _fit_book(xs: np.ndarray) -> np.ndarray:
        cb = xs[:min(n_codes, len(xs))].copy()
        if len(cb) < n_codes:  # degenerate tiny sample: pad by repetition
            cb = np.concatenate([cb] * (n_codes // len(cb) + 1))[:n_codes]
        for _ in range(10):
            d2 = ((xs * xs).sum(1)[:, None] + (cb * cb).sum(1)[None, :]
                  - 2.0 * (xs @ cb.T))
            a = d2.argmin(axis=1)
            for c in range(n_codes):
                mem = xs[a == c]
                if len(mem):
                    cb[c] = mem.mean(axis=0)
        return cb

    books = np.stack([
        _fit_book(mat[:, j * sub:(j + 1) * sub]) for j in range(m)
    ])

    if query_ids is not None:
        import pyarrow.compute as pc

        qarr = pa.array(list(query_ids))
        q = sel.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=qarr)),
            batch_format="pyarrow",
        ).to_pandas().sort_values(id_col)
    else:
        q = sel.limit(n_queries).to_pandas().sort_values(id_col)
    state_ref = ray.put((q[id_col].to_numpy(),
                         _stack_embeddings(q, emb_col), cent, books))
    partials = ds.map_batches(
        _IvfPqScorer,
        fn_constructor_kwargs={
            "state_ref": state_ref, "k": k, "id_col": id_col,
            "emb_col": emb_col, "nprobe": nprobe,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    def topk_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.query_id != g.neighbor_id]
        g = g.sort_values(["cosine_pq", "neighbor_id"],
                          ascending=[False, True], kind="mergesort")
        return g.head(k)

    return partials.groupby("query_id").map_groups(
        topk_group, batch_format="pandas")


def dim_moments(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
) -> Dataset:
    """Per-dimension mean and sample variance of the embedding matrix —
    the feature-variance profile that drives dimension pruning /
    whitening decisions (which dims carry signal, which are dead).

    Two-pass centered moments (NOT E[x²]−E[x]² — cancellation there
    flips the 6th decimal, the same hazard documented on the
    skew/kurtosis op): pass 1 folds per-batch (sum, n) partials per
    dimension — d rows per batch regardless of batch size — and the
    d-length mean vector (bounded: one float per dimension) broadcasts
    into pass 2, which folds Σ(x−mean)² partials the same way.
    Embeddings never cross an exchange; both passes stream.

    ``dim`` is 1-based to match SQL list indexing (oracle:
    ``avg/sum over generate_subscripts``).  Output: ``dim, n_vectors,
    mean, variance`` (variance = m2/(n−1), NULL for n<2) sorted by dim.

    Reference analog: the per-channel BatchNorm statistics every
    architecture fits over its input (TSFEDL/blocks_keras.py:96-118) —
    here as a standalone corpus profile.
    """
    import ray
    import ray.data

    def p1(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.float64()),
                             "_n": pa.array([], pa.int64())})
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        mat = flat.reshape(t.num_rows, d)
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "_s": pa.array(mat.sum(axis=0)),
            "_n": pa.array(np.full(d, t.num_rows, dtype=np.int64)),
        })

    part1 = ds.map_batches(p1, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(part1) == 0 or "dim" not in part1.columns:
        # zero-row input: Ray may skip p1 entirely, leaving a
        # column-less frame — degrade to the typed empty result
        return ray.data.from_pandas(
            pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                          "n_vectors": pd.Series([], dtype="int64"),
                          "mean": pd.Series([], dtype="float64"),
                          "variance": pd.Series([], dtype="float64")}))
    g = part1.groupby("dim", sort=True).agg(_s=("_s", "sum"), _n=("_n", "sum"))
    means = (g["_s"] / g["_n"]).to_numpy()
    n_total = int(g["_n"].iloc[0]) if len(g) else 0
    mean_ref = ray.put(means)

    def p2(t: pa.Table) -> pa.Table:
        import ray

        mu = ray.get(mean_ref)
        vecs = t[vec_col].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "_m2": pa.array([], pa.float64())})
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        dev = flat.reshape(t.num_rows, d) - mu[None, :]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "_m2": pa.array((dev * dev).sum(axis=0)),
        })

    part2 = ds.map_batches(p2, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    m2 = part2.groupby("dim", sort=True)["_m2"].sum()

    out = pd.DataFrame({
        "dim": g.index.to_numpy(dtype=np.int64),
        "n_vectors": g["_n"].to_numpy(dtype=np.int64),
        "mean": means,
        "variance": (m2.to_numpy() / (n_total - 1)) if n_total > 1
        else np.full(len(g), np.nan),
    })
    return ray.data.from_pandas(out) if len(out) else ray.data.from_pandas(
        pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                      "n_vectors": pd.Series([], dtype="int64"),
                      "mean": pd.Series([], dtype="float64"),
                      "variance": pd.Series([], dtype="float64")}))


def label_separability(
    ds: Dataset,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> Dataset:
    """Mean pairwise intra-label cosine similarity per label — the
    cluster-cohesion diagnostic beside the centroid confusability matrix
    (inter-label) and the k-means silhouette (model-based): high mean
    intra-cosine = the label is an embedding-tight class.

    The whole O(n²) pairwise sum folds to a COMBINER via the identity
    (on unit-normalized vectors v̂):

        Σ_{i≠j} v̂ᵢ·v̂ⱼ = ‖Σᵢ v̂ᵢ‖² − Σᵢ‖v̂ᵢ‖²

    so each batch reduces to (label, Σv̂ per dim, Σ‖v̂‖², n) partials —
    d+2 numbers per label per batch, never a pair, never an exchange of
    embeddings.  mean = (‖S‖² − T) / (n(n−1)); NULL for n < 2.

    Reference analog: the class-prototype cohesion check behind the
    reference's confusion-matrix reporting (keras_experiment.py:583-601).
    Output: ``{label_col}, n_vectors, mean_intra_cosine`` by label.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({label_col: pa.array([], t[label_col].type),
                             "dim": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.float64()),
                             "_n": pa.array([], pa.int64())})
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        mat = _l2_normalize(flat.reshape(t.num_rows, d))
        labs = t[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        tnorm = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tnorm, inv, (mat * mat).sum(axis=1))
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # long rows: dim 1..d carry Σv̂; dim 0 carries Σ‖v̂‖²
        return pa.table({
            label_col: pa.array(np.repeat(uniq, d + 1)),
            "dim": pa.array(np.tile(np.arange(0, d + 1, dtype=np.int64),
                                    len(uniq))),
            "_s": pa.array(np.concatenate(
                [np.concatenate(([tnorm[i]], sums[i])) for i in
                 range(len(uniq))])),
            "_n": pa.array(np.repeat(counts, d + 1)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    g = part.groupby([label_col, "dim"], sort=True).agg(
        _s=("_s", "sum"), _n=("_n", "sum")).reset_index()
    rows = {label_col: [], "n_vectors": [], "mean_intra_cosine": []}
    for lab, sub in g.groupby(label_col, sort=True):
        n = int(sub["_n"].iloc[0])
        t_norm = float(sub.loc[sub["dim"] == 0, "_s"].iloc[0])
        s = sub.loc[sub["dim"] > 0, "_s"].to_numpy()
        s2 = float((s * s).sum())
        mean = ((s2 - t_norm) / (n * (n - 1.0))) if n > 1 else np.nan
        rows[label_col].append(lab)
        rows["n_vectors"].append(n)
        rows["mean_intra_cosine"].append(mean)
    import ray.data

    out = pd.DataFrame(rows)
    out["n_vectors"] = out["n_vectors"].astype("int64")
    out["mean_intra_cosine"] = out["mean_intra_cosine"].astype("float64")
    return ray.data.from_pandas(out)


def centroid_drift(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> Dataset:
    """Embedding-store drift probe per label: split each label's vectors
    into two deterministic halves (``id % 2``) and report the cosine
    between the halves' centroids — ≈1 means the label's embedding mass
    is stable/homogeneous; a low value flags a label whose vectors come
    from two different regimes (re-embedded model version, mixed
    sources, ingestion drift).

    Pure combiner like :func:`label_centroids`: each batch folds to
    (label, half, dim, Σv, n) long partials — 2·d rows per label per
    batch, embeddings never cross an exchange — and the labels×2×d
    merged table folds to one row per label.  Labels with an empty half
    report NULL cosine (nothing to compare).

    Output: ``{label_col}, n_even, n_odd, centroid_cosine`` by label.
    """
    from .rollup import _stable_pkey

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({label_col: pa.array([], t[label_col].type),
                             "half": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.float64()),
                             "_n": pa.array([], pa.int64()),
                             "_pkey": pa.array([], pa.int64())})
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(vecs[0])
        mat = flat.reshape(t.num_rows, d)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = t[label_col].to_numpy(zero_copy_only=False)
        half = ids % 2
        # composite group (label, half) without dtype-destroying strings
        ulabs, linv = np.unique(labs, return_inverse=True)
        code = linv.astype(np.int64) * 2 + half
        uniq, inv = np.unique(code, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab_of = ulabs[uniq >> 1]
        half_of = (uniq & 1).astype(np.int64)
        out = pa.table({
            label_col: pa.array(np.repeat(lab_of, d)),
            "half": pa.array(np.repeat(half_of, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq))),
            "_s": pa.array(sums.ravel()),
            "_n": pa.array(np.repeat(counts, d)),
        })
        return out.append_column("_pkey",
                                 _stable_pkey(out[label_col], 8))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"])
        if len(df) == 0:
            return pd.DataFrame({
                label_col: pd.Series([], dtype="object"),
                "n_even": pd.Series([], dtype="int64"),
                "n_odd": pd.Series([], dtype="int64"),
                "centroid_cosine": pd.Series([], dtype="float64")})
        g = df.groupby([label_col, "half", "dim"], sort=True).agg(
            _s=("_s", "sum"), _n=("_n", "sum")).reset_index()
        g["c"] = g["_s"] / g["_n"]
        rows = {label_col: [], "n_even": [], "n_odd": [],
                "centroid_cosine": []}
        for lab, sub in g.groupby(label_col, sort=True):
            e = sub[sub["half"] == 0].sort_values("dim")
            o = sub[sub["half"] == 1].sort_values("dim")
            ne = int(e["_n"].iloc[0]) if len(e) else 0
            no = int(o["_n"].iloc[0]) if len(o) else 0
            if ne and no:
                c0 = e["c"].to_numpy()
                c1 = o["c"].to_numpy()
                dot = float((c0 * c1).sum())
                q0 = float((c0 * c0).sum())
                q1 = float((c1 * c1).sum())
                cos = (dot / (np.sqrt(q0) * np.sqrt(q1))
                       if q0 > 0 and q1 > 0 else np.nan)
            else:
                cos = np.nan
            rows[label_col].append(lab)
            rows["n_even"].append(ne)
            rows["n_odd"].append(no)
            rows["centroid_cosine"].append(cos)
        out = pd.DataFrame(rows)
        return out.astype({"n_even": "int64", "n_odd": "int64"})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey").map_groups(merge, batch_format="pandas")
            .sort(label_col))


def als_factorize(
    ds: Dataset,
    *,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 3,
    n_iter: int = 8,
    reg: float = 0.1,
    num_partitions: int = 64,
) -> tuple[Dataset, "pd.DataFrame"]:
    """Alternating-least-squares matrix factorization of the dense
    (user × item) rating matrix — the recommender-trainer family,
    completing the engine's ML set (PCA = one-shot spectral, k-means =
    assign/update, PageRank = propagation; ALS = alternating
    optimization).  Ratings absent from the table are 0 (dense
    formulation), so the user step shares one (VᵀV + λI)⁻¹ across all
    users and vectorizes to a single matmul per partition.

    Dataflow per iteration (user factors are RECOMPUTED, never stored —
    the two-phase-resume discipline): one combiner pass over the
    (user, item, r) table co-partitioned by user; each partition
    recomputes its users' factors F = R V A⁻¹ vectorized, emits the
    k×k FᵀF and k×items FᵀR partials; the driver solves the new item
    factors (items × rank, tiny).  A final pass emits the per-user
    factor table (distributed, never collected).

    The item universe must be driver-bounded (categorical vocabularies —
    event types, tool names); users are unbounded.

    Returns ``(user_factors Dataset: user, f_0..f_{rank-1}, item_factors
    DataFrame: item, f_0..)``.  No SQL twin (iterative); tests pin
    planted low-rank recovery.
    """
    from ..pipelines.relational import grouped_aggregate
    from .rollup import _stable_pkey

    # ratings: exact (user, item, r) aggregate, co-partitioned by user
    rat = grouped_aggregate(ds, keys=[user_col, item_col],
                            aggs={"r": (rating_col, "sum")},
                            num_partitions=num_partitions)
    uvals = rat.select_columns([item_col]).unique(item_col) or []
    items = np.sort(np.atleast_1d(np.asarray(uvals)))
    ni = len(items)
    if ni == 0:
        import ray.data
        cols = {user_col: pd.Series([], dtype="object")}
        cols.update({f"f_{i}": pd.Series([], dtype="float64")
                     for i in range(rank)})
        return (ray.data.from_pandas(pd.DataFrame(cols)),
                pd.DataFrame({item_col: []}))
    rat = rat.materialize()  # iteration working set

    rng = np.random.default_rng(0)
    vf = rng.normal(0.0, 0.1, (ni, rank))  # item factors, deterministic

    def pass_partials(v: np.ndarray):
        a_inv = np.linalg.inv(v.T @ v + reg * np.eye(rank))

        def part(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                     "j": pd.Series([], dtype="int64"),
                                     "v": pd.Series([], dtype="float64")})
            u, uinv = np.unique(df[user_col].to_numpy(),
                                return_inverse=True)
            ii = np.searchsorted(items, df[item_col].to_numpy())
            r = df["r"].to_numpy(dtype=np.float64)
            nu = len(u)
            rv = np.zeros((nu, rank))          # R_u V  (sparse matmul)
            np.add.at(rv, uinv, r[:, None] * v[ii])
            f = rv @ a_inv                     # user factors, batched
            ftf = f.T @ f                      # k×k
            ftr = np.zeros((rank, ni))         # k×items: Σ_u f_u r_ui
            np.add.at(ftr.T, ii, r[:, None] * f[uinv])
            i1, j1 = np.meshgrid(np.arange(rank), np.arange(rank),
                                 indexing="ij")
            i2, j2 = np.meshgrid(np.arange(rank),
                                 rank + np.arange(ni), indexing="ij")
            return pd.DataFrame({
                "i": np.concatenate([i1.ravel(), i2.ravel()]),
                "j": np.concatenate([j1.ravel(), j2.ravel()]),
                "v": np.concatenate([ftf.ravel(), ftr.ravel()])})

        rows = (rat.map_batches(
                    lambda t: t.append_column(
                        "_pkey", _stable_pkey(t[user_col],
                                              num_partitions)),
                    batch_format="pyarrow")
                .groupby("_pkey")
                .map_groups(lambda df: part(df.drop(columns=["_pkey"])),
                            batch_format="pandas")
                .to_pandas())
        g = rows.groupby(["i", "j"], sort=True)["v"].sum()
        ftf = np.zeros((rank, rank))
        ftr = np.zeros((rank, ni))
        for (i, j), val in g.items():
            if j < rank:
                ftf[i, j] = val
            else:
                ftr[i, j - rank] = val
        return ftf, ftr

    for _ in range(n_iter):
        ftf, ftr = pass_partials(vf)
        vf = np.linalg.solve(ftf + reg * np.eye(rank), ftr).T

    # final pass: emit per-user factors (distributed)
    v_fin = vf
    a_inv_fin = np.linalg.inv(v_fin.T @ v_fin + reg * np.eye(rank))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cols = {user_col: pd.Series([], dtype="object")}
        cols.update({f"f_{i}": pd.Series([], dtype="float64")
                     for i in range(rank)})
        if len(df) == 0:
            return pd.DataFrame(cols)
        u, uinv = np.unique(df[user_col].to_numpy(), return_inverse=True)
        ii = np.searchsorted(items, df[item_col].to_numpy())
        r = df["r"].to_numpy(dtype=np.float64)
        rv = np.zeros((len(u), rank))
        np.add.at(rv, uinv, r[:, None] * v_fin[ii])
        f = rv @ a_inv_fin
        out = {user_col: u}
        out.update({f"f_{i}": f[:, i] for i in range(rank)})
        return pd.DataFrame(out)

    uf = (rat.map_batches(
              lambda t: t.append_column(
                  "_pkey", _stable_pkey(t[user_col], num_partitions)),
              batch_format="pyarrow")
          .groupby("_pkey")
          .map_groups(lambda df: emit(df.drop(columns=["_pkey"])),
                      batch_format="pandas"))
    item_df = pd.DataFrame({item_col: items})
    for i in range(rank):
        item_df[f"f_{i}"] = vf[:, i]
    return uf, item_df


def dim_participation(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
) -> Dataset:
    """Feature-space concentration summary of the embedding matrix: the
    participation ratio of the per-dimension variance spectrum

        PR = (Σ_d v_d)² / Σ_d v_d²          (1 ≤ PR ≤ d)

    — how many dimensions effectively carry variance (PR ≈ d means a
    flat spectrum, PR ≈ 1 means one dominant axis) — plus the top
    dimension's variance share.  The scalar roll-up of
    :func:`dim_moments` (per-dim profile) and the cheap diagonal proxy
    for the PCA eigenvalue spectrum (axis-aligned variance, no rotation
    — :func:`pca_fit_transform` gives the rotated version).

    Both sums fold SEQUENTIALLY over dim order (a d-length Python loop
    in the tiny final — mirrored by the twin's ``list_reduce``), so the
    only float divergence is dim_moments' own batch-order sum noise,
    ~1e-16 relative, far below 6-decimal rounding of a ratio in [1, d].
    Output: one row — ``n_dims (int64), n_vectors (int64),
    participation_ratio, top_dim_var_share`` (NULLs when n < 2).
    """

    moments = dim_moments(ds, vec_col=vec_col)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "dim" not in df.columns:
            return pd.DataFrame({
                "n_dims": pd.Series([], dtype="int64"),
                "n_vectors": pd.Series([], dtype="int64"),
                "participation_ratio": pd.Series([], dtype="float64"),
                "top_dim_var_share": pd.Series([], dtype="float64")})
        m = df.sort_values("dim", kind="mergesort")
        v = m["variance"].to_numpy(np.float64)
        nv = int(m["n_vectors"].iloc[0])
        d = len(m)
        if np.isnan(v).any():
            pr = sh = np.nan
        else:
            s1 = np.float64(0.0)
            s2 = np.float64(0.0)
            for x in v:                 # sequential == list_reduce twin
                s1 = s1 + x
                s2 = s2 + x * x
            with np.errstate(invalid="ignore", divide="ignore"):
                pr = s1 * s1 / s2
                sh = np.float64(v.max()) / s1
            pr = pr if np.isfinite(pr) else np.nan
            sh = sh if np.isfinite(sh) else np.nan
        return pd.DataFrame({
            "n_dims": pd.Series([d], dtype="int64"),
            "n_vectors": pd.Series([nv], dtype="int64"),
            "participation_ratio": [pr],
            "top_dim_var_share": [sh]})

    return moments.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)
