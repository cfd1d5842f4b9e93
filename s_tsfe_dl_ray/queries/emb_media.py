"""Embedding-table and media query bodies.

Mechanically split out of ``__ray_entry__.py`` (VERDICT r4 #8): every
``q_*`` callable keeps its original closure shape inside :func:`build`;
the driver's recorded-50 ordering lives in ``registry.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._common import (_LANGS, _STOP, _dd_round6, _events_gapfill,
                      _round_floats, _transcripts_for)

__all__ = ["build"]


def build() -> dict:
    from s_tsfe_dl_ray.pipelines.events_rollup import (
        events_tier, events_tiers, events_top_windows, events_type_rate,
    )
    from s_tsfe_dl_ray.pipelines.relational import pricing_summary
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers
    from s_tsfe_dl_ray.sources.parquet import read_events, read_table
    from s_tsfe_dl_ray.stages.dedup import (
        exact_dedup_ids, first_per_key, minhash_dedup_pairs, simhash_signatures,
    )
    from s_tsfe_dl_ray.stages.gapfill import gapfill
    from s_tsfe_dl_ray.stages.scan import ordered_scan
    from s_tsfe_dl_ray.stages.sessionize import sessionize
    from s_tsfe_dl_ray.stages.similarity import (
        embedding_neardup_pairs, knn_bruteforce, knn_ivf,
    )
    from s_tsfe_dl_ray.stages.text import (
        lang_id, md5_fingerprint, quality_score, rolling_fingerprint, token_stats,
    )
    from s_tsfe_dl_ray.state.encode import decode_series, encode_series

    def q_media_decode_demo(sf):
        """Multimodal image features over REAL PNG decode (stdlib zlib +
        scanline unfiltering — stages/media.py png_decode): deterministic
        synthetic PNG corpus → actor-pool decode → pixel stats."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import decode_images, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        out = decode_images(media)
        return out.select_columns(["media_id", "pixel_mean", "pixel_std"])

    def q_media_audio_demo(sf):
        """Audio features over REAL WAV decode (stdlib wave → 16-bit PCM
        — stages/media.py wav_decode) + real DSP: RMS / ZCR / spectral
        centroid."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import decode_audio, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        return decode_audio(media)

    def q_media_frames_demo(sf):
        """Video frame-sampling plumbing: evenly-spaced frame indices from
        duration × fps (one row per sampled frame)."""
        import ray.data as rd

        from s_tsfe_dl_ray.stages.media import sample_video_frames, synth_media_table

        media = rd.from_arrow(synth_media_table(256, seed=42))
        return sample_video_frames(media, n_frames=4)

    def q_emb_knn_top10(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(knn_bruteforce(
            ds, query_ids=list(range(10)), k=10,
            source_path=f"{sf}/embeddings.parquet",
        ))

    def q_emb_neardup_04(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(embedding_neardup_pairs(ds, threshold=0.4))

    def q_emb_dedup_clusters(sf):
        """Transitive closure of near-dup pairs: every paired vector
        labeled with its connected component's min id (hash-to-min label
        propagation, stages/cluster.py).  Oracle: recursive CTE
        reachability min."""
        from s_tsfe_dl_ray.stages.cluster import connected_components

        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        pairs = embedding_neardup_pairs(ds, threshold=0.4)
        return connected_components(pairs).sort("id")

    def q_emb_knn_ivf(sf):
        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        return _round_floats(knn_ivf(ds, n_queries=10, k=10, n_clusters=8, nprobe=4))

    def q_emb_neardup_lsh(sf):
        """Banded random-projection near-dup (production-scale route);
        exact-verified, so any found pair is a true >=0.9 pair.  The sf
        embeddings are random (no >=0.9 pairs exist), so the demo plants
        deterministic seeded perturbations of the 16 lowest vec_ids — every
        planted pair must be recovered, making the row count a real recall
        probe rather than a vacuous 0.  Rows-only: recall is probabilistic
        in general (tested >=99.6% per-pair in pytest)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from s_tsfe_dl_ray.stages.similarity import embedding_neardup_lsh

        ds = read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        seeds = ds.sort("vec_id").limit(16).to_pandas()
        rng = np.random.default_rng(7)
        planted = pd.DataFrame({
            "vec_id": seeds.vec_id.to_numpy() + 10_000_000,
            "embedding": [
                np.asarray(v, dtype=np.float64)
                + rng.standard_normal(len(v)) * 0.02
                for v in seeds.embedding
            ],
        })
        corpus = ds.union(ray.data.from_pandas(planted))
        out = _round_floats(embedding_neardup_lsh(corpus, threshold=0.9))
        return out.sort(["id_a", "id_b"])

    def q_emb_label_centroids(sf):
        """Vector aggregate: per-label embedding centroids in LONG form
        (label, dim, n_vectors, centroid) — partials are labels×dims
        rows per batch, embeddings never cross the exchange
        (stages/similarity.label_centroids)."""
        from s_tsfe_dl_ray.stages.similarity import label_centroids

        emb = read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
        return _round_floats(label_centroids(emb))

    def q_emb_centroid_similarity(sf):
        """Class-confusability matrix: pairwise cosine between label
        centroids (stages/similarity.centroid_similarity — rides the
        labels×dims combiner; the |labels|² step is a single tiny
        partition)."""
        from s_tsfe_dl_ray.stages.similarity import centroid_similarity

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["label", "embedding"])
        return _round_floats(centroid_similarity(emb))

    def q_emb_pca_top2(sf):
        """Exact distributed PCA: covariance from one (d + d² + 1)-moment
        combiner pass, driver eigh, broadcast (X−µ)W transform; sign-
        deterministic components (stages/similarity.pca_fit_transform).
        Eigendecomposition -> no SQL twin; variance-order/orthogonality/
        blocking-invariance pinned in pytest."""
        from s_tsfe_dl_ray.stages.similarity import pca_fit_transform

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(pca_fit_transform(emb, n_components=2))

    def q_emb_kmeans(sf):
        """Full-corpus Lloyd k-means: one fused assign+reduce combiner
        pass per iteration, k x d centroid state on the driver, final
        assignment pass (stages/similarity.kmeans_lloyd). Iterative ->
        no SQL twin; planted-cluster recovery and blocking invariance
        pinned in pytest."""
        from s_tsfe_dl_ray.stages.similarity import kmeans_lloyd

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return kmeans_lloyd(emb, n_clusters=8, n_iter=4)

    def q_emb_cosine_centroid(sf):
        """Cosine of every embedding to the corpus mean vector — global
        typicality score (stages/similarity.cosine_to_centroid)."""
        from s_tsfe_dl_ray.stages.similarity import cosine_to_centroid

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(cosine_to_centroid(emb))

    def q_emb_dedup_cluster_sizes(sf):
        """Cluster-size histogram of the near-dup components — how much
        of the corpus is pairwise-duplicated, at what multiplicity
        (composition: connected_components → size → histogram)."""
        from s_tsfe_dl_ray.stages.cluster import connected_components
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        pairs = embedding_neardup_pairs(ds, threshold=0.4)
        comp = connected_components(pairs)

        def one(t):
            import pyarrow as pa
            import numpy as np

            return t.append_column(
                "n", pa.array(np.ones(t.num_rows, dtype=np.int64)))

        sizes = _grouped_min(
            comp.map_batches(one, batch_format="pyarrow"),
            group_cols=["component"], agg_cols=[("n", "sum")],
            pkey_col="component", num_partitions=8)

        def rename(t):
            import pyarrow as pa
            import numpy as np

            return pa.table({
                "cluster_size": t["n"],
                "n_clusters": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            })

        hist = _grouped_min(
            sizes.map_batches(rename, batch_format="pyarrow"),
            group_cols=["cluster_size"], agg_cols=[("n_clusters", "sum")],
            pkey_col="cluster_size", num_partitions=1)
        return hist.sort("cluster_size")

    def q_emb_quantize_error(sf):
        """Per-vector uint8 min-max quantization reconstruction error
        (×1e6) — the embedding-store compression audit
        (stages/similarity.quantize_error)."""
        from s_tsfe_dl_ray.stages.similarity import quantize_error

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(quantize_error(emb).sort("vec_id"))

    def q_emb_norm_stats(sf):
        """Per-label L2-norm profile of the embedding store
        (stages/similarity.norm_stats)."""
        from s_tsfe_dl_ray.stages.similarity import norm_stats

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["label", "embedding"])
        return _round_floats(norm_stats(emb).sort("label"))

    def q_emb_kmeans_silhouette(sf):
        """Per-cluster simplified silhouette of the Lloyd k-means fit
        (stages/similarity.kmeans_silhouette).  Rows-only: iterative
        fit has no SQL twin; tests/test_similarity.py pins planted
        recovery."""
        from s_tsfe_dl_ray.stages.similarity import kmeans_silhouette

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(kmeans_silhouette(emb, n_clusters=8)
                             .sort("cluster"))

    def q_emb_pq_distortion(sf):
        """Product-quantization reconstruction error (m=8 subspaces,
        16 codes) per vector (stages/similarity.pq_distortion).
        Rows-only: iterative codebook fit has no SQL twin;
        tests/test_similarity.py pins planted-codebook recovery and
        monotone-in-codes distortion."""
        from s_tsfe_dl_ray.stages.similarity import pq_distortion

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(pq_distortion(emb).sort("vec_id"))

    def q_emb_knn_ivf_pq(sf):
        """IVF-PQ approximate top-10 cosine neighbors — the last rung of
        the ANN ladder (stages/similarity.knn_ivf_pq).  Rows-only:
        PQ scores are approximations; tests/test_similarity.py pins
        recall and score fidelity against brute force."""
        from s_tsfe_dl_ray.stages.similarity import knn_ivf_pq

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
        return _round_floats(knn_ivf_pq(emb, n_queries=10, k=10,
                                        n_clusters=8, nprobe=4))

    def q_emb_dim_variance(sf):
        """Per-dimension mean + sample variance of the embedding matrix
        (feature-variance profile) — two-pass centered moments, d-row
        partials per batch (stages/similarity.dim_moments)."""
        from s_tsfe_dl_ray.stages.similarity import dim_moments

        emb = read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        return _round_floats(dim_moments(emb))

    def q_emb_label_separability(sf):
        """Mean pairwise intra-label cosine via the ‖Σv̂‖²−Σ‖v̂‖² combiner
        identity — O(n²) pair sum, zero pairs materialized
        (stages/similarity.label_separability)."""
        from s_tsfe_dl_ray.stages.similarity import label_separability

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
        return _round_floats(label_separability(emb).sort("label"))

    def q_emb_centroid_drift(sf):
        """Per-label even/odd-half centroid cosine (embedding-store
        drift probe) — pure combiner, embeddings never shuffled
        (stages/similarity.centroid_drift)."""
        from s_tsfe_dl_ray.stages.similarity import centroid_drift

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "label", "embedding"])
        return _round_floats(centroid_drift(emb))

    def q_emb_index_job(sf):
        """Durable ANN index build (IVF + uint8 buckets + lineage
        manifests) then pruned-read search for the first 10 corpus
        vectors — pipelines/emb_index_job.EmbIndexJob.  Rows-only;
        determinism/resume/recall pinned in tests/test_emb_index_job.py."""
        import hashlib as _hl

        import numpy as np
        import pyarrow.parquet as pq
        import ray.data

        from s_tsfe_dl_ray.pipelines.emb_index_job import EmbIndexJob

        tag = _hl.md5(sf.encode()).hexdigest()[:10]
        out = f"/tmp/s_tsfe_dl_ray_emb_index_{tag}"
        job = EmbIndexJob(f"{sf}/embeddings.parquet", out, n_clusters=8)
        job.run()
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          filters=[("vec_id", "<", 10)])
        q = np.array([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        res = job.search(q, k=5, nprobe=4)
        return ray.data.from_pandas(res.sort_values(
            ["query_idx", "cosine", "neighbor_id"],
            ascending=[True, False, True]).reset_index(drop=True))

    def q_emb_ivf_recall(sf):
        """ANN quality audit as a first-class query: recall@10 of the
        IVF route against the exact brute-force neighbors for the same
        10 query vectors — the acceptance gate run before trusting an
        approximate index (composition of knn_ivf × knn_bruteforce).
        Rows-only (both sides approximate/derived)."""
        import pandas as _pd

        from s_tsfe_dl_ray.stages.similarity import knn_bruteforce, knn_ivf

        ds = read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
        exact = knn_bruteforce(
            ds, query_ids=list(range(10)), k=10,
            source_path=f"{sf}/embeddings.parquet").to_pandas()
        approx = knn_ivf(ds, n_queries=10, k=10, n_clusters=8,
                         nprobe=4).to_pandas()
        qcol = [c for c in exact.columns if "query" in c][0]
        ncol = [c for c in exact.columns if c != qcol
                and ("neighbor" in c or "vec" in c)][0]
        e = set(zip(exact[qcol], exact[ncol]))
        a = set(zip(approx[qcol], approx[ncol]))
        per_q = {}
        for q, nb in e:
            per_q.setdefault(q, [0, 0])
            per_q[q][1] += 1
            if (q, nb) in a:
                per_q[q][0] += 1
        rows = _pd.DataFrame({
            "query_id": sorted(per_q),
            "recall_at_10": [per_q[q][0] / per_q[q][1]
                             for q in sorted(per_q)]})
        rows["n_exact"] = [per_q[q][1] for q in sorted(per_q)]
        return rows

    def q_emb_dim_participation(sf):
        """Participation ratio of the per-dimension variance spectrum +
        top-dimension share — how many axes effectively carry variance
        (stages/similarity.dim_participation)."""
        from s_tsfe_dl_ray.stages.similarity import dim_participation

        emb = read_table(f"{sf}/embeddings.parquet",
                         columns=["embedding"])
        return _round_floats(dim_participation(emb))

    return {k[2:]: v for k, v in locals().items() if k.startswith("q_")}
