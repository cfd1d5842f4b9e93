"""Connected-components dedup clustering (stages/cluster.py) against a
pure-Python union-find oracle, including multi-iteration chain graphs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _uf_components(pairs: list[tuple[int, int]], vertices=None) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = set(parent) | set(vertices or [])
    return {v: find(v) for v in verts}


def _cc_df(pairs: list[tuple[int, int]], **kw) -> pd.DataFrame:
    from s_tsfe_dl_ray.stages.cluster import connected_components

    kw.setdefault("num_partitions", 8)  # tiny graphs on the 4-CPU test session
    ds = rd.from_pandas(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    out = connected_components(ds, **kw).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def test_cc_chain_needs_iterations():
    # a path graph 0-1-2-...-12: init labels only see direct neighbors,
    # so propagation must iterate ~log2(len) rounds to converge
    pairs = [(i, i + 1) for i in range(12)]
    out = _cc_df(pairs)
    assert out.id.tolist() == list(range(13))
    assert (out.component == 0).all()


def test_cc_matches_union_find_on_random_graph():
    rng = np.random.default_rng(3)
    verts = rng.choice(10_000, size=120, replace=False)
    pairs = [
        (int(verts[i]), int(verts[j]))
        for i, j in rng.integers(0, len(verts), (80, 2))
        if i != j
    ]
    oracle = _uf_components(pairs)
    out = _cc_df(pairs)
    assert dict(zip(out.id, out.component)) == oracle


def test_cc_cliques_and_empty():
    # LSH output shape: two cliques — init alone converges
    pairs = [(a, b) for c in ([5, 9, 17, 40], [100, 101, 102]) for i, a in
             enumerate(c) for b in c[i + 1:]]
    out = _cc_df(pairs)
    assert dict(zip(out.id, out.component)) == _uf_components(pairs)

    from s_tsfe_dl_ray.stages.cluster import connected_components

    empty = rd.from_pandas(pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                         "id_b": pd.Series(dtype="int64")}))
    assert connected_components(empty).count() == 0


def test_dedup_keep_one_survivor_per_cluster():
    from s_tsfe_dl_ray.stages.cluster import dedup_keep

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(20)),
        "text": [f"doc {i}" for i in range(20)],
    }))
    # clusters {1,3,7} and {2,18} (chain), rest isolated
    pairs = rd.from_pandas(pd.DataFrame(
        [(1, 3), (3, 7), (2, 18)], columns=["id_a", "id_b"]))
    out = dedup_keep(docs, pairs, num_partitions=8).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    comp = dict(zip(out.doc_id, out.component))
    assert comp[1] == comp[3] == comp[7] == 1
    assert comp[2] == comp[18] == 2
    assert comp[5] == 5  # isolated doc is its own component
    kept = set(out[out.keep].doc_id)
    assert kept == (set(range(20)) - {3, 7, 18})
    # survivors carry their original payload columns
    assert set(out.columns) >= {"doc_id", "text", "component", "keep"}


def _edges(rows):
    import pyarrow as pa
    import ray
    s, d, w = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "src": pa.array(list(s), pa.int64()),
        "dst": pa.array(list(d), pa.int64()),
        "w": pa.array(list(w), pa.float64())}))


def test_pagerank_ring_is_uniform_and_conserves_mass():
    from s_tsfe_dl_ray.stages.cluster import pagerank

    k = 10
    out = pagerank(_edges([(i, (i + 1) % k, 1.0) for i in range(k)]),
                   src_col="src", dst_col="dst", weight_col="w",
                   n_iter=20).to_pandas()
    assert len(out) == k
    np.testing.assert_allclose(out["rank"].to_numpy(), 1.0 / k, rtol=1e-12)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_pagerank_star_hub_dominates():
    from s_tsfe_dl_ray.stages.cluster import pagerank

    # spokes 1..9 all point at 0; 0 is dangling (mass redistributes)
    out = pagerank(_edges([(i, 0, 1.0) for i in range(1, 10)]),
                   src_col="src", dst_col="dst", weight_col="w",
                   n_iter=30).to_pandas().set_index("node")
    assert out.loc[0, "rank"] > 5 * out.loc[1, "rank"]
    spokes = out.drop(index=0)["rank"].to_numpy()
    np.testing.assert_allclose(spokes, spokes[0], rtol=1e-12)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_pagerank_weight_tilts_rank_and_empty_is_empty():
    import ray

    from s_tsfe_dl_ray.stages.cluster import pagerank

    out = pagerank(_edges([(0, 1, 3.0), (0, 2, 1.0),
                           (1, 0, 1.0), (2, 0, 1.0)]),
                   src_col="src", dst_col="dst", weight_col="w",
                   n_iter=30).to_pandas().set_index("node")
    assert out.loc[1, "rank"] > out.loc[2, "rank"]

    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "w": pa.array([], pa.float64())}))
    assert len(pagerank(empty, src_col="src", dst_col="dst",
                        weight_col="w").to_pandas()) == 0


def test_pagerank_sharded_matches_broadcast():
    """Planted-graph parity between the driver-broadcast rank vector and
    the sharded object-store rank state (VERDICT r4 #3): same nodes,
    ranks equal to 1e-10, mass conserved, and the sharded route also
    pins ring uniformity, star hub dominance + dangling redistribution,
    and the empty graph."""
    import ray

    from s_tsfe_dl_ray.stages.cluster import pagerank

    rng = np.random.default_rng(3)
    rows = [(int(rng.integers(0, 200)), int(rng.integers(0, 200)),
             float(rng.uniform(0.5, 2))) for _ in range(2000)]
    b = pagerank(_edges(rows), src_col="src", dst_col="dst",
                 weight_col="w", n_iter=15, mode="broadcast").to_pandas()
    s = pagerank(_edges(rows), src_col="src", dst_col="dst",
                 weight_col="w", n_iter=15, mode="sharded",
                 n_shards=7).to_pandas()
    assert (b["node"].to_numpy() == s["node"].to_numpy()).all()
    np.testing.assert_allclose(b["rank"], s["rank"], rtol=1e-10)
    assert abs(s["rank"].sum() - 1.0) < 1e-9

    k = 10
    r = pagerank(_edges([(i, (i + 1) % k, 1.0) for i in range(k)]),
                 src_col="src", dst_col="dst", weight_col="w",
                 n_iter=20, mode="sharded", n_shards=4).to_pandas()
    np.testing.assert_allclose(r["rank"].to_numpy(), 1.0 / k, rtol=1e-12)

    a = pagerank(_edges([(i, 0, 1.0) for i in range(1, 10)]),
                 src_col="src", dst_col="dst", weight_col="w",
                 n_iter=30, mode="sharded", n_shards=3
                 ).to_pandas().set_index("node")
    assert a.loc[0, "rank"] > 5 * a.loc[1, "rank"]
    assert abs(a["rank"].sum() - 1.0) < 1e-9

    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "w": pa.array([], pa.float64())}))
    assert len(pagerank(empty, src_col="src", dst_col="dst",
                        weight_col="w", mode="sharded").to_pandas()) == 0
