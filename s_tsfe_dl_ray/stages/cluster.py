"""Connected components over near-duplicate pair edges → dedup clusters.

Completes the dedup story: exact hashes / MinHash / SimHash / n-gram /
embedding stages emit PAIRS (id_a, id_b); corpus-level deduplication
needs the transitive closure — every doc labeled with its cluster's
canonical (minimum) id so one representative per cluster survives.

Reference analog: the reference's per-record label remap
(``data/interpolate.py`` binary relabel) is a pointwise map; clustering
transitive duplicate relations has no reference analog and is an engine
addition for the LLM-data-pipeline tier (SURVEY.md LLM ops).

Algorithm: hash-to-min label propagation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014 — the two-phase min-label
exchange, simplified to the undirected near-dup case):

- init: label(v) = min(v, all direct neighbors) — one partitioned
  grouped-min over the symmetrized edge list.  For cliques (the common
  LSH output shape: every member paired with every other) this already
  converges: everyone sees the cluster min directly.
- iterate, TWO hash exchanges per round:
  - exchange 1 co-locates, per hash bucket of the *lookup key*, three
    row kinds: edges keyed by src, labels keyed by id (serving), and
    labels keyed by their own label (requesting).  One vectorized body
    emits both message types: neighbor push ``(dst, label(src))`` and
    pointer jump ``(v, label(label(v)))`` — the path-doubling step that
    makes long chains converge in O(log diameter) rounds instead of
    O(diameter).
  - exchange 2 regroups ``labels ∪ messages`` by vertex and computes
    the per-vertex min AND the round's change count in one body.
  Labels only decrease; a round with zero changes is the fixpoint.

The driver only orchestrates the O(log diameter) rounds and reads one
scalar change-count per round (never row data).  Near-dup clusters are
cliques or short chains, so 1–2 rounds in practice; ``max_iters`` guards
adversarial long paths.  The partition count adapts to the edge count
(pair graphs are far smaller than the corpus) unless pinned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .dedup import _grouped_min
from .join import hash_join
from .rollup import _stable_pkey

# phase-1 row kinds: (x = lookup key the row is partitioned on, y = payload)
_K_EDGE = 0     # x=src (lookup), y=dst            → emit (dst, label(src))
_K_SERVE = 1    # x=id, y=lbl (the label table itself)
_K_REQ = 2      # x=lbl (lookup), y=id             → emit (id, label(lbl))


def connected_components(
    pairs: Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int | None = None,
    max_iters: int = 50,
) -> Dataset:
    """Label every vertex of the pair graph with its component's min id.

    Returns ``(id, component)`` for vertices that appear in ``pairs``
    (isolated docs never enter the edge list — callers treat absence as
    "own component"; see :func:`dedup_keep`).

    ``num_partitions=None`` (default) sizes the per-round exchanges to
    the edge count — ~1 partition per 200k edges within [8, 256]; pin it
    explicitly for a known cluster size.
    """
    import ray.data

    def sym(t: pa.Table) -> pa.Table:
        a, b = t[id_a], t[id_b]
        return pa.table({
            "src": pa.chunked_array([*a.chunks, *b.chunks]),
            "dst": pa.chunked_array([*b.chunks, *a.chunks]),
        })

    edges = pairs.select_columns([id_a, id_b]).map_batches(
        sym, batch_format="pyarrow"
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"id": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
    if num_partitions is None:
        num_partitions = int(min(256, max(8, n_edges // 200_000 + 8)))

    # init: label(v) = min(v, neighbors) — one grouped-min over
    # (src → dst) ∪ (src → src)
    def with_self(t: pa.Table) -> pa.Table:
        src, dst = t["src"], t["dst"]
        return pa.table({
            "id": pa.chunked_array([*src.chunks, *src.chunks]),
            "lbl": pa.chunked_array([*dst.chunks, *src.chunks]),
        })

    labels = _grouped_min(
        edges.map_batches(with_self, batch_format="pyarrow"),
        group_cols=["id"], agg_cols=[("lbl", "min")],
        pkey_col="id", num_partitions=num_partitions,
    ).map_batches(lambda t: t, batch_format="pyarrow").materialize()

    def tag_xy(kind: int, x_col: str, y_col: str):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            x = pc.cast(t[x_col], pa.int64())
            return pa.table({
                "x": x,
                "y": pc.cast(t[y_col], pa.int64()),
                "kind": pa.array(np.full(t.num_rows, kind, np.int8)),
                "_pkey": _stable_pkey(x, num_partitions),
            })
        return fn

    def emit_msgs(df: pd.DataFrame) -> pd.DataFrame:
        # one body serves both message kinds from the co-located lookup
        serve = df[df["kind"] == _K_SERVE]
        lut = serve.set_index("x")["y"]
        ask = df[df["kind"] != _K_SERVE]
        looked = lut.reindex(ask["x"]).to_numpy()
        assert not np.isnan(looked).any(), "vertex missing from label table"
        return pd.DataFrame({
            "id": ask["y"].to_numpy(),
            "lbl": looked.astype(np.int64),
        })

    def tag_vertex(old: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(["id", "lbl"])
            return t.append_column(
                "_old", pa.array(np.full(t.num_rows, old, np.int8))
            ).append_column(
                "_pkey", _stable_pkey(t["id"], num_partitions)
            )
        return fn

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("id", sort=False)
        new = g["lbl"].min()
        old = df[df["_old"] == 1].set_index("id")["lbl"]
        changed = int((new.loc[old.index] < old).sum())
        out = new.reset_index()
        out["_changed"] = 0
        if len(out):
            out.iloc[0, out.columns.get_loc("_changed")] = changed
        return out

    for _ in range(max_iters):
        # exchange 1: edges(x=src) ∪ labels(x=id, serving) ∪ labels(x=lbl,
        # requesting the jump) — one groupby, one body, both message kinds
        phase1 = (
            edges.map_batches(tag_xy(_K_EDGE, "src", "dst"), batch_format="pyarrow")
            .union(labels.map_batches(tag_xy(_K_SERVE, "id", "lbl"), batch_format="pyarrow"))
            .union(labels.map_batches(tag_xy(_K_REQ, "lbl", "id"), batch_format="pyarrow"))
            .repartition(num_partitions, shuffle=False)  # bound sort input blocks
        )
        msgs = phase1.groupby("_pkey").map_groups(emit_msgs, batch_format="pandas")

        # exchange 2: per-vertex min of [own label ∪ messages] + change count
        both = labels.map_batches(tag_vertex(1), batch_format="pyarrow").union(
            msgs.map_batches(tag_vertex(0), batch_format="pyarrow")
        ).repartition(num_partitions, shuffle=False)
        labels = (
            both.groupby("_pkey")
            .map_groups(merge, batch_format="pandas")
            .materialize()
        )
        n_changed = labels.sum("_changed", ignore_nulls=True) or 0
        # back to Arrow blocks: downstream tag_xy/_stable_pkey introspect
        # Arrow tables, and the map_groups merge emits pandas blocks
        labels = labels.select_columns(["id", "lbl"]).map_batches(
            lambda t: t, batch_format="pyarrow"
        )
        if n_changed == 0:
            break

    def rename_final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "id": pc.cast(t["id"], pa.int64()),
            "component": pc.cast(t["lbl"], pa.int64()),
        })

    return labels.map_batches(rename_final, batch_format="pyarrow")


def dedup_keep(
    docs: Dataset,
    pairs: Dataset,
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int = 64,
    cc_num_partitions: int | None = None,
) -> Dataset:
    """Per-doc dedup decision from near-dup pairs: docs gain ``component``
    (cluster canonical id; own id when unpaired) and ``keep`` (True for
    the cluster minimum — exactly one survivor per cluster).

    Partitioned end-to-end: components from :func:`connected_components`
    (edge-count-adaptive partitioning unless ``cc_num_partitions`` pins
    it), then one hash join of docs against the (small relative to
    corpus) label table.  Filter on ``keep`` for the deduplicated corpus.
    """
    labels = connected_components(
        pairs, id_a=id_a, id_b=id_b, num_partitions=cc_num_partitions
    ).rename_columns({"id": "_cc_id"})

    joined = hash_join(
        docs, labels, left_on=id_col, right_on="_cc_id", how="left",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # the left join's unmatched rows surface component as float
        # null-or-NaN (pandas merge widens int64+missing to float64);
        # normalize NaN→null, coalesce with the own id, restore int64
        c = t["component"]
        if pa.types.is_null(c.type):
            # partition had zero label matches: all-NaN pandas column
            # arrives as Arrow null type — everyone keeps their own id
            comp = pc.cast(t[id_col], pa.int64())
        else:
            if pa.types.is_floating(c.type):
                c = pc.if_else(pc.is_nan(c), pa.nulls(len(c), c.type), c)
            comp = pc.cast(
                pc.coalesce(c, pc.cast(t[id_col], c.type)), pa.int64()
            )
        keep = pc.equal(comp, pc.cast(t[id_col], pa.int64()))
        t = t.drop_columns([c for c in ("component", "_cc_id") if c in t.column_names])
        return t.append_column("component", comp).append_column("keep", keep)

    return joined.map_batches(finish, batch_format="pyarrow")


def _pagerank_sharded(
    e: Dataset,
    *,
    damping: float,
    n_iter: int,
    n_shards: int,
) -> Dataset:
    """Fully distributed PageRank: rank state lives in ``n_shards``
    object-store shards keyed by ``hash(node) % P`` — the driver never
    holds a node-sized vector, only P scalars per iteration (the
    dangling-mass partials).  Same exchange discipline as
    :func:`connected_components`: edges are bucketed ONCE by source
    hash (bucket p holds ALL out-edges of shard-p nodes, so the
    rank×edge join is local to a shard), and per iteration each mapper
    emits per-destination-shard pre-summed contribution tables — the
    only data that moves.

    Raw Ray tasks rather than Dataset ops: the per-iteration state is a
    P-way sharded mutable vector consumed by the next iteration, which
    the Dataset API cannot keep co-partitioned without re-shuffling the
    (much larger) edge set every round.
    """
    import ray
    import ray.data

    P = int(n_shards)

    def _shard_of(vals: np.ndarray) -> np.ndarray:
        return _stable_pkey(pa.array(vals), P).to_numpy(
            zero_copy_only=False)

    @ray.remote(num_returns=P)
    def bucketize(tbl: pa.Table):
        """Edge block → P tables bucketed by hash(src); each also keeps
        the block's distinct destinations hashed by hash(dst) so shard
        node-universes include dangling (in-edge-only) nodes."""
        if tbl.num_rows == 0 or "s" not in tbl.schema.names:
            # Ray passes zero-row blocks through with the PRE-map schema;
            # emit canonical empties (dropped again in build_shard)
            z = pa.table({"s": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "w": pa.array([], pa.float64())})
            out = [(z, np.array([], dtype=np.int64))] * P
            return tuple(out) if P > 1 else out[0]
        s = tbl["s"].to_numpy(zero_copy_only=False)
        d = tbl["d"].to_numpy(zero_copy_only=False)
        w = tbl["w"].to_numpy(zero_copy_only=False)
        hs = _shard_of(s)
        ud = np.unique(d)
        hd = _shard_of(ud)
        out = []
        for p in range(P):
            m = hs == p
            out.append((pa.table({"s": pa.array(s[m]),
                                  "d": pa.array(d[m]),
                                  "w": pa.array(w[m])}),
                        ud[hd == p]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def build_shard(*parts):
        """Concat this shard's edge buckets + destination lists →
        (sorted node ids, out-strength, edges with source pre-indexed
        into the shard's node array)."""
        # drop canonical empties so synthetic int64 dtypes never mix
        # with a non-int node dtype
        tables = [t for t, _ in parts if t.num_rows]
        dlists = [dl for _, dl in parts if len(dl)]
        if not tables and not dlists:
            z = np.array([], dtype=np.int64)
            return (z, np.zeros(0), z, z, np.zeros(0))
        t = (pa.concat_tables(tables) if tables
             else pa.table({"s": pa.array([], pa.int64()),
                            "d": pa.array([], pa.int64()),
                            "w": pa.array([], pa.float64())}))
        s = t["s"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        us, inv = (np.unique(s, return_inverse=True) if len(s)
                   else (s[:0], np.zeros(0, dtype=np.int64)))
        ow = np.bincount(inv, weights=w, minlength=len(us))
        nodes = np.unique(np.concatenate([us] + dlists)) \
            if (len(us) or any(len(dl) for dl in dlists)) else us
        outw = np.zeros(len(nodes))
        outw[np.searchsorted(nodes, us)] = ow
        si = np.searchsorted(nodes, s).astype(np.int64)
        return (nodes, outw,
                si, t["d"].to_numpy(zero_copy_only=False), w)

    @ray.remote
    def init_rank(shard, n_total: int):
        nodes = shard[0]
        return np.full(len(nodes), 1.0 / n_total)

    @ray.remote
    def pr_map(shard, rank: np.ndarray):
        """One shard's propagation: per-destination-shard pre-summed
        contribution tables + this shard's dangling-mass partial.
        Returned as P+1 separate objects (``num_returns``) so each
        reducer pulls ONLY its slice from the object store — no
        contribution data ever lands on the driver, which reads the
        P dangling scalars alone."""
        nodes, outw, si, d, w = shard
        with np.errstate(divide="ignore"):
            inv_ow = np.where(outw > 0, 1.0 / outw, 0.0)
        coef = rank * inv_ow
        c = coef[si] * w
        ud, dinv = (np.unique(d, return_inverse=True) if len(d)
                    else (d[:0], np.zeros(0, dtype=np.int64)))
        v = np.bincount(dinv, weights=c, minlength=len(ud))
        hq = _shard_of(ud) if len(ud) else np.zeros(0, dtype=np.int64)
        out = []
        for q in range(P):
            m = hq == q
            out.append((ud[m], v[m]))
        dm = float(rank[outw <= 0].sum())
        return tuple(out) + (dm,)

    @ray.remote
    def pr_reduce(shard, dm_total: float, n_total: int, *contribs):
        nodes = shard[0]
        inflow = np.zeros(len(nodes))
        for ud, v in contribs:
            if len(ud):
                inflow[np.searchsorted(nodes, ud)] += v
        return ((1.0 - damping) / n_total
                + damping * (inflow + dm_total / n_total))

    @ray.remote
    def shard_table(shard, rank: np.ndarray) -> pa.Table:
        return pa.table({"node": pa.array(shard[0]),
                         "rank": pa.array(rank)})

    blocks = e.to_arrow_refs()
    buckets: list[list] = [[] for _ in range(P)]
    for b in blocks:
        outs = bucketize.remote(b)
        if P == 1:
            outs = [outs]
        for p, o in enumerate(outs):
            buckets[p].append(o)
    shards = [build_shard.remote(*buckets[p]) for p in range(P)]
    sizes = ray.get([
        ray.remote(lambda sh: len(sh[0])).remote(s) for s in shards])
    n_total = int(sum(sizes))
    if n_total == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="object"),
            "rank": pd.Series([], dtype="float64")}))
    ranks = [init_rank.remote(shards[p], n_total) for p in range(P)]

    pr_map_n = pr_map.options(num_returns=P + 1)
    for _ in range(n_iter):
        mapped = [pr_map_n.remote(shards[p], ranks[p]) for p in range(P)]
        dm_total = float(sum(ray.get([m[P] for m in mapped])))
        ranks = [
            pr_reduce.remote(shards[q], dm_total, n_total,
                             *[mapped[p][q] for p in range(P)])
            for q in range(P)
        ]

    tables = [shard_table.remote(shards[p], ranks[p]) for p in range(P)]
    return ray.data.from_arrow_refs(tables).sort("node")


def pagerank(
    edges: Dataset,
    *,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    node_threshold: int = 2_000_000,
    n_shards: int = 64,
    mode: str = "auto",
) -> Dataset:
    """Weighted PageRank over an edge table — the iterative
    rank-propagation sibling of :func:`connected_components` (which
    propagates labels) and of the k-means Lloyd loop (same dataflow
    class: each iteration is ONE combiner pass over the distributed
    edges; only the node-sized rank vector lives on the driver and is
    broadcast into the pass).

    Standard damped formulation with uniform teleport and dangling-mass
    redistribution:

        r' = (1−d)/N + d · (Σ_in r_u·w_uv/outw_u + dangling_mass/N)

    Scale contract — TWO routes, switched by ``mode`` (VERDICT r4 #3):

    - ``broadcast`` (small node sets): the node-sized rank vector lives
      on the driver and is broadcast into one combiner pass per
      iteration — the same bound as the k-means centroid table.  Right
      for part-graphs / bounded vocabularies (≲ a few million nodes).
    - ``sharded`` (web-scale node sets): rank state lives in
      ``n_shards`` object-store shards co-partitioned with the
      once-bucketed edges (:func:`_pagerank_sharded`); the driver
      handles only P dangling-mass scalars per iteration.
    - ``auto`` (default): edge count ≤ ``node_threshold // 2`` (which
      bounds nodes ≤ node_threshold) picks broadcast, else sharded.

    Both routes materialize the bucketed/index-mapped edges once so the
    n_iter passes don't re-derive them.  No SQL twin (iterative); tests
    pin mass conservation, ring-graph uniformity, hub dominance on a
    star, and broadcast↔sharded parity on planted graphs.

    Output: ``node (source dtype), rank (float64)`` sorted by node.
    """
    import ray.data

    if not 0.0 <= damping < 1.0:
        raise ValueError("damping must be in [0, 1)")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"unknown pagerank mode: {mode!r}")

    w_expr = weight_col

    def edge_part(t: pa.Table) -> pa.Table:
        w = (pa.array(np.ones(t.num_rows)) if w_expr is None
             else t[w_expr])
        return pa.table({"s": t[src_col], "d": t[dst_col],
                         "w": pa.array(np.asarray(
                             w.to_numpy(zero_copy_only=False),
                             dtype=np.float64))})

    e = edges.map_batches(edge_part, batch_format="pyarrow",
                          zero_copy_batch=True)

    if mode == "auto":
        # nodes ≤ 2·edges, so an edge-count gate (cheap metadata count
        # on the input) bounds the node count without an extra pass
        mode = ("sharded" if edges.count() > node_threshold // 2
                else "broadcast")
    if mode == "sharded":
        return _pagerank_sharded(e, damping=damping, n_iter=n_iter,
                                 n_shards=n_shards)

    # node universe + out-strength (vocab-sized, driver-resident)
    def node_part(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        us, inv = np.unique(s, return_inverse=True)
        ow = np.bincount(inv, weights=w, minlength=len(us))
        ud = np.unique(d)
        return pa.table({
            "node": pa.array(np.concatenate([us, ud])),
            "ow": pa.array(np.concatenate([ow, np.zeros(len(ud))])),
        })

    nd = (e.map_batches(node_part, batch_format="pyarrow")
          .repartition(1)
          .map_batches(lambda df: df.groupby("node", sort=True)["ow"]
                       .sum().reset_index(),
                       batch_format="pandas", batch_size=None)
          .to_pandas())
    if len(nd) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "node": pd.Series([], dtype="object"),
            "rank": pd.Series([], dtype="float64")}))
    nodes = nd["node"].to_numpy()
    outw = nd["ow"].to_numpy(dtype=np.float64)
    k = len(nodes)

    def to_idx(t: pa.Table) -> pa.Table:
        si = np.searchsorted(nodes, t["s"].to_numpy(zero_copy_only=False))
        di = np.searchsorted(nodes, t["d"].to_numpy(zero_copy_only=False))
        return pa.table({"si": pa.array(si.astype(np.int64)),
                         "di": pa.array(di.astype(np.int64)),
                         "w": t["w"]})

    ei = e.map_batches(to_idx, batch_format="pyarrow").materialize()

    with np.errstate(divide="ignore"):
        inv_ow = np.where(outw > 0, 1.0 / outw, 0.0)
    rank = np.full(k, 1.0 / k)
    dangling = outw <= 0

    for _ in range(n_iter):
        coef = rank * inv_ow  # per-source propagation coefficient

        def contrib_part(t: pa.Table, _coef=coef) -> pa.Table:
            si = t["si"].to_numpy(zero_copy_only=False)
            di = t["di"].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            v = np.bincount(di, weights=_coef[si] * w, minlength=k)
            nz = np.flatnonzero(v)
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "v": pa.array(v[nz])})

        rows = (ei.map_batches(contrib_part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .repartition(1)
                .map_batches(lambda df: df.groupby("i", sort=True)["v"]
                             .sum().reset_index(),
                             batch_format="pandas", batch_size=None)
                .to_pandas())
        inflow = np.zeros(k)
        if len(rows):
            inflow[rows["i"].to_numpy(dtype=np.int64)] = \
                rows["v"].to_numpy(dtype=np.float64)
        dm = float(rank[dangling].sum())
        rank = (1.0 - damping) / k + damping * (inflow + dm / k)

    out = pd.DataFrame({"node": nodes, "rank": rank})
    return ray.data.from_pandas(out)


def pagerank_exact(
    edges: Dataset,
    *,
    a_col: str = "member_a",
    b_col: str = "member_b",
    damping: float = 0.85,
    iters: int = 20,
) -> Dataset:
    """Fixed-iteration PageRank over an UNDIRECTED edge list — the
    ORACLE-PAIRED sibling of :func:`pagerank` (which is weighted,
    directed, handles dangling mass and runs one distributed
    combiner pass per iteration): this variant trades generality
    for a bit-exact SQL twin — the
    importance ranking of the co-purchase / co-occurrence graph whose
    connected components :func:`connected_components` already labels
    (components say "which cluster"; PageRank says "which hub").

    Exactly ``iters`` damped Jacobi iterations from the uniform vector::

        v'(dst) = (1−d)/N + d · Σ_{src∈in(dst)} v(src)/deg(src)

    with the in-neighbor sum folded SEQUENTIALLY in ascending src order
    on both sides (engine: per-dst segment loop; twin: ``list_reduce
    (list(… ORDER BY src))`` in an UNROLLED 20-CTE chain — recursive
    aggregation is avoided on purpose), so the result is bit-exact, not
    merely converged.  Every node of an undirected graph has degree
    ≥ 1, so there are no dangling-mass terms.

    Partitioning assumption (custom-operator rule): the edge list is
    vocabulary-sized (pairs of a categorical key — parts, tags, tools),
    so one final partition holds it; the upstream pair builder
    (:func:`~.distinct.pair_cooccurrence`) is what contracts the
    billion-row fact table down to this.  Output: ``node, degree
    (int64), pagerank`` for every node with ≥ 1 edge.
    """

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "node": pd.Series([], dtype="int64"),
            "degree": pd.Series([], dtype="int64"),
            "pagerank": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        a = df[a_col].to_numpy()
        b = df[b_col].to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        nodes, src_i = np.unique(src, return_inverse=True)
        dst_i = np.searchsorted(nodes, dst)
        n = len(nodes)
        deg = np.bincount(src_i, minlength=n).astype(np.int64)
        # sort edges by (dst, src) once; per-dst segments then fold in
        # ascending-src order
        eo = np.lexsort((src, dst_i))
        s_i, d_i = src_i[eo], dst_i[eo]
        starts = np.flatnonzero(np.diff(d_i, prepend=-1))
        ends = np.append(starts[1:], len(d_i))
        seg_dst = d_i[starts]
        v = np.full(n, 1.0 / np.float64(n), np.float64)
        base = (1.0 - damping) / np.float64(n)
        for _ in range(iters):
            c = v[s_i] / deg[s_i].astype(np.float64)
            nv = np.full(n, base, np.float64)
            for k in range(len(starts)):
                acc = c[starts[k]]
                for x in c[starts[k] + 1:ends[k]]:
                    acc = acc + x
                nv[seg_dst[k]] = base + damping * acc
            v = nv
        return pd.DataFrame({
            "node": pd.Series(nodes),
            "degree": deg,
            "pagerank": v})

    return edges.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)
