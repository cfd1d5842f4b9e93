"""Partitioned hash join for two large tables.

The reference has no relational joins (SURVEY.md §2.4) — this is an
engine addition for the general two-large-sides case the broadcast
pattern can't serve.  Portable implementation per the Ray guide: tag both
sides with ``_pkey = stable_hash(key) % P``, co-locate with ONE shuffle of
the tagged union, and run a vectorized pandas merge per partition.

Skew note: a hot join key concentrates its partition; the mitigation is
the usual salt-and-replicate (split the hot key's left rows across salts,
replicate the right side's rows per salt).  Not needed for the test
corpora; at 100 TB pass a larger ``num_partitions`` and salt upstream.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_partitions: int = 64,
) -> Dataset:
    """Join two Datasets on equality of ``left_on``/``right_on``.

    ``how``: inner | left | outer (full outer).  Column collisions take
    pandas' default ``_x``/``_y`` suffixes — project/rename upstream for
    exact schemas.  All three are exact under the hash co-partition:
    both sides of a key land in the same partition, so orphan detection
    (left/outer) is partition-local.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"unsupported join type {how!r}")

    def _pa_schema(ds: Dataset) -> pa.Schema:
        s = ds.schema().base_schema
        if isinstance(s, pa.Schema):
            return s
        # pandas-block dataset (from_pandas / map_groups output): infer the
        # Arrow schema from a one-row sample — numpy object dtype is
        # ambiguous (str vs bytes) without looking at a value
        sample = ds.limit(1).to_pandas()
        return pa.Table.from_pandas(sample, preserve_index=False).schema

    left_schema = _pa_schema(left)
    right_schema = _pa_schema(right)
    left_cols = [f.name for f in left_schema]
    right_cols = [f.name for f in right_schema]
    # Dataset.union needs one schema: union of both column sets, each side
    # null-padded for the other's columns (types must agree on shared names)
    all_fields: dict[str, pa.DataType] = {}
    for f in list(left_schema) + list(right_schema):
        if f.name in all_fields and all_fields[f.name] != f.type:
            raise ValueError(
                f"column {f.name!r} has conflicting types across sides: "
                f"{all_fields[f.name]} vs {f.type}"
            )
        all_fields.setdefault(f.name, f.type)
    ordered = list(all_fields)

    def tag(col: str, side: str, own: set[str]):
        def fn(t: pa.Table) -> pa.Table:
            for name in ordered:
                if name not in own:
                    t = t.append_column(name, pa.nulls(t.num_rows, all_fields[name]))
            t = t.select(ordered)
            t = t.append_column("_pkey", _stable_pkey(t[col], num_partitions))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    tagged = left.map_batches(tag(left_on, "l", set(left_cols)), batch_format="pyarrow").union(
        right.map_batches(tag(right_on, "r", set(right_cols)), batch_format="pyarrow")
    )

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == "l"][left_cols]
        r = df[df["_side"] == "r"][right_cols]
        return l.merge(r, left_on=left_on, right_on=right_on, how=how)

    def restore_types(t: pa.Table) -> pa.Table:
        # the null-padded union forces pandas to widen int64 → float64
        # (NaN for the other side's columns); restore every column to its
        # declared Arrow type so the join is type-stable.  Left-join
        # misses surface as NaN → normalized to real nulls first.
        import pyarrow.compute as pc

        cols = {}
        for name in t.column_names:
            c = t[name]
            want = all_fields.get(name)
            if want is not None and c.type != want:
                if pa.types.is_floating(c.type) and not pa.types.is_floating(want):
                    c = pc.if_else(pc.is_nan(c), pa.nulls(len(c), c.type), c)
                c = pc.cast(c, want)
            cols[name] = c
        return pa.table(cols)

    # Bound the sort's input block count: groupby's shuffle scales with
    # input blocks, and callers that loop joins (stages/cluster.py) would
    # otherwise compound block counts round over round (observed: 340
    # tiny blocks → 40 s sorts on a 13-vertex graph).  Shuffle-less
    # coalesce — the groupby re-distributes rows anyway.
    tagged = tagged.repartition(num_partitions, shuffle=False)
    return tagged.groupby("_pkey").map_groups(
        join_partition, batch_format="pandas"
    ).map_batches(restore_types, batch_format="pyarrow")


def _bloom_hashes(keys: pa.ChunkedArray | pa.Array, m_bits: int, k: int):
    """k double-hashed bit positions per key, vectorized (polars xxhash
    seeds 0/1): pos_i = (h1 + i·h2) mod m."""
    import numpy as np
    import polars as pl

    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    s = pl.Series(arr)
    h1 = s.hash(seed=0).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=1).to_numpy().astype(np.uint64) | np.uint64(1)
    m = np.uint64(m_bits)
    return [((h1 + np.uint64(i) * h2) % m) for i in range(k)]


def build_bloom(ds: Dataset, *, key: str, m_bits: int = 1 << 23, k: int = 4):
    """Distributed Bloom filter over ``ds[key]``: per-batch bitmap
    partials OR-merged down to ONE ``m_bits/8``-byte array (1 MiB at the
    default), returned as a ``ray.put`` object ref for map-side probing.

    The reduce moves one bitmap per input block through a single worker —
    bounded by block count, never by key count; the driver holds exactly
    one bitmap.  False-positive rate ≈ (1−e^{−kn/m})^k — size ``m_bits``
    to the expected distinct-key count (≈1% at n=m/10, k=4).
    """
    import numpy as np
    import ray

    nbytes = m_bits // 8

    def batch_bitmap(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pos in _bloom_hashes(t[key], m_bits, k):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.large_binary())})

    def or_merge(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for blob in t["bitmap"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bitmap": pa.array([acc.tobytes()], pa.large_binary())})

    merged = (
        ds.map_batches(batch_bitmap, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(or_merge, batch_format="pyarrow", batch_size=None)
        .take(1)
    )
    bits = np.frombuffer(merged[0]["bitmap"], dtype=np.uint8)
    return ray.put(bits)


def _bloom_probe(keys, bits_ref, m_bits: int, k: int):
    """Vectorized membership probe → bool ndarray (True = maybe-member)."""
    import numpy as np
    import ray

    bits = ray.get(bits_ref)
    ok = np.ones(len(keys), dtype=bool)
    for pos in _bloom_hashes(keys, m_bits, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        ok &= (byte & np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))) != 0
    return ok


def semi_join(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    anti: bool = False,
    num_partitions: int = 64,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
) -> Dataset:
    """Set-membership join: keep left rows whose ``left_on`` value exists
    in ``right[right_on]`` (``anti=True`` inverts — the NOT EXISTS shape
    gap-fill uses internally, exposed as a first-class operator).

    Cheaper than ``hash_join`` by construction: the right side is reduced
    to its per-batch DISTINCT keys before the exchange, so the shuffle
    carries left rows + right's key set only — at 100 TB a membership
    probe against a billion-key set never builds a joined row.  Left rows
    pass through exactly once (no duplication on right-side multiplicity),
    so the output schema is the left schema verbatim.

    ``bloom_bits``: map-side Bloom prefilter.  A bloom over the right
    keys is built first (``build_bloom`` — one broadcast bitmap, default
    sizing via the caller) and probed inside the left's read stage, so
    only bloom HITS (true members + FP-rate strays) ever enter the
    exchange; in ``anti`` mode bloom MISSES are definite non-members and
    bypass the shuffle entirely.  Output is EXACT either way — survivors
    still go through the exact probe; the bloom only shrinks the shuffle.
    Costs one extra pass over the right keys (the bloom build) and, in
    anti mode, a second pass over the left (hit/miss split).
    """
    key_t = [f for f in _schema_of(right) if f.name == right_on]
    if not key_t:
        raise ValueError(f"right side has no column {right_on!r}")

    if bloom_bits is not None:
        bits_ref = build_bloom(right, key=right_on, m_bits=bloom_bits, k=bloom_k)

        def bloom_filter(keep_hits: bool):
            def fn(t: pa.Table) -> pa.Table:
                ok = _bloom_probe(t[left_on], bits_ref, bloom_bits, bloom_k)
                return t.filter(pa.array(ok if keep_hits else ~ok))

            return fn

        hits = left.map_batches(
            bloom_filter(True), batch_format="pyarrow", zero_copy_batch=True
        )
        if anti:
            misses = left.map_batches(
                bloom_filter(False), batch_format="pyarrow", zero_copy_batch=True
            )
            exact = semi_join(
                hits, right, left_on=left_on, right_on=right_on,
                anti=True, num_partitions=num_partitions,
            )
            return misses.union(exact)
        left = hits

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("_pkey", _stable_pkey(t[left_on], num_partitions))
        return t.append_column("_side", pa.array(["l"] * t.num_rows, pa.string()))

    def right_keys(t: pa.Table) -> pa.Table:
        # per-batch dedup combiner: only distinct keys cross the shuffle
        out = t.select([right_on]).group_by([right_on], use_threads=False).aggregate([])
        if right_on != "_rkey":
            out = out.rename_columns(["_rkey"])
        return out.append_column("_pkey", _stable_pkey(out["_rkey"], num_partitions))

    left_schema = _schema_of(left)
    left_cols = [f.name for f in left_schema]

    def widen_left(t: pa.Table) -> pa.Table:
        if "_rkey" not in t.column_names:
            t = t.append_column("_rkey", pa.nulls(t.num_rows, key_t[0].type))
        return t.select(left_cols + ["_rkey", "_pkey", "_side"])

    def widen_right(t: pa.Table) -> pa.Table:
        for f in left_schema:
            t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        t = t.append_column("_side", pa.array(["r"] * t.num_rows, pa.string()))
        return t.select(left_cols + ["_rkey", "_pkey", "_side"])

    tagged = (
        left.map_batches(tag_left, batch_format="pyarrow")
        .map_batches(widen_left, batch_format="pyarrow")
        .union(
            right.map_batches(right_keys, batch_format="pyarrow")
            .map_batches(widen_right, batch_format="pyarrow")
        )
        .repartition(num_partitions, shuffle=False)
    )

    def probe_partition(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.combine_chunks()
        is_l = pc.equal(t["_side"], "l")
        l = t.filter(is_l)
        keys = t.filter(pc.invert(is_l))["_rkey"]
        hit = pc.is_in(l[left_on], value_set=keys.combine_chunks())
        keep = pc.invert(pc.fill_null(hit, False)) if anti else pc.fill_null(hit, False)
        return l.filter(keep).select(left_cols)

    return tagged.groupby("_pkey").map_groups(probe_partition, batch_format="pyarrow")


def anti_join(left: Dataset, right: Dataset, *, left_on: str, right_on: str,
              num_partitions: int = 64, bloom_bits: int | None = None,
              bloom_k: int = 4) -> Dataset:
    """Left rows with NO match in the right side (NOT EXISTS)."""
    return semi_join(left, right, left_on=left_on, right_on=right_on,
                     anti=True, num_partitions=num_partitions,
                     bloom_bits=bloom_bits, bloom_k=bloom_k)


def _schema_of(ds: Dataset) -> pa.Schema:
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s
    sample = ds.limit(1).to_pandas()
    return pa.Table.from_pandas(sample, preserve_index=False).schema


def snapshot_diff(
    old: Dataset,
    new: Dataset,
    *,
    key: str,
    compare_cols: list[str],
    change_col: str = "change",
    num_partitions: int = 64,
) -> Dataset:
    """Reconcile two snapshots of a keyed table: one row per key whose
    state differs — ``change ∈ {added, removed, changed}`` (unchanged
    keys are dropped).  The ingest-idempotence audit tool: what did this
    batch actually do to the table?  (Engine-side sibling of the
    resume manifest diff, pipelines/job.py — there lineage hashes decide
    whether a BUCKET changed; here row content decides per key.
    Reference analog: save/reload equality checks,
    reference test/test_keras.py:85-91.)

    Dataflow: the hash_join union pattern — both sides tagged and
    co-partitioned by hash(key), so classification is one partition-
    local vectorized merge; only keys + compared columns cross the
    exchange.  ``compare_cols`` equality is NULL-safe (two NULLs are
    equal, SQL ``IS NOT DISTINCT FROM``).  Assumes ``key`` is unique
    within each snapshot (first snapshot duplicate wins is NOT defined
    — dedup upstream with ``first_per_key``).
    """
    cols = [key] + compare_cols

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            t = t.append_column("_pkey", _stable_pkey(t[key], num_partitions))
            return t.append_column(
                "_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    tagged = old.map_batches(tag("o"), batch_format="pyarrow").union(
        new.map_batches(tag("n"), batch_format="pyarrow"))

    def diff_partition(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        o = df[df["_side"] == "o"][cols]
        n = df[df["_side"] == "n"][cols]
        m = o.merge(n, on=key, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        added = m["_merge"] == "right_only"
        removed = m["_merge"] == "left_only"
        both = m["_merge"] == "both"
        changed = both.copy()
        if compare_cols:
            eq = np.ones(len(m), dtype=bool)
            for c in compare_cols:
                a = m[f"{c}_o"]
                b = m[f"{c}_n"]
                # NULL-safe: equal values OR both null
                eq &= ((a == b) | (a.isna() & b.isna())).to_numpy()
            changed &= ~eq
        else:
            changed[:] = False
        keep = added | removed | changed
        out = m.loc[keep, [key]].copy()
        out[change_col] = np.select(
            [added[keep], removed[keep]], ["added", "removed"], "changed")
        return out.reset_index(drop=True)

    return tagged.groupby("_pkey").map_groups(diff_partition, batch_format="pandas")


def referential_orphans(
    child: Dataset,
    parent: Dataset,
    *,
    fk: str,
    pk: str,
    relationship: str,
    num_partitions: int = 64,
) -> Dataset:
    """Referential-integrity audit for one FK → PK relationship: how
    many child ROWS (and distinct keys) reference a parent key that does
    not exist.  The data-quality composition of the anti-join
    (:func:`semi_anti_join`) — but counting, so nothing but
    ``(key, partial count)`` rows ever cross the exchange from the child
    side and ``(key)`` rows from the parent side (both pre-deduped per
    batch by a pyarrow group_by combiner).

    Output: one row — ``relationship (string), n_child_rows (int64),
    n_distinct_fk (int64), n_orphan_rows (int64), n_orphan_keys
    (int64)``.  Reference analog: the label↔segment consistency check
    the reference runs when pairing annotation streams with signal
    windows (/root/reference/TSFEDL/data.py:99-154).
    """
    import numpy as np

    def child_partial(t: pa.Table) -> pa.Table:
        out = (
            t.select([fk])
            .group_by([fk], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["_k", "_n"])
        )
        out = out.append_column("_side", pa.array(
            np.zeros(out.num_rows, dtype=np.int8)))
        return out.append_column("_pkey", _stable_pkey(out["_k"], num_partitions))

    def parent_partial(t: pa.Table) -> pa.Table:
        out = (
            t.select([pk])
            .group_by([pk], use_threads=False)
            .aggregate([])
            .rename_columns(["_k"])
        )
        out = out.append_column("_n", pa.array(
            np.zeros(out.num_rows, dtype=np.int64)))
        out = out.append_column("_side", pa.array(
            np.ones(out.num_rows, dtype=np.int8)))
        return out.append_column("_pkey", _stable_pkey(out["_k"], num_partitions))

    both = child.map_batches(
        child_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(parent.map_batches(
        parent_partial, batch_format="pyarrow", zero_copy_batch=True))

    def audit_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_k", sort=False).agg(
            _rows=("_n", "sum"), _par=("_side", "max"))
        is_child = g["_rows"] > 0
        orphan = is_child & (g["_par"] == 0)
        return pd.DataFrame({
            "_cr": pd.Series([int(g["_rows"].sum())], dtype="int64"),
            "_ck": pd.Series([int(is_child.sum())], dtype="int64"),
            "_or": pd.Series([int(g["_rows"][orphan].sum())], dtype="int64"),
            "_ok": pd.Series([int(orphan.sum())], dtype="int64"),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "relationship": [relationship],
            "n_child_rows": pd.Series([df["_cr"].sum()], dtype="int64"),
            "n_distinct_fk": pd.Series([df["_ck"].sum()], dtype="int64"),
            "n_orphan_rows": pd.Series([df["_or"].sum()], dtype="int64"),
            "n_orphan_keys": pd.Series([df["_ok"].sum()], dtype="int64"),
        })

    return (
        both.groupby("_pkey")
        .map_groups(audit_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def salted_join(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    hot_keys: list,
    salt: int = 8,
    how: str = "inner",
    num_partitions: int = 64,
) -> Dataset:
    """Skew-aware :func:`hash_join`: keys in ``hot_keys`` are spread
    across ``salt`` sub-partitions instead of concentrating on one
    worker — the standard mega-key mitigation for joins, sibling of the
    ordered-scan salting in stages/salted.py.

    Mechanics: big-side rows of a hot key get a round-robin salt
    (routing only — the result set is salt-invariant); small-side rows
    of a hot key are REPLICATED to every salt, so each (key, salt)
    sub-partition is self-sufficient.  Both sides then join on an
    exact composite string key ``key '#' salt`` through the plain
    hash_join machinery — no new join code path to trust.  ``hot_keys``
    comes from the caller (profile with stages/distinct.heavy_hitters
    or the key-skew profiler); replication costs ×salt on the hot
    small-side rows only.

    ``how``: inner | left.  A FULL outer join is deliberately
    unsupported: a replicated small-side row that matches nothing
    would surface ``salt`` orphan copies.
    """
    import numpy as np
    import pyarrow.compute as pc

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    hot = list(set(hot_keys))
    if not hot:
        raise ValueError("hot_keys must be non-empty (use hash_join)")

    def _composite(keys: pa.ChunkedArray, salts: np.ndarray) -> pa.Array:
        ks = pc.cast(keys, pa.string())
        ss = pa.array(salts.astype("U"), pa.string())
        return pc.binary_join_element_wise(ks, ss, "#")

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[left_on].to_numpy(zero_copy_only=False)
        is_hot = np.isin(k, hot)
        s = np.zeros(t.num_rows, dtype=np.int64)
        s[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) % salt
        return t.append_column("_slk", _composite(t[left_on], s))

    def expand_right(t: pa.Table) -> pa.Table:
        k = t[right_on].to_numpy(zero_copy_only=False)
        is_hot = np.isin(k, hot)
        cold = t.filter(pa.array(~is_hot))
        cold = cold.append_column(
            "_srk", _composite(cold[right_on],
                               np.zeros(cold.num_rows, dtype=np.int64)))
        hot_t = t.filter(pa.array(is_hot))
        if hot_t.num_rows == 0:
            return cold
        idx = np.repeat(np.arange(hot_t.num_rows), salt)
        rep = hot_t.take(pa.array(idx))
        salts = np.tile(np.arange(salt, dtype=np.int64), hot_t.num_rows)
        rep = rep.append_column("_srk", _composite(rep[right_on], salts))
        return pa.concat_tables([cold, rep])

    l2 = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    r2 = right.map_batches(expand_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = hash_join(l2, r2, left_on="_slk", right_on="_srk",
                       how=how, num_partitions=num_partitions)
    return joined.drop_columns(["_slk", "_srk"])


def join_size(
    left: Dataset,
    right: Dataset,
    *,
    left_on: str,
    right_on: str,
    num_partitions: int = 64,
) -> Dataset:
    """EXACT equi-join cardinality WITHOUT executing the join:
    ``|L ⋈ R| = Σ_k cL(k)·cR(k)`` over per-key row counts — the
    planner-side sizing pass a 100 TB pipeline runs before committing
    to a shuffle join (is the result 10⁶ rows or 10¹² ?).  Only
    ``(key, count)`` partials ever move; the join's rows never
    materialize.

    Same two-side co-partition as :func:`referential_orphans`; the
    per-partition fold is one vectorized count product.  Output: one
    row — ``n_left, n_right, n_join_rows, n_matching_keys (int64)``.
    """
    import numpy as np

    def side_partial(col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            out = (
                t.select([col])
                .group_by([col], use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["_k", "_n"])
            )
            out = out.append_column("_side", pa.array(
                np.full(out.num_rows, side, dtype=np.int8)))
            return out.append_column(
                "_pkey", _stable_pkey(out["_k"], num_partitions))

        return fn

    both = left.map_batches(
        side_partial(left_on, 0), batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(right.map_batches(
        side_partial(right_on, 1), batch_format="pyarrow",
        zero_copy_batch=True))

    def fold_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.pivot_table(index="_k", columns="_side", values="_n",
                           aggfunc="sum", fill_value=0)
        cl = g[0].to_numpy(dtype=np.int64) if 0 in g else np.zeros(len(g), np.int64)
        cr = g[1].to_numpy(dtype=np.int64) if 1 in g else np.zeros(len(g), np.int64)
        return pd.DataFrame({
            "_l": pd.Series([int(cl.sum())], dtype="int64"),
            "_r": pd.Series([int(cr.sum())], dtype="int64"),
            "_j": pd.Series([int((cl * cr).sum())], dtype="int64"),
            "_m": pd.Series([int(((cl > 0) & (cr > 0)).sum())], dtype="int64"),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_left": pd.Series([df["_l"].sum()], dtype="int64"),
            "n_right": pd.Series([df["_r"].sum()], dtype="int64"),
            "n_join_rows": pd.Series([df["_j"].sum()], dtype="int64"),
            "n_matching_keys": pd.Series([df["_m"].sum()], dtype="int64"),
        })

    return (
        both.groupby("_pkey")
        .map_groups(fold_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def broadcast_join(
    large: Dataset,
    small: pa.Table,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> Dataset:
    """Dimension-enrichment join with NO shuffle: the small side (a
    driver-resident Arrow table — dimension tables, lookup maps,
    vocabularies) is sorted once and captured in the map closure (Ray
    ships the serialized closure to the object store once, every task
    reads the same copy), and each large-side batch attaches the
    matching dimension columns via one vectorized ``searchsorted`` —
    the public generic of the nation/region lut pattern the revenue
    pipelines use inline (pipelines/relational.py).

    ``how='inner'`` drops unmatched large rows; ``'left'`` keeps them
    with NULL dimension columns.  The small side's join keys must be
    unique (raises otherwise).  Use :func:`hash_join` when BOTH sides
    are large; this op is for the 1e2–1e6-row dimension class where a
    shuffle would dominate the query.

    Output columns: all large columns + the small side's non-key
    columns (name collisions raise).
    """
    import numpy as np

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    small = small.combine_chunks()
    keys_arr = small[right_on].to_numpy(zero_copy_only=False)
    if len(np.unique(keys_arr)) != len(keys_arr):
        raise ValueError("broadcast_join small side keys must be unique")
    order = np.argsort(keys_arr, kind="mergesort")
    skeys = keys_arr[order]
    payload_cols = [c for c in small.column_names if c != right_on]
    payload = {c: small[c].to_numpy(zero_copy_only=False)[order]
               for c in payload_cols}
    payload_types = {c: small.schema.field(c).type for c in payload_cols}

    def attach(t: pa.Table) -> pa.Table:
        for c in payload_cols:
            if c in t.column_names:
                raise ValueError(f"broadcast_join column collision: {c}")
        lk = t[left_on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, lk)
        ok = (pos < len(skeys))
        ok &= skeys[np.minimum(pos, len(skeys) - 1)] == lk
        if how == "inner":
            t = t.filter(pa.array(ok))
            pos = pos[ok]
            for c in payload_cols:
                t = t.append_column(
                    c, pa.array(payload[c][pos], type=payload_types[c]))
            return t
        out = t
        safe = np.minimum(pos, len(skeys) - 1)
        for c in payload_cols:
            vals = payload[c][safe]
            col = pa.array(vals, type=payload_types[c],
                           mask=~ok)           # unmatched -> NULL
            out = out.append_column(c, col)
        return out

    return large.map_batches(attach, batch_format="pyarrow",
                             zero_copy_batch=True)
