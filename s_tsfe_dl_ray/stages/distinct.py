"""Distinct-cardinality operators: exact count-distinct, top-k-per-group,
and a HyperLogLog sketch for the 100 TB regime.

Count-distinct is the one aggregate the rollup combiner cannot carry as a
scalar partial (it is not associative over counts), so it gets its own
two-stage shape:

1. **per-batch dedup combiner** — one vectorized pyarrow ``group_by`` over
   ``keys + [member]`` collapses each batch to its distinct pairs before
   the shuffle; on repetitive streams this is the same orders-of-magnitude
   exchange reduction the rollup combiner gets (stages/rollup.py §scale);
2. **hash-partition by key** (``_pkey`` pattern) — every key's surviving
   pairs co-locate, so one exact ``count_distinct`` kernel per partition
   finishes the job.  No driver round-trip, no ``Dataset.aggregate``.

The exact path concentrates a key's full distinct set in one partition —
inherent to exactness.  For hot keys at web scale use
``grouped_distinct_approx`` (HyperLogLog): its partial state is
``(key, bucket, max rho)`` rows — at most ``2**p`` per key regardless of
input size — and merges by ``max``, which IS associative, so the sketch
composes with the same combiner/shuffle shape as any rollup metric.

Reference analog: the reference's label-cardinality bookkeeping before
one-hot encoding (data.py's per-class segment counting,
/root/reference/TSFEDL/data.py:99-154) is a small-data count-distinct;
here it is re-expressed as a distributed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .rollup import _stable_pkey


def _dedup_partial(keys: list[str], member_col: str, num_partitions: int):
    def fn(t: pa.Table) -> pa.Table:
        out = (
            t.select(keys + [member_col])
            .group_by(keys + [member_col], use_threads=False)
            .aggregate([])
        )
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    return fn


def grouped_distinct_count(
    ds: Dataset,
    *,
    keys: list[str],
    member_col: str,
    out_col: str = "n_distinct",
    num_partitions: int = 64,
) -> Dataset:
    """Exact ``count(DISTINCT member_col) GROUP BY keys``.

    Returns one row per key group: ``keys… + out_col:int64``.
    """
    if not keys:
        raise ValueError("keys must be non-empty")

    def count_partition(t: pa.Table) -> pa.Table:
        # all pairs for a key are complete within this partition, so the
        # count_distinct kernel is exact; combine_chunks first — group_by
        # over many post-shuffle chunks degrades sharply (CLAUDE.md)
        t = t.combine_chunks()
        out = t.group_by(keys, use_threads=False).aggregate(
            [(member_col, "count_distinct")]
        )
        return out.rename_columns(keys + [out_col])

    return (
        ds.map_batches(
            _dedup_partial(keys, member_col, num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pkey")
        .map_groups(count_partition, batch_format="pyarrow")
    )


def grouped_top_k(
    ds: Dataset,
    *,
    keys: list[str],
    member_col: str,
    k: int = 1,
    count_col: str = "n_rows",
    rank_col: str = "rank",
    num_partitions: int = 64,
) -> Dataset:
    """Top-k most frequent ``member_col`` values per key group, with a
    deterministic tie-break (higher count first, then member ascending).

    Returns ``keys… + member_col + count_col:int64 + rank_col:int64``.

    Shape: per-batch ``(keys, member) → count`` partials (associative) →
    one ``_pkey`` shuffle → vectorized merge + rank per partition.  Only
    (key, member, count) rows cross the exchange.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def count_partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(keys + [member_col])
            .group_by(keys + [member_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        out = out.rename_columns(keys + [member_col, "_cnt"])
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            df.groupby(keys + [member_col], sort=False)["_cnt"]
            .sum()
            .reset_index()
        )
        m = m.sort_values(
            keys + ["_cnt", member_col],
            ascending=[True] * len(keys) + [False, True],
            kind="mergesort",
        )
        m[rank_col] = m.groupby(keys, sort=False).cumcount() + 1
        m = m[m[rank_col] <= k].reset_index(drop=True)
        return m.rename(columns={"_cnt": count_col})

    return (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(rank_partition, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# HyperLogLog — the sketch path for web-scale cardinality
# --------------------------------------------------------------------------


def _hll_rho(members: pa.ChunkedArray | pa.Array, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (bucket, rho) for each member hash: bucket = top ``p``
    bits, rho = 1 + leading-zero count of the remaining ``64-p`` bits
    (clamped to 64-p+1 when they are all zero)."""
    import polars as pl

    arr = members.combine_chunks() if isinstance(members, pa.ChunkedArray) else members
    h = pl.Series(arr).hash(seed=0).to_numpy().astype(np.uint64)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)).astype(np.uint64)
    # exact vectorized bit_length (float64 conversion near 2^63 can round
    # across a power of two and skew the exponent by one — avoid it)
    x = rest.copy()
    bl = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl += (x != 0).astype(np.int64)
    # rho = leading zeros within the 64-p suffix + 1; all-zero suffix
    # clamps to 64-p+1
    rho = np.minimum(64 - bl + 1, 64 - p + 1).astype(np.int64)
    return bucket, rho


def grouped_distinct_approx(
    ds: Dataset,
    *,
    keys: list[str],
    member_col: str,
    out_col: str = "n_distinct_approx",
    p: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """HyperLogLog ``count(DISTINCT member_col) GROUP BY keys`` — relative
    error ≈ 1.04/sqrt(2**p) (~3.2% at p=10), with linear-counting small-
    range correction.

    Partial state per batch: ``(keys, bucket, rho_max)`` rows — bounded by
    ``2**p`` per key per batch and merged by ``max`` (associative), so a
    hot key's sketch stays O(2**p) through the shuffle no matter how many
    raw rows it has.  This is the scale path where
    ``grouped_distinct_count`` would concentrate the key's full distinct
    set on one worker.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def sketch_partial(t: pa.Table) -> pa.Table:
        bucket, rho = _hll_rho(t[member_col], p)
        st = t.select(keys).append_column("_bucket", pa.array(bucket))
        st = st.append_column("_rho", pa.array(rho))
        out = st.group_by(keys + ["_bucket"], use_threads=False).aggregate(
            [("_rho", "max")]
        )
        out = out.rename_columns(keys + ["_bucket", "_rho"])
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def estimate_partition(df: pd.DataFrame) -> pd.DataFrame:
        regs = (
            df.groupby(keys + ["_bucket"], sort=False)["_rho"].max().reset_index()
        )
        g = regs.groupby(keys, sort=False)
        # raw HLL estimate: alpha * m^2 / (zero-register mass + sum 2^-rho)
        inv = g["_rho"].apply(lambda r: np.sum(np.exp2(-r.to_numpy(dtype=np.float64))))
        nonzero = g.size()
        z = (m - nonzero).astype(np.float64)  # registers never touched
        est = alpha * m * m / (z + inv)
        # linear counting when the estimate is small and zeros remain
        lc = m * np.log(m / z.where(z > 0, np.nan))
        est = est.where(~((est <= 2.5 * m) & (z > 0)), lc)
        out = nonzero.reset_index()[keys]
        out[out_col] = np.rint(est.to_numpy()).astype(np.int64)
        return out

    return (
        ds.map_batches(sketch_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(estimate_partition, batch_format="pandas")
    )


def heavy_hitters(
    ds: Dataset,
    *,
    col: str,
    capacity: int = 1024,
    k: int = 20,
    merge_partitions: int = 32,
) -> Dataset:
    """Approximate global heavy hitters (Misra–Gries / SpaceSaving
    family): the items of ``col`` whose frequency exceeds ~n/capacity,
    with per-item count bounds — the bounded-memory sibling of the exact
    ``text.top_tokens`` word count, for when the distinct universe
    (tokens, URLs, user agents) is too large to shuffle exactly.

    Each batch reduces to an EXACT local count trimmed to the largest
    ``capacity`` items via the Misra–Gries decrement (subtract the
    (capacity+1)-th count, drop ≤0, add it to the summary's error
    bound).  Summaries merge associatively — sum counts, sum error
    bounds, trim again — through a TWO-LEVEL tree (``merge_partitions``
    intermediate reducers, then one final merge of ≤ merge_partitions ×
    capacity rows), so no stage ever sees more than
    ``capacity × fan-in`` rows regardless of corpus size.  Guarantee:
    ``count_lo ≤ true ≤ count_hi`` for every reported item, and any item
    with true count > final error bound is present in the summary.

    Output: ``k`` rows — ``col, count_lo, count_hi`` (int64), ranked by
    count_lo desc, ties by value asc.  No SQL twin (the exact result is
    sketch-state-dependent); tests pin the bound guarantees against the
    exact count.
    """
    import os

    def _trim(vals: np.ndarray, cnts: np.ndarray, err: int) -> tuple:
        if len(cnts) <= capacity:
            return vals, cnts, err
        kth = np.partition(cnts, len(cnts) - capacity - 1)[len(cnts) - capacity - 1]
        keep = cnts > kth
        return vals[keep], cnts[keep] - kth, err + int(kth)

    def _summary_table(vals, cnts, err, col_type, pid) -> pa.Table:
        n = len(vals)
        return pa.table({
            col: pa.array(vals, col_type),
            "_cnt": pa.array(np.asarray(cnts, dtype=np.int64)),
            "_err": pa.array(np.full(n, err, dtype=np.int64)),
            "_pid": pa.array(np.full(n, pid, dtype=np.int64)),
        })

    def _merge_rows(df: pd.DataFrame) -> tuple:
        # one error bound per SOURCE summary (constant on its rows):
        # count each source exactly once via its unique _pid
        err = int(df.drop_duplicates(subset=["_pid"])["_err"].sum())
        g = df.groupby(col, sort=False)["_cnt"].sum().reset_index()
        return _trim(g[col].to_numpy(), g["_cnt"].to_numpy().astype(np.int64), err)

    def partial(t: pa.Table) -> pa.Table:
        counts = t.select([col]).group_by([col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        vals = counts[col].to_numpy(zero_copy_only=False)
        cnts = counts["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts, err = _trim(vals, cnts, 0)
        # pid must be unique ACROSS worker processes (a per-process
        # counter alone would collide and undercount merged error bounds)
        pid = (os.getpid() << 24) ^ next(_HH_COUNTER)
        out = _summary_table(vals, cnts, err, t[col].type, pid)
        return out.append_column(
            "_mgrp", pa.array(np.full(out.num_rows, pid % merge_partitions,
                                      dtype=np.int64))
        )

    def mid_merge(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnts, err = _merge_rows(df)
        grp = int(df["_mgrp"].iloc[0]) if len(df) else 0
        out = pd.DataFrame({col: vals, "_cnt": cnts})
        out["_err"] = np.int64(err)
        out["_pid"] = np.int64(grp)  # unique per group at this level
        return out

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnts, err = _merge_rows(df)
        out = pd.DataFrame({col: vals, "count_lo": cnts.astype(np.int64)})
        out["count_hi"] = out["count_lo"] + np.int64(err)
        return out.sort_values(["count_lo", col], ascending=[False, True],
                               kind="mergesort").head(k).reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_mgrp")
        .map_groups(mid_merge, batch_format="pandas")
        .repartition(1)
        # repartition(1) + batch_size=None ⇒ the final merge sees ALL
        # intermediate rows (≤ merge_partitions × capacity) as one batch
        .map_batches(final_merge, batch_format="pandas", batch_size=None)
    )


import itertools as _itertools

_HH_COUNTER = _itertools.count()


def mode_per_key(
    ds: "Dataset",
    *,
    key: str,
    cat_col: str,
    mode_col: str = "mode_type",
    n_col: str = "n_mode",
    num_partitions: int = 64,
) -> "Dataset":
    """Per-key MODE of a categorical column with a deterministic
    tie-break (highest count, then lexicographically smallest category) —
    the "what does this key mostly do" summary, the categorical sibling
    of the rollup's numeric aggregates.

    Combiner discipline: per-batch ``group_by(key, cat)`` counts collapse
    each batch to its distinct pairs (bounded by keys × categories, not
    rows); one ``_pkey`` exchange by key; the per-partition merge sums
    counts and takes the argmax vectorized (sort + drop_duplicates), so
    the tie-break is explicit, not hash-order luck.  Output:
    ``key, mode_col, n_col``.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .rollup import _stable_pkey

    def partial(t: pa.Table) -> pa.Table:
        out = pa.table({key: t[key], cat_col: t[cat_col]}) \
            .group_by([key, cat_col], use_threads=False) \
            .aggregate([([], "count_all")])
        out = pa.table({key: out[key], cat_col: out[cat_col],
                        "_n": pc.cast(out["count_all"], pa.int64())})
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, cat_col], sort=False)["_n"].sum().reset_index()
        g = g.sort_values([key, "_n", cat_col],
                          ascending=[True, False, True], kind="mergesort")
        g = g.drop_duplicates(subset=[key], keep="first")
        return pd.DataFrame({key: g[key].to_numpy(),
                             mode_col: g[cat_col].to_numpy(),
                             n_col: g["_n"].to_numpy(dtype="int64")})

    tagged = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_pkey").map_groups(merge, batch_format="pandas")


def categorical_concentration(
    ds: "Dataset",
    *,
    group_col: str,
    member_col: str,
    num_partitions: int = 64,
) -> "Dataset":
    """Per-group concentration profile of a categorical column: member
    count, Herfindahl–Hirschman index ``Σ share²``, Shannon entropy
    ``−Σ p·ln p`` and the top member's share — the one-pass "is this
    group dominated by one member or spread out" summary (daily traffic
    concentration, per-user behavioral entropy).

    Combiner discipline: per-batch ``group_by(group, member)`` counts
    (bounded by groups × members, not rows) → one ``_pkey`` exchange by
    group → vectorized per-partition share math from EXACT merged int
    counts.  Output: ``group_col, n_rows, n_members, hhi, entropy,
    top_share``.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .rollup import _stable_pkey

    def partial(t: pa.Table) -> pa.Table:
        out = pa.table({group_col: t[group_col], member_col: t[member_col]}) \
            .group_by([group_col, member_col], use_threads=False) \
            .aggregate([([], "count_all")])
        out = pa.table({group_col: out[group_col], member_col: out[member_col],
                        "_n": pc.cast(out["count_all"], pa.int64())})
        return out.append_column("_pkey",
                                 _stable_pkey(out[group_col], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, member_col], sort=False)["_n"] \
            .sum().reset_index()
        tot = g.groupby(group_col, sort=False)["_n"].transform("sum")
        p = g["_n"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64)
        agg = pd.DataFrame({
            group_col: g[group_col],
            "_tot": tot,
            "_p2": p * p,
            "_plnp": p * np.log(p),
            "_p": p,
        }).groupby(group_col, sort=False).agg(
            n_rows=("_tot", "first"), n_members=("_p", "size"),
            hhi=("_p2", "sum"), nent=("_plnp", "sum"), top_share=("_p", "max"),
        ).reset_index()
        return pd.DataFrame({
            group_col: agg[group_col],
            "n_rows": agg["n_rows"].astype(np.int64),
            "n_members": agg["n_members"].astype(np.int64),
            "hhi": agg["hhi"],
            "entropy": -agg["nent"].to_numpy(),
            "top_share": agg["top_share"],
        })

    tagged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    return tagged.groupby("_pkey").map_groups(merge, batch_format="pandas")


def pair_cooccurrence(
    ds: Dataset,
    *,
    group_col: str,
    member_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Market-basket pair co-occurrence: for every unordered pair of
    members sharing a group, the number of groups containing both, plus
    lift and Jaccard association scores.

    The association-rule / co-engagement primitive (which event types
    co-occur for the same user; which tags co-occur on the same doc) —
    the set-similarity sibling of :func:`~.trend.cross_series_corr`,
    which correlates counts over time rather than set membership.

    Shape (three combiner passes, no driver loop over data):

    1. distinct ``(group, member)`` base — per-batch pyarrow dedup, one
       ``_pkey(group)`` exchange, partition-level dedup (exact under
       key-complete co-location);
    2. pair expansion INSIDE each partition — a vectorized self-merge on
       the group column (blow-up bounded by members-per-group², i.e. the
       categorical vocabulary, not the row count), pre-counted locally;
       one small (member_a)-hash exchange merges pair counts;
    3. denominators — per-member group counts via
       :func:`grouped_distinct_count` (vocabulary-sized result, pulled to
       the driver and BROADCAST into the final map — never a shuffle) and
       the total distinct-group count via the same op on a constant key.

    Partitioning assumption (documented per the custom-operator rule):
    the member vocabulary is categorical (≤ ~10⁵ values), so the pair
    table and the per-member count table are small; groups may number in
    the billions.  Output: ``member_a, member_b, n_both, lift, jaccard``
    with ``lift = n_both·n_groups/(n_a·n_b)`` (>1: attract, <1: repel).
    """
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def batch_distinct(t: pa.Table) -> pa.Table:
        out = (t.select([group_col, member_col])
               .group_by([group_col, member_col], use_threads=False)
               .aggregate([]))
        return out.append_column("_pkey", _stable_pkey(out[group_col], num_partitions))

    base = ds.map_batches(batch_distinct, batch_format="pyarrow",
                          zero_copy_batch=True)

    a, b = f"{member_col}_x", f"{member_col}_y"

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).drop_duplicates([group_col, member_col])
        m = df.merge(df, on=group_col)
        m = m[m[a] < m[b]]
        out = m.groupby([a, b], sort=False).size().reset_index(name="n_both")
        out.columns = ["member_a", "member_b", "n_both"]
        out["n_both"] = out["n_both"].astype("int64")
        return out

    pair_partials = base.groupby("_pkey").map_groups(
        pairs_partition, batch_format="pandas")
    pairs = _grouped_min(pair_partials, group_cols=["member_a", "member_b"],
                         agg_cols=[("n_both", "sum")], pkey_col="member_a",
                         num_partitions=num_partitions)

    # vocabulary-sized small sides (driver pull is bounded by the vocab,
    # not the data): per-member group counts + total group count
    member_counts = grouped_distinct_count(
        ds, keys=[member_col], member_col=group_col, out_col="n_groups",
        num_partitions=num_partitions).to_pandas()
    counts = dict(zip(member_counts[member_col], member_counts["n_groups"]))

    total_ds = ds.map_batches(
        lambda t: t.select([group_col]).append_column(
            "_all", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow", zero_copy_batch=True)
    n_groups = int(grouped_distinct_count(
        total_ds, keys=["_all"], member_col=group_col, out_col="n",
        num_partitions=num_partitions).to_pandas()["n"].iloc[0])

    def score(t: pa.Table) -> pa.Table:
        ma = t["member_a"].to_pylist()
        mb = t["member_b"].to_pylist()
        nb = t["n_both"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([counts[x] for x in ma], dtype=np.float64)
        nbm = np.array([counts[x] for x in mb], dtype=np.float64)
        lift = (nb * float(n_groups)) / (na * nbm)
        jac = nb / (na + nbm - nb)
        return pa.table({
            "member_a": t["member_a"], "member_b": t["member_b"],
            "n_both": t["n_both"],
            "lift": pa.array(lift, pa.float64()),
            "jaccard": pa.array(jac, pa.float64()),
        })

    return pairs.map_batches(score, batch_format="pyarrow")


def benford_profile(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    scale: int = 100,
    num_partitions: int = 16,
) -> Dataset:
    """First-significant-digit distribution per group against Benford's
    law — the classic fabricated/synthetic-data forensics check over a
    positive-valued measure column.

    The leading digit is extracted from the EXACT scaled integer
    ``round(v·scale)`` by repeated integer division (never a float
    ``log10``, whose libm boundaries at powers of ten could flip a
    digit), so both sides bucket identically.  Rows with a non-positive
    scaled value are excluded.  Per-batch (group, digit) partials →
    one group-hash merge → a |groups|×9 final fold.
    Output: ``group_col, digit, n, frac, benford_p``.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        k = np.round(v * scale).astype(np.int64)
        pos = k > 0
        k = k[pos]
        grp = t[group_col].filter(pa.array(pos))
        for _ in range(18):
            big = k >= 10
            if not big.any():
                break
            k[big] //= 10
        tbl = pa.table({group_col: grp, "digit": pa.array(k),
                        "n": pa.array(np.ones(len(k), dtype=np.int64))})
        out = tbl.group_by([group_col, "digit"], use_threads=False) \
                 .aggregate([("n", "sum")])
        return out.rename_columns([group_col, "digit", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = _grouped_min(partials, group_cols=[group_col, "digit"],
                          agg_cols=[("n", "sum")], pkey_col=group_col,
                          num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"], errors="ignore")
        df = df.sort_values([group_col, "digit"]).reset_index(drop=True)
        tot = df.groupby(group_col, sort=False)["n"].transform("sum")
        d = df["digit"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            group_col: df[group_col],
            "digit": df["digit"].astype("int64"),
            "n": df["n"].astype("int64"),
            "frac": df["n"] / tot,
            "benford_p": np.log10(1 + 1.0 / d),
        })

    return merged.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def key_skew_profile(
    ds: Dataset,
    *,
    key: str,
    num_partitions: int = 64,
) -> Dataset:
    """One-row skew diagnostic of a prospective partition key — the
    numbers the engine's own salting / bucketing decisions are made
    from (stages/salted.py picks ``salt_every`` off exactly this
    shape): key cardinality, row count, max/median/p99 rows-per-key,
    hottest-key share, and the HHI concentration of rows over keys.

    Dataflow: per-batch (key, n) partials → one key-hash merge → each
    merge partition folds its keys to a (rows_per_key → n_keys)
    HISTOGRAM, so the final partition sees count-values, not keys —
    bounded by the distinct per-key-count values, not key cardinality.
    Quantiles use the engine's exact ``quantile_disc`` rule
    (first value whose cumulative key count reaches ``ceil(K·q)``).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        out = t.select([key]).group_by(key, use_threads=False) \
               .aggregate([([], "count_all")])
        return out.rename_columns([key, "n"])

    counts = _grouped_min(ds.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True),
                          group_cols=[key], agg_cols=[("n", "sum")],
                          pkey_col=key, num_partitions=num_partitions)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", sort=False).size().reset_index(name="n_keys")
        g["n_rows"] = g["n"] * g["n_keys"]
        g["n_sq"] = g["n"] * g["n"] * g["n_keys"]
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", sort=True).agg(
            n_keys=("n_keys", "sum"), n_rows=("n_rows", "sum"),
            n_sq=("n_sq", "sum")).reset_index()
        k_tot = int(g["n_keys"].sum())
        rows = int(g["n_rows"].sum())
        sq = int(g["n_sq"].sum())
        mx = int(g["n"].max())
        cum = g["n_keys"].cumsum()

        def qdisc(q: float) -> int:
            target = max(int(np.ceil(k_tot * q)), 1)
            return int(g.loc[cum >= target, "n"].iloc[0])

        return pd.DataFrame({
            "n_keys": pd.Series([k_tot], dtype="int64"),
            "n_rows": pd.Series([rows], dtype="int64"),
            "max_per_key": pd.Series([mx], dtype="int64"),
            "p50_per_key": pd.Series([qdisc(0.5)], dtype="int64"),
            "p99_per_key": pd.Series([qdisc(0.99)], dtype="int64"),
            "top1_share": [mx / rows] if rows else [np.nan],
            "hhi": [sq / (rows * rows)] if rows else [np.nan],
        })

    return (counts.map_batches(hist, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def column_profile(
    ds: Dataset,
    *,
    columns: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Long-format data-quality profile — the validation pass a pipeline
    runs on every new partition drop before trusting it: per column,
    row/null counts, EXACT distinct cardinality, and min/max (numeric
    columns report ``min_num``/``max_num`` as float64; string columns
    report lexicographic ``min_str``/``max_str``; the other pair is
    NULL).  The profiling sibling of ``schema.check_inputs`` (which
    validates shape; this validates content).

    Shape: counts and extrema fold in ONE combiner pass over all
    columns at once (each batch emits |columns| partial rows); distinct
    cardinality needs value co-location, so each column gets its own
    per-batch-dedup + ``_pkey`` exchange (the
    :func:`grouped_distinct_count` discipline) — |columns| narrow
    exchanges of distinct values only, never raw rows.  Everything
    meets in one tiny final join keyed by column name.
    Output: ``col, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str`` sorted by col.
    """
    import pyarrow.compute as pc

    num_cols = set()
    schema = ds.schema().base_schema
    for f in schema:
        if f.name in columns and (pa.types.is_integer(f.type)
                                  or pa.types.is_floating(f.type)):
            num_cols.add(f.name)

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {"col": [], "n_rows": [], "n_nulls": [],
                "min_num": [], "max_num": [], "min_str": [], "max_str": []}
        for c in columns:
            arr = t[c]
            rows["col"].append(c)
            rows["n_rows"].append(len(arr))
            rows["n_nulls"].append(arr.null_count)
            if c in num_cols:
                mm = pc.min_max(arr)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                rows["min_num"].append(None if mn is None else float(mn))
                rows["max_num"].append(None if mx is None else float(mx))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                mm = pc.min_max(arr)
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["min_str"].append(mm["min"].as_py())
                rows["max_str"].append(mm["max"].as_py())
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "n_rows": pa.array(rows["n_rows"], pa.int64()),
            "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
            "min_num": pa.array(rows["min_num"], pa.float64()),
            "max_num": pa.array(rows["max_num"], pa.float64()),
            "min_str": pa.array(rows["min_str"], pa.string()),
            "max_str": pa.array(rows["max_str"], pa.string()),
        })

    from .dedup import _grouped_min

    stats = _grouped_min(
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["col"],
        agg_cols=[("n_rows", "sum"), ("n_nulls", "sum"),
                  ("min_num", "min"), ("max_num", "max"),
                  ("min_str", "min"), ("max_str", "max")],
        pkey_col="col", num_partitions=1)

    def distinct_for(c: str) -> Dataset:
        def batch_distinct(t: pa.Table) -> pa.Table:
            vals = t.select([c]).combine_chunks()
            d = vals.group_by([c], use_threads=False).aggregate([])
            d = d.filter(pc.is_valid(d[c]))
            return d.rename_columns(["v"])

        dd = ds.map_batches(batch_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
        uniq = _grouped_min(
            dd.map_batches(
                lambda t: t.append_column("one", pa.array(
                    np.ones(t.num_rows, dtype=np.int64))),
                batch_format="pyarrow"),
            group_cols=["v"], agg_cols=[("one", "min")], pkey_col="v",
            num_partitions=num_partitions)

        def count_partial(t: pa.Table) -> pa.Table:
            return pa.table({"col": pa.array([c], pa.string()),
                             "n_distinct": pa.array([t.num_rows], pa.int64())})

        return _grouped_min(
            uniq.map_batches(count_partial, batch_format="pyarrow"),
            group_cols=["col"], agg_cols=[("n_distinct", "sum")],
            pkey_col="col", num_partitions=1)

    dist = distinct_for(columns[0])
    for c in columns[1:]:
        dist = dist.union(distinct_for(c))

    from .join import hash_join

    j = hash_join(stats, dist, left_on="col", right_on="col",
                  num_partitions=1)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("col", kind="mergesort").reset_index(drop=True)
        return df[["col", "n_rows", "n_nulls", "n_distinct",
                   "min_num", "max_num", "min_str", "max_str"]]

    return j.repartition(1).map_batches(fin, batch_format="pandas",
                                        batch_size=None)


def decayed_counts(
    ds: Dataset,
    *,
    key_col: str,
    ts_col: str,
    half_life_us: int = 43_200_000_000,
    num_partitions: int = 8,
) -> Dataset:
    """Exponentially time-decayed counts per key at the corpus horizon —
    the "what's hot NOW" popularity ranking (each event contributes
    ``2^(−age/half_life)`` where age is measured from the corpus max
    timestamp), the streaming-decay sibling of plain value counts.

    Two passes: a cheap pruned scan finds the global horizon T (one
    column, one max — the only driver-side scalar), then one combiner
    pass folds per-batch partial sums of ``pow(2, −(T−t)/hl)``; the
    exchange carries one float per (batch, key).  Term order differs
    from a sequential sum but every term is in [0,1] — accumulation
    error ~1e-13·n, far below 6-decimal rounding.
    Output: ``key, n_events, decayed_count``.
    """
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    horizon = ds.max(ts_col)
    t_us = pa.scalar(horizon, pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
        dt = np.asarray(pc.subtract(pa.scalar(t_us, pa.int64()),
                                    pc.cast(ts, pa.int64())))
        w = np.power(2.0, -(dt.astype(np.float64) / float(half_life_us)))
        tbl = pa.table({key_col: t[key_col],
                        "n_events": pa.array(np.ones(len(w), np.int64)),
                        "decayed_count": pa.array(w)})
        return tbl.combine_chunks().group_by(
            [key_col], use_threads=False).aggregate(
            [("n_events", "sum"), ("decayed_count", "sum")]
        ).rename_columns([key_col, "n_events", "decayed_count"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _grouped_min(partials, group_cols=[key_col],
                        agg_cols=[("n_events", "sum"),
                                  ("decayed_count", "sum")],
                        pkey_col=key_col, num_partitions=num_partitions)


def chi2_independence(
    ds: Dataset,
    *,
    col_a: str,
    col_b: str,
    num_partitions: int = 8,
) -> Dataset:
    """Pearson χ² test of independence between two categorical columns
    (+ Cramér's V effect size) — the "is lang balanced across sources /
    is event mix drifting across cohorts" check run before trusting a
    stratified split.

    One combiner pass folds per-batch (a, b) counts; the contingency
    matrix (|a|×|b| — categorical cardinalities, tiny by assumption)
    finalizes in a single partition: expected = rowsum·colsum/n over ALL
    cells including unobserved zeros, χ² = Σ(O−E)²/E, dof=(r−1)(c−1),
    V = √(χ²/(n·min(r−1,c−1))) (NULL when either axis is constant).
    Output: one row ``n, dof, chi2, cramers_v``.
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"a": t[col_a], "b": t[col_b]})
        out = tbl.combine_chunks().group_by(
            ["a", "b"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["a", "b"], agg_cols=[("o", "sum")], pkey_col="a",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="a", columns="b", values="o",
                             aggfunc="sum", fill_value=0).sort_index()
        obs = piv.to_numpy(dtype=np.float64)
        rs = obs.sum(axis=1)
        cs = obs.sum(axis=0)
        n = obs.sum()
        e = np.outer(rs, cs) / n
        chi2 = float(((obs - e) ** 2 / e).sum())
        r, c = obs.shape
        dof = (r - 1) * (c - 1)
        k = min(r - 1, c - 1)
        v = float(np.sqrt(chi2 / (n * k))) if k > 0 else np.nan
        return pd.DataFrame({"n": pd.Series([int(n)], dtype="int64"),
                             "dof": pd.Series([dof], dtype="int64"),
                             "chi2": [chi2], "cramers_v": [v]})

    return counts.repartition(1).map_batches(fin, batch_format="pandas",
                                             batch_size=None)


def categorical_association(
    ds: Dataset,
    *,
    col_a: str,
    col_b: str,
    num_partitions: int = 8,
) -> Dataset:
    """Full association readout between two categorical columns: Pearson
    χ² + Cramér's V (symmetric effect size) + Theil's uncertainty
    coefficients U(A|B) and U(B|A) (asymmetric, entropy-based) — the
    feature-selection screen that answers "does knowing B reduce
    uncertainty about A?" where Cramér's V alone hides direction.

    Same combiner shape as :func:`chi2_independence`: per-batch (a, b)
    counts fold through one hash-partitioned exchange; the tiny |a|×|b|
    contingency matrix finalizes on one partition.  Definitions (natural
    log, observed cells only — 0·ln 0 ≡ 0):

    - ``H(A) = −Σ_a (rs/n)·ln(rs/n)``; ``H(A|B) = −Σ_{a,b} (o/n)·ln(o/cs)``
    - ``U(A|B) = (H(A) − H(A|B)) / H(A)`` — NULL when H(A)=0 (constant A).

    Output: one row ``n, r_cats, c_cats, dof, chi2, cramers_v,
    theils_u_ab, theils_u_ba``.  NULL propagation through the fixed
    expression tree relies on np.float64 0/0 → nan == SQL NULL (the
    granger/ab_ztest recipe).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"a": t[col_a], "b": t[col_b]})
        out = tbl.combine_chunks().group_by(
            ["a", "b"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["a", "b"], agg_cols=[("o", "sum")], pkey_col="a",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="a", columns="b", values="o",
                             aggfunc="sum", fill_value=0).sort_index()
        obs = piv.to_numpy(dtype=np.float64)
        rs = obs.sum(axis=1)
        cs = obs.sum(axis=0)
        n = obs.sum()
        e = np.outer(rs, cs) / n
        chi2 = float(((obs - e) ** 2 / e).sum())
        r, c = obs.shape
        dof = (r - 1) * (c - 1)
        k = min(r - 1, c - 1)
        v = float(np.sqrt(chi2 / (n * k))) if k > 0 else np.nan
        # entropies over observed cells (0 ln 0 = 0 by masking)
        pa_ = rs / n
        pb_ = cs / n
        ha = float(-(pa_ * np.log(pa_)).sum())
        hb = float(-(pb_ * np.log(pb_)).sum())
        nz = obs > 0
        pj = obs / n
        with np.errstate(divide="ignore", invalid="ignore"):
            hab = float(-(pj * np.log(obs / cs[None, :]))[nz].sum())
            hba = float(-(pj * np.log(obs / rs[:, None]))[nz].sum())
            u_ab = float((np.float64(ha) - np.float64(hab))
                         / np.float64(ha))
            u_ba = float((np.float64(hb) - np.float64(hba))
                         / np.float64(hb))
        return pd.DataFrame({
            "n": pd.Series([int(n)], dtype="int64"),
            "r_cats": pd.Series([r], dtype="int64"),
            "c_cats": pd.Series([c], dtype="int64"),
            "dof": pd.Series([dof], dtype="int64"),
            "chi2": [chi2], "cramers_v": [v],
            "theils_u_ab": [u_ab], "theils_u_ba": [u_ba]})

    return counts.repartition(1).map_batches(fin, batch_format="pandas",
                                             batch_size=None)


def count_min_sketch(
    ds: Dataset,
    *,
    col: str,
    query_items: list,
    width: int = 2048,
    depth: int = 4,
    out_col: str = "est_count",
) -> Dataset:
    """Count-min point-frequency estimates: ``est(x) = min_d
    sketch[d, h_d(x)]`` with the classic one-sided guarantee
    ``true ≤ est ≤ true + e·N/width`` (w.h.p. over the ``depth``
    hashes) — the frequency sibling of the engine's HLL (cardinality)
    and Misra–Gries (top-k) sketches, for point lookups over a universe
    too large to count exactly.

    Scale shape: each batch folds to ≤ depth×width ``(d, bucket, cnt)``
    rows (one polars seeded-hash + bincount per depth row — no Python
    loop); partials merge by SUM (associative) into the tiny dense
    sketch on one final partition, where the broadcast ``query_items``
    are probed.  Output: ``item (string), <out_col> (int64)`` per query
    item.  No SQL twin (estimates are hash-dependent); tests pin the
    never-undercount and bounded-overcount guarantees against exact
    counts.
    """
    import polars as pl
    import pyarrow.compute as pc

    if width < 8 or depth < 1:
        raise ValueError("width >= 8 and depth >= 1 required")
    items = [str(x) for x in query_items]
    if not items:
        raise ValueError("query_items must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        s = pl.Series(pc.cast(vals, pa.string()))
        ds_, bs_, cs_ = [], [], []
        for d in range(depth):
            b = (s.hash(seed=d).to_numpy().astype(np.uint64)
                 % np.uint64(width)).astype(np.int64)
            cnt = np.bincount(b, minlength=width)
            nz = np.flatnonzero(cnt)
            ds_.append(np.full(len(nz), d, dtype=np.int64))
            bs_.append(nz.astype(np.int64))
            cs_.append(cnt[nz].astype(np.int64))
        return pa.table({
            "_d": pa.array(np.concatenate(ds_)),
            "_b": pa.array(np.concatenate(bs_)),
            "_c": pa.array(np.concatenate(cs_)),
        })

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        sk = np.zeros((depth, width), dtype=np.int64)
        g = df.groupby(["_d", "_b"], sort=False)["_c"].sum()
        idx = np.array([*g.index.to_numpy()])
        sk[idx[:, 0], idx[:, 1]] = g.to_numpy()
        qs = pl.Series(items)
        ests = np.full(len(items), np.iinfo(np.int64).max)
        for d in range(depth):
            b = (qs.hash(seed=d).to_numpy().astype(np.uint64)
                 % np.uint64(width)).astype(np.int64)
            ests = np.minimum(ests, sk[d, b])
        return pd.DataFrame({"item": items,
                             out_col: ests.astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(estimate, batch_format="pandas", batch_size=None)
    )


def k_anonymity_audit(
    ds: Dataset,
    *,
    qi_cols: list[str],
    k: int = 5,
    num_partitions: int = 64,
) -> Dataset:
    """k-anonymity audit over a quasi-identifier combination: how many
    equivalence classes (distinct QI tuples) have fewer than ``k``
    records — the governance gate a training-data release runs before
    shipping (small classes re-identify individuals).

    Same combiner shape as :func:`grouped_distinct_count`: per-batch
    ``(QI…) → count`` partials, one QI-hash exchange, per-partition
    class totals, then a tiny scalar fold.  Output: one row —
    ``n_rows, n_classes, n_risky_classes, n_risky_rows,
    min_class_size (all int64)``.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")

    def partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(qi_cols)
            .group_by(qi_cols, use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(qi_cols + ["_n"])
        )
        return out.append_column(
            "_pkey", _stable_pkey(out[qi_cols[0]], num_partitions))

    def classes_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(qi_cols, sort=False)["_n"].sum()
        risky = g < k
        return pd.DataFrame({
            "_rows": pd.Series([int(g.sum())], dtype="int64"),
            "_cls": pd.Series([len(g)], dtype="int64"),
            "_rc": pd.Series([int(risky.sum())], dtype="int64"),
            "_rr": pd.Series([int(g[risky].sum())], dtype="int64"),
            "_min": pd.Series([int(g.min())], dtype="int64"),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": pd.Series([df["_rows"].sum()], dtype="int64"),
            "n_classes": pd.Series([df["_cls"].sum()], dtype="int64"),
            "n_risky_classes": pd.Series([df["_rc"].sum()], dtype="int64"),
            "n_risky_rows": pd.Series([df["_rr"].sum()], dtype="int64"),
            "min_class_size": pd.Series([df["_min"].min()], dtype="int64"),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(classes_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def mutual_information(
    ds: Dataset,
    *,
    col_a: str,
    col_b: str,
    num_partitions: int = 8,
) -> Dataset:
    """Mutual information (nats) between two categorical columns, plus
    the normalized variant NMI = MI/√(H_a·H_b) — the information-
    theoretic effect size next to :func:`chi2_independence`'s Cramér's V
    (feature-relevance screening: how much does knowing A tell you
    about B?).

    Same contingency discipline: per-batch (a, b) count partials, tiny
    single-partition finalize over the |a|×|b| table.  Counts are exact
    ints; the per-cell term ``(o/n)·ln(o·n/(r_a·c_b))`` and the marginal
    entropies mirror the SQL twin's expression tree (unobserved cells
    contribute nothing on either side).  Output: one row — ``n (int64),
    mi (float64), nmi (float64)`` (NULL nmi when either marginal is
    constant).
    """
    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        tbl = pa.table({"a": t[col_a], "b": t[col_b]})
        out = tbl.combine_chunks().group_by(
            ["a", "b"], use_threads=False).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "o"])

    counts = _grouped_min(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_cols=["a", "b"], agg_cols=[("o", "sum")], pkey_col="a",
        num_partitions=num_partitions)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n": pd.Series([], dtype="int64"),
            "mi": pd.Series([], dtype="float64"),
            "nmi": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby(["a", "b"], sort=True)["o"].sum().reset_index()
        o = g["o"].to_numpy(dtype=np.float64)
        ra = g.groupby("a", sort=False)["o"].transform("sum") \
            .to_numpy(dtype=np.float64)
        cb = g.groupby("b", sort=False)["o"].transform("sum") \
            .to_numpy(dtype=np.float64)
        n = float(o.sum())
        mi = float(((o / n) * np.log(o * n / (ra * cb))).sum())
        pa_ = g.groupby("a", sort=True)["o"].sum() \
            .to_numpy(dtype=np.float64) / n
        pb_ = g.groupby("b", sort=True)["o"].sum() \
            .to_numpy(dtype=np.float64) / n
        ha = float(-(pa_ * np.log(pa_)).sum())
        hb = float(-(pb_ * np.log(pb_)).sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            nmi = mi / np.sqrt(ha * hb)
        return pd.DataFrame({
            "n": pd.Series([int(n)], dtype="int64"),
            "mi": [mi],
            "nmi": [float(nmi) if np.isfinite(nmi) else np.nan]})

    return counts.repartition(1).map_batches(fin, batch_format="pandas",
                                             batch_size=None)
