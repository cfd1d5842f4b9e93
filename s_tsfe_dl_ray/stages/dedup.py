"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference has no duplicate concept (dense ndarrays — SURVEY.md §2.7);
the engine adds dedup as first-class ops because (a) ingest idempotence
(``(conv_id, turn_idx)`` uniqueness) is required for resume-without-double-
count, and (b) a 100 TB training-data pipeline needs near-dup removal.

Scale design:
- **exact**: hash-partition on a stable content hash, keep the min-id row
  per group.  Only (hash, id, payload-needed-downstream) columns cross the
  shuffle — hash is computed in a vectorized stateless ``map_batches``.
- **MinHash-LSH**: shingle → minhash signature per row (vectorized numpy,
  one universal-hash matrix broadcast per actor) → explode to
  (band, band_hash, id) candidate rows → ``groupby`` buckets → verify
  exact Jaccard within bucket.  All-pairs work happens only inside LSH
  buckets (bounded), never globally.
- **SimHash**: 64-bit signature per row; band on 4×16-bit sub-keys → exact
  verify by Hamming distance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def md5_hex(texts: pd.Series) -> pd.Series:
    """Row-wise md5 hex (C-bound hashlib; matches DuckDB ``md5(text)``)."""
    return texts.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def _grouped_min(ds: Dataset, *, group_cols: list[str], agg_cols: list[tuple[str, str]],
                 pkey_col: str, num_partitions: int = 64) -> Dataset:
    """Hash-partition by ``pkey_col`` then merge groups with ONE vectorized
    pyarrow group_by per partition (same fast-merge pattern as the rollup
    core — see stages/rollup.py ``_ray_merge``)."""

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[pkey_col], num_partitions))

    # never rename an aggregate onto a group column (e.g. count(id_b)
    # grouped by id_b — the count is a dedupe artifact, kept under its
    # pyarrow name and dropped by the caller)
    renames = {f"{c}_{fn}": c for c, fn in agg_cols if c not in group_cols}

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(group_cols, use_threads=False).aggregate(agg_cols)
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(merge, batch_format="pyarrow")


def exact_dedup_ids(ds: Dataset, *, text_col: str, id_col: str) -> Dataset:
    """Return (h, <id_col>) — the minimum id per distinct content hash.

    The canonical "keep-first" exact dedup: downstream joins/filters keep
    only these ids.  Shuffle carries (hash, id) pairs only.
    """

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": md5_hex(b[text_col]), id_col: b[id_col]})

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    return _grouped_min(hashed, group_cols=["h"], agg_cols=[(id_col, "min")], pkey_col="h")


def first_per_key(
    ds: Dataset, *, keys: list[str], order_by: list[str]
) -> Dataset:
    """Idempotent ingest dedup: first row per key by ``order_by``.

    Engine requirement (SURVEY.md §2.7): ``(conv_id, turn_idx)`` uniqueness
    at ingest so a resumed/retried write never double-counts.
    """

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, kind="mergesort").head(1)

    from .grouped import grouped_apply

    return grouped_apply(ds, keys=keys, fn=head1)


def latest_per_key(
    ds: Dataset, *, keys: list[str], order_by: list[str]
) -> Dataset:
    """Late-data upsert semantics: LAST row per key by ``order_by``
    (last-writer-wins).  The mirror of :func:`first_per_key` — replays,
    corrections and late arrivals collapse to the newest version of each
    key; same partition-wise execution shape."""

    def tail1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, kind="mergesort").tail(1)

    from .grouped import grouped_apply

    return grouped_apply(ds, keys=keys, fn=tail1)


def _collision_pairs(
    banded: Dataset,
    *,
    id_col: str,
    bucket_cols: list[str],
    carry: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """(bucket..., id) rows → unique candidate pairs (id_a < id_b) from
    bucket collisions.

    One coarse hash shuffle on the bucket key; inside each partition the
    non-colliding majority is dropped VECTORIZED (duplicated-mask) and the
    quadratic pair expansion runs only over colliding buckets — never one
    Python call per bucket (map_groups-per-tiny-group was measured at 18 s
    of pure invocation overhead for 80k buckets).
    """
    carry = carry or []
    last_bucket = bucket_cols[-1]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[last_bucket], num_partitions))

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(bucket_cols, keep=False)]
        out_a, out_b = [], []
        car: dict[str, tuple[list, list]] = {c: ([], []) for c in carry}
        for _, g in dup.groupby(bucket_cols, sort=False):
            g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[ia])
            out_b.extend(ids[ib])
            for c in carry:
                vals = g[c].to_numpy()
                car[c][0].extend(vals[ia])
                car[c][1].extend(vals[ib])
        cols = {"id_a": out_a, "id_b": out_b}
        for c in carry:
            cols[f"{c}_a"], cols[f"{c}_b"] = car[c]
        return pd.DataFrame(cols)

    tagged = banded.map_batches(add_pkey, batch_format="pyarrow")
    raw_pairs = tagged.groupby("_pkey").map_groups(pairs_partition, batch_format="pandas")
    # dedupe pairs found by multiple buckets (keeps first carry values —
    # identical across buckets since they are per-id attributes)
    agg = [(f"{c}_a", "min") for c in carry] + [(f"{c}_b", "min") for c in carry]
    agg = agg or [("id_b", "count")]
    deduped = _grouped_min(raw_pairs, group_cols=["id_a", "id_b"], agg_cols=agg, pkey_col="id_a")
    keep = ["id_a", "id_b"] + [f"{c}_a" for c in carry] + [f"{c}_b" for c in carry]
    return deduped.select_columns(keep)


# ---------------------------------------------------------------------------
# shingling + MinHash-LSH
# ---------------------------------------------------------------------------

# 31-bit Mersenne prime modulus: with a, b, x < p the product a*x + b fits
# in uint64, so the whole (S, P) universal-hash sweep stays in vectorized
# native integer arithmetic (no Python bigints).
_P31 = np.uint64((1 << 31) - 1)


def _stable_u64(tokens: np.ndarray) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string array (polars xxhash)."""
    import polars as pl

    return pl.Series(tokens).hash(seed=0).to_numpy().astype(np.uint64)


def word_shingles(text: str, n: int, *, strict: bool = False) -> list[str]:
    """Word n-grams.  Non-strict (MinHash default): a doc shorter than n
    words contributes its whole text as one shingle.  Strict (the exact
    n-gram-Jaccard operator, SQL-mirrorable): short docs contribute no
    grams."""
    toks = text.split()
    if len(toks) < n:
        return [] if strict else ([" ".join(toks)] if toks else [])
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


class MinHasher:
    """Stateful minhash signer: the (a, b) universal-hash matrix is built
    once per actor (reference pattern: load-once state per worker,
    SURVEY.md §2.3).  Shingles of the whole batch are hashed in ONE
    vectorized polars call; the per-row permutation sweep is an
    (S_row × num_perm) uint64 matrix op."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_P31), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_P31), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(S,) uint64 shingle hashes → (num_perm,) uint64 signature."""
        if len(shingle_hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (shingle_hashes % _P31)[:, None]  # 31-bit universe
        vals = (x * self.a[None, :] + self.b[None, :]) % _P31
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        all_sh: list[str] = []
        offsets = [0]
        for text in batch["text"]:
            all_sh.extend(word_shingles(text, self.shingle_n))
            offsets.append(len(all_sh))
        hs = _stable_u64(np.array(all_sh, dtype=object)) if all_sh else np.empty(0, np.uint64)
        sigs = np.empty((len(batch), self.num_perm), dtype=np.uint64)
        for i in range(len(batch)):
            sigs[i] = self.signature(np.unique(hs[offsets[i] : offsets[i + 1]]))
        out = batch[[c for c in batch.columns if c != "text"]].copy()
        out["sig"] = list(sigs.astype(np.int64))
        return out


def _band_rows(batch: pd.DataFrame, *, id_col: str, bands: int, rows: int) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, id) rows — vectorized:
    the band hash is a wrapping-uint64 polynomial over the band's rows."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame({"band_id": pd.Series([], dtype="int64"),
                             "band_hash": pd.Series([], dtype="int64"),
                             id_col: batch[id_col]})
    sig = np.vstack(batch["sig"].to_numpy()).view(np.uint64).reshape(n, bands, rows)
    prime = np.uint64(1099511628211)
    h = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = h * prime + sig[:, :, r]
    return pd.DataFrame({
        "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
        "band_hash": h.reshape(-1).view(np.int64),
        id_col: np.repeat(batch[id_col].to_numpy(), bands),
    })


def minhash_lsh_candidates(
    ds: Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
    split: int | None = 32,
) -> Dataset:
    """Candidate duplicate pairs (id_a < id_b) from LSH band collisions.

    ``split``: rebalance a small corpus (often a single parquet file →
    ONE block) across this many blocks so the signer pool actually
    parallelizes; pass None for inputs that already arrive well-sharded.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    ds = ds.select_columns(["text", id_col])
    if split:
        ds = ds.repartition(split)
    signed = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n, "seed": seed},
        batch_format="pandas",
        concurrency=(1, 16),
    )
    banded = signed.map_batches(
        lambda b: _band_rows(b, id_col=id_col, bands=bands, rows=rows),
        batch_format="pandas",
    )
    return _collision_pairs(banded, id_col=id_col, bucket_cols=["band_id", "band_hash"])


class JaccardVerifier:
    """Verify candidate pairs by exact shingle-set Jaccard.

    The shingle sets are rebuilt from a *broadcast* id→text lookup of the
    CANDIDATE ids only (``ray.put`` once, read per actor in ``__init__`` —
    the small-side broadcast pattern, SURVEY.md §2.4).  The lookup is
    produced by a distributed semi-join: the corpus is streamed through a
    vectorized id-set filter and only matching (id, text) rows ever reach
    the driver — candidates ≪ corpus, bounded by the LSH collision rate.
    """

    def __init__(self, texts_ref, shingle_n: int = 3):
        import ray

        self.texts: dict = ray.get(texts_ref)
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(batch), dtype=np.float64)
        for i, (a, b) in enumerate(zip(batch["id_a"], batch["id_b"])):
            sa = set(word_shingles(self.texts[a], self.shingle_n))
            sb = set(word_shingles(self.texts[b], self.shingle_n))
            u = len(sa | sb)
            jac[i] = (len(sa & sb) / u) if u else 1.0
        batch = batch.copy()
        batch["jaccard"] = jac
        return batch


def minhash_dedup_pairs(
    ds: Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    seed: int = 42,
    shingle_n: int = 3,
) -> Dataset:
    """Near-duplicate pairs with exact Jaccard ≥ threshold (LSH-pruned)."""
    import ray

    cands = minhash_lsh_candidates(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, seed=seed, shingle_n=shingle_n,
    ).materialize()  # used twice: id set + verify input (small by design)
    # Semi-join re-read: only texts whose id appears in a candidate pair
    # cross to the driver.  The corpus itself is never materialized — it
    # streams through a vectorized isin() filter.
    ids = cands.select_columns(["id_a", "id_b"]).to_pandas()
    need = pa.array(pd.unique(pd.concat([ids["id_a"], ids["id_b"]], ignore_index=True)))
    need_ref = ray.put(need)

    class _IdFilter:
        def __init__(self, need_ref):
            self.need = ray.get(need_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(pa.compute.is_in(t[id_col], value_set=self.need))

    texts_small = (
        ds.select_columns([id_col, text_col])
        .map_batches(_IdFilter, fn_constructor_kwargs={"need_ref": need_ref},
                     batch_format="pyarrow", concurrency=(1, 8))
        .to_pandas()
    )
    ref = ray.put(dict(zip(texts_small[id_col], texts_small[text_col])))
    verified = cands.map_batches(
        JaccardVerifier, fn_constructor_kwargs={"texts_ref": ref, "shingle_n": shingle_n},
        batch_format="pandas", concurrency=(1, 16),
    )
    return verified.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash per row (vectorized bit-count accumulation)."""

    def __init__(self, seed: int = 0):
        self.seed = seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.empty(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch["text"]):
            toks = np.array(text.split(), dtype=object)
            if len(toks) == 0:
                sigs[i] = 0
                continue
            hs = _stable_u64(toks)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            score = bits.sum(axis=0) * 2 - len(hs)  # +1 for set bits, -1 for unset
            # packbits little-endian: element j of the bool array becomes
            # bit j of the uint64 — matches the (hs >> j) & 1 convention
            sigs[i] = np.packbits((score > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        out = batch[[c for c in batch.columns if c != "text"]].copy()
        out["simhash"] = sigs.astype(np.int64)
        return out


def simhash_signatures(
    ds: Dataset, *, id_col: str, text_col: str = "text", split: int | None = 32
) -> Dataset:
    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    ds = ds.select_columns(["text", id_col])
    if split:
        ds = ds.repartition(split)  # parallelize single-block corpora
    return ds.map_batches(SimHasher(), batch_format="pandas")


def simhash_dedup_pairs(
    ds: Dataset, *, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> Dataset:
    """Near-dup pairs by SimHash: band 4×16 bits → exact Hamming verify."""
    signed = simhash_signatures(ds, id_col=id_col, text_col=text_col)

    def band(b: pd.DataFrame) -> pd.DataFrame:
        sh = b["simhash"].to_numpy().view(np.uint64)
        out = []
        for band_id in range(4):
            part = ((sh >> np.uint64(16 * band_id)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({
                "band_id": band_id, "band_key": part,
                id_col: b[id_col], "simhash": b["simhash"],
            }))
        return pd.concat(out, ignore_index=True)

    banded = signed.map_batches(band, batch_format="pandas")
    pairs = _collision_pairs(
        banded, id_col=id_col, bucket_cols=["band_id", "band_key"], carry=["simhash"]
    )

    def add_hamming(b: pd.DataFrame) -> pd.DataFrame:
        a = b["simhash_a"].to_numpy().view(np.uint64)
        c = b["simhash_b"].to_numpy().view(np.uint64)
        x = a ^ c
        # vectorized popcount via byte-table lookup
        tbl = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
        ham = tbl[x.view(np.uint8).reshape(-1, 8)].sum(1).astype(np.int64)
        return pd.DataFrame({"id_a": b["id_a"], "id_b": b["id_b"], "hamming": ham})

    pairs = pairs.map_batches(add_hamming, batch_format="pandas")
    return pairs.map_batches(
        lambda t: t.filter(pa.compute.less_equal(t["hamming"], max_hamming)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted index — no LSH approximation)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: Dataset,
    *,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 64,
) -> Dataset:
    """All pairs with word-``n``-gram Jaccard ≥ threshold — EXACT.

    Dataflow: explode distinct grams per doc (vectorized hash) →
    inverted-index shuffle on hash(gram) → per-partition pair counting
    (intersection sizes) → merge counts per pair → jaccard =
    inter / (|A| + |B| − inter).  The |·| sizes are semi-joined to pair
    ids (corpus streams through an isin() filter; only pair ids' sizes
    are computed and broadcast — never the corpus-wide size table).

    Hot grams (stopword-only n-grams) make their bucket quadratic; real
    deployments drop grams with document frequency above a cap before the
    pair stage — the synthetic corpora here don't need it, so the cap is
    left to the caller via a pre-filter.
    """
    import ray

    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    ds = ds.select_columns(["text", id_col]).repartition(32)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, ghs, szs_id, szs = [], [], [], []
        for rid, text in zip(b[id_col], b["text"]):
            grams = set(word_shingles(text, n, strict=True))
            szs_id.append(rid)
            szs.append(len(grams))
            if grams:
                hs = np.unique(_stable_u64(np.array(sorted(grams), dtype=object)))
                ids.extend([rid] * len(hs))
                ghs.extend(hs.view(np.int64))
        return pd.DataFrame({id_col: ids, "gram": ghs})

    grams_ds = ds.map_batches(explode, batch_format="pandas")

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t["gram"], num_partitions))

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["gram"], keep=False)]
        out_a, out_b = [], []
        for _, g in dup.groupby("gram", sort=False):
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[ia])
            out_b.extend(ids[ib])
        d = pd.DataFrame({"id_a": out_a, "id_b": out_b})
        if len(d) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "inter": []}).astype(
                {"id_a": "int64", "id_b": "int64", "inter": "int64"})
        return d.groupby(["id_a", "id_b"], as_index=False).size().rename(columns={"size": "inter"})

    tagged = grams_ds.map_batches(add_pkey, batch_format="pyarrow")
    partial_counts = tagged.groupby("_pkey").map_groups(count_pairs, batch_format="pandas")
    merged = _grouped_min(
        partial_counts, group_cols=["id_a", "id_b"], agg_cols=[("inter", "sum")], pkey_col="id_a"
    ).materialize()  # used twice: pair-id set + scoring input (small)

    # per-doc distinct-gram sizes, SEMI-JOINED to pair ids: the corpus-wide
    # (id, sz) table is never driver-materialized — it streams through a
    # vectorized isin() filter and only pair ids' sizes are broadcast.
    pair_ids = merged.select_columns(["id_a", "id_b"]).to_pandas()
    need = pa.array(pd.unique(pd.concat([pair_ids["id_a"], pair_ids["id_b"]],
                                        ignore_index=True)))
    need_ref = ray.put(need)

    class _SizeFilter:
        def __init__(self, need_ref):
            import ray as _ray

            self.need = _ray.get(need_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = pa.compute.is_in(pa.array(b[id_col]), value_set=self.need).to_numpy(
                zero_copy_only=False
            )
            sub = b[m]
            return pd.DataFrame({
                id_col: sub[id_col],
                "sz": [len(set(word_shingles(t, n, strict=True))) for t in sub["text"]],
            })

    sizes = ds.map_batches(
        _SizeFilter, fn_constructor_kwargs={"need_ref": need_ref},
        batch_format="pandas", concurrency=(1, 8),
    ).to_pandas()
    sizes_ref = ray.put(dict(zip(sizes[id_col], sizes["sz"])))

    class _Jaccard:
        def __init__(self, sizes_ref):
            import ray as _ray

            self.sz = _ray.get(sizes_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sa = b["id_a"].map(self.sz).to_numpy(dtype=np.float64)
            sb = b["id_b"].map(self.sz).to_numpy(dtype=np.float64)
            inter = b["inter"].to_numpy(dtype=np.float64)
            b = b[["id_a", "id_b"]].copy()
            b["jaccard"] = inter / (sa + sb - inter)
            return b

    scored = merged.map_batches(
        _Jaccard, fn_constructor_kwargs={"sizes_ref": sizes_ref},
        batch_format="pandas", concurrency=(1, 8),
    )
    return scored.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow",
    )
