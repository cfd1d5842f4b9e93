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
import pyarrow.compute as pc
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
        # type empty outputs from the input dtypes — an object-dtype empty
        # list would become an Arrow null column and poison downstream
        # schema unification / Acero joins
        idt = df[id_col].dtype
        cols = {"id_a": pd.Series(out_a, dtype=idt), "id_b": pd.Series(out_b, dtype=idt)}
        for c in carry:
            cdt = df[c].dtype
            cols[f"{c}_a"] = pd.Series(car[c][0], dtype=cdt)
            cols[f"{c}_b"] = pd.Series(car[c][1], dtype=cdt)
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
    """Explode signatures to (band_hash, id) rows — vectorized: the band
    hash is a wrapping-uint64 polynomial over the band's rows, seeded by
    the band id (one packed int64 bucket key)."""
    n = len(batch)
    if n == 0:
        return pd.DataFrame({"band_hash": pd.Series([], dtype="int64"),
                             id_col: batch[id_col]})
    sig = np.vstack(batch["sig"].to_numpy()).view(np.uint64).reshape(n, bands, rows)
    prime = np.uint64(1099511628211)
    # band_id folds into the polynomial SEED, so one int64 carries both
    # (band, hash) — halves the bucket-key bytes crossing the exchange;
    # a cross-band collision needs a full 64-bit hash match and any such
    # candidate still passes exact-Jaccard verify
    h = np.broadcast_to((np.arange(bands, dtype=np.uint64) + np.uint64(1))
                        * np.uint64(0x9E3779B97F4A7C15),
                        (n, bands)).copy()
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = h * prime + sig[:, :, r]
    return pd.DataFrame({
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
    return _collision_pairs(banded, id_col=id_col, bucket_cols=["band_hash"])


def _as_arrow_schema(ds: Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow Schema.  Pandas-backed datasets (e.g.
    ``from_pandas`` in tests) report a PandasBlockSchema whose dtypes are
    numpy; object dtype means strings in this engine's tables."""
    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s

    def conv(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    return pa.schema([(n, conv(t)) for n, t in zip(s.names, s.types)])


def _pair_side_join(
    pairs: Dataset,
    side: Dataset,
    *,
    id_col: str,
    value_cols: list[str],
    carry: list[str] | None = None,
    num_partitions: int = 64,
    side_schema: pa.Schema | None = None,
) -> Dataset:
    """Attach per-id attributes to BOTH ends of candidate pairs, fully
    partitioned — the distributed verify join (no broadcast, no driver hop).

    ``side_schema``: pass the side table's Arrow schema when the caller
    already knows it — ``side.schema()`` on a lazy read+repartition
    chain executes the whole exchange just to see one row.

    Round 1 ("fetch"): every pair emits two request rows keyed by the id it
    needs (``_rid`` = id_a for side 0, id_b for side 1); the side table
    streams in under the same ``_pkey`` hash of its id; a per-partition
    Acero hash join attaches the values (the side table's non-matching
    majority drops here).  Round 2 ("recombine"): matched rows shuffle on
    ``id_a`` and the two halves of each pair join back together.  Worst
    case (candidates ≈ corpus — a duplicate-saturated crawl) the two
    exchanges carry O(corpus + pairs) rows and nothing is ever collected
    or broadcast, unlike the driver-side lookup this replaces.

    Output columns: ``id_a, id_b, *carry, *<v>_a, *<v>_b``.
    """
    carry = list(carry or [])
    if side_schema is None:
        side_schema = _as_arrow_schema(side)
    id_type = side_schema.field(id_col).type
    val_types = {v: side_schema.field(v).type for v in value_cols}
    if pairs.schema() is None:
        # zero candidate pairs anywhere (e.g. an all-distinct corpus at a
        # high threshold): Ray reports no schema for the empty derived
        # dataset — return the typed empty result instead of crashing.
        # carry types are unknowable here; string is the engine's carry
        # convention (band ids / keys), and the table is empty anyway.
        import ray.data

        empty_schema = pa.schema(
            [("id_a", id_type), ("id_b", id_type)]
            + [(c, pa.string()) for c in carry]
            + [(f"{v}_a", val_types[v]) for v in value_cols]
            + [(f"{v}_b", val_types[v]) for v in value_cols]
        )
        return ray.data.from_arrow(empty_schema.empty_table())
    pairs_schema = _as_arrow_schema(pairs)
    carry_types = {c: pairs_schema.field(c).type for c in carry}

    # canonical typed schemas per stage: upstream map_groups emit
    # COLUMN-LESS empty pandas blocks for empty partitions, which would
    # otherwise unify to null-typed columns and break the Acero joins
    tagged_schema = pa.schema(
        [("_rid", id_type), ("id_a", id_type), ("id_b", id_type)]
        + [(c, carry_types[c]) for c in carry]
        + [(v, val_types[v]) for v in value_cols]
        + [("_sd", pa.int8()), ("_pkey", pa.int64())]
    )
    matched_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type)]
        + [(c, carry_types[c]) for c in carry]
        + [("_sd", pa.int8())]
        + [(v, val_types[v]) for v in value_cols]
        + [("_pkey2", pa.int64())]
    )
    out_schema = pa.schema(
        [("id_a", id_type), ("id_b", id_type)]
        + [(c, carry_types[c]) for c in carry]
        + [(f"{v}_a", val_types[v]) for v in value_cols]
        + [(f"{v}_b", val_types[v]) for v in value_cols]
    )

    def to_requests(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tagged_schema.empty_table()
        t = t.combine_chunks()
        n = t.num_rows

        def dup(name):
            col = t[name].chunks
            return pa.concat_arrays(col + col)

        cols = {
            "_rid": pa.concat_arrays(t["id_a"].chunks + t["id_b"].chunks),
            "id_a": dup("id_a"),
            "id_b": dup("id_b"),
        }
        for c in carry:
            cols[c] = dup(c)
        for v in value_cols:
            cols[v] = pa.nulls(2 * n, val_types[v])
        cols["_sd"] = pa.array(np.repeat(np.array([0, 1], np.int8), n))
        out = pa.table(cols)
        return out.append_column("_pkey", _stable_pkey(out["_rid"], num_partitions))

    def to_side(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tagged_schema.empty_table()
        n = t.num_rows
        cols = {
            "_rid": t[id_col],
            "id_a": pa.nulls(n, id_type),
            "id_b": pa.nulls(n, id_type),
        }
        for c in carry:
            cols[c] = pa.nulls(n, carry_types[c])
        for v in value_cols:
            cols[v] = t[v]
        cols["_sd"] = pa.array(np.full(n, 2, np.int8))
        out = pa.table(cols)
        return out.append_column("_pkey", _stable_pkey(out["_rid"], num_partitions))

    tagged = pairs.map_batches(to_requests, batch_format="pyarrow").union(
        side.map_batches(to_side, batch_format="pyarrow")
    )

    def match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_sd" not in t.column_names:
            return matched_schema.empty_table()
        # empty upstream partitions surface as column-less blocks whose
        # columns unify to null type during the sort — cast back (all-null
        # columns cast to any type) so the Acero join sees real types
        t = t.select(tagged_schema.names).cast(tagged_schema).combine_chunks()
        req = t.filter(pc.not_equal(t["_sd"], 2)).select(
            ["_rid", "id_a", "id_b", *carry, "_sd"])
        sde = t.filter(pc.equal(t["_sd"], 2)).select(["_rid", *value_cols])
        out = req.join(sde, keys="_rid", join_type="inner").drop_columns(["_rid"])
        out = out.append_column("_pkey2", _stable_pkey(out["id_a"], num_partitions))
        return out.select(matched_schema.names)

    matched = tagged.groupby("_pkey").map_groups(match, batch_format="pyarrow")

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_sd" not in t.column_names:
            return out_schema.empty_table()
        t = t.select(matched_schema.names).cast(matched_schema).combine_chunks()
        a = t.filter(pc.equal(t["_sd"], 0)).select(["id_a", "id_b", *carry, *value_cols])
        b = t.filter(pc.equal(t["_sd"], 1)).select(["id_a", "id_b", *value_cols])
        a = a.rename_columns(["id_a", "id_b", *carry, *[f"{v}_a" for v in value_cols]])
        b = b.rename_columns(["id_a", "id_b", *[f"{v}_b" for v in value_cols]])
        return a.join(b, keys=["id_a", "id_b"], join_type="inner").select(out_schema.names)

    return matched.groupby("_pkey2").map_groups(combine, batch_format="pyarrow")


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
    """Near-duplicate pairs with exact Jaccard ≥ threshold (LSH-pruned).

    One streaming dataflow: LSH candidates → partitioned two-sided text
    fetch (:func:`_pair_side_join`) → exact shingle-set Jaccard verify per
    batch.  No materialization, no broadcast, no driver round-trip.

    Block-count right-sizing: the pipeline runs FOUR all-to-all
    exchanges, and their fixed per-block cost dominates small corpora
    (a single small parquet file arrives split into 2×CPU tiny blocks;
    measured 14.1 s → 4.5 s at 5k docs from resizing alone, identical
    pairs).  One metadata ``count()`` sizes both the block count and the
    exchange partition count to ~512 docs per block, clamped to the
    large-corpus defaults, so 100 TB behavior is unchanged.
    """
    n = ds.count()
    target = min(32, max(8, n // 512))
    nparts = min(64, max(8, n // 512))
    corpus = ds.select_columns([id_col, text_col])
    if text_col != "text":
        corpus = corpus.rename_columns({text_col: "text"})
    # schema probe BEFORE the repartition: .schema() on the lazy
    # read+repartition chain would execute the whole exchange
    corpus_schema = _as_arrow_schema(corpus)
    corpus = corpus.repartition(target)
    cands = minhash_lsh_candidates(
        corpus, id_col=id_col, num_perm=num_perm,
        bands=bands, seed=seed, shingle_n=shingle_n, split=None,
    ).materialize()
    # materialize: _pair_side_join's pairs.schema() probe would
    # otherwise re-execute the ENTIRE candidate chain (sign → band →
    # collide → dedup) a second time — measured 2× end-to-end
    withtexts = _pair_side_join(cands, corpus, id_col=id_col,
                                value_cols=["text"],
                                num_partitions=nparts,
                                side_schema=corpus_schema)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(batch), dtype=np.float64)
        for i, (ta, tb) in enumerate(zip(batch["text_a"], batch["text_b"])):
            sa = set(word_shingles(ta, shingle_n))
            sb = set(word_shingles(tb, shingle_n))
            u = len(sa | sb)
            jac[i] = (len(sa & sb) / u) if u else 1.0
        out = batch[["id_a", "id_b"]].copy()
        out["jaccard"] = jac
        return out

    verified = withtexts.map_batches(verify, batch_format="pandas")
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
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
    max_gram_df: int | None = None,
    score: str = "jaccard",
    strict: bool = True,
) -> Dataset:
    """All pairs with word-``n``-gram Jaccard ≥ threshold — EXACT.

    ``score="containment"`` switches the final metric to
    ``inter / min(sz_a, sz_b)`` (the asymmetric overlap coefficient):
    a small document fully embedded in a large one scores 1.0 where
    Jaccard collapses toward 0 — the metric that catches quote-and-pad
    and sub-document duplication in training corpora.  Same dataflow,
    same exchanges; only the finalize arithmetic (and the output column
    name) changes.

    ``strict=False`` switches the shingle basis to MinHash's (a doc
    shorter than ``n`` words contributes its whole text as one shingle
    instead of nothing) so this exact path can serve as ground truth
    for :func:`minhash_dedup_pairs` recall audits; the SQL-mirrored
    oracle path keeps the default ``strict=True``.

    Dataflow: explode distinct grams per doc (vectorized hash), each gram
    row CARRYING its doc's total distinct-gram count → inverted-index
    shuffle on hash(gram) → per-partition pair counting (intersection
    partials, sizes riding along) → one pair-key merge → jaccard =
    inter / (sz_a + sz_b − inter).  Because every gram row knows its doc's
    size, no size table, broadcast, or driver round-trip exists anywhere —
    the whole op is two hash exchanges and stays streaming at any corpus
    size.

    ``max_gram_df``: drop grams appearing in more than this many documents
    before pair expansion.  A stopword-only gram over a web-scale corpus
    otherwise makes its bucket quadratic (DF² candidate pairs).  Each
    gram's exact document frequency is already complete inside its hash
    partition, so the cap costs one vectorized value_counts — no extra
    pass.  Semantics with a cap: a pair is found iff the docs share at
    least one sub-cap gram, and its reported ``inter`` (hence jaccard)
    excludes hot grams — a lower bound.  ``None`` (default) disables the
    cap — fully exact; the SQL-oracle path uses None.
    """
    if text_col != "text":
        ds = ds.rename_columns({text_col: "text"})
    ds = ds.select_columns(["text", id_col]).repartition(32)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, ghs, szs = [], [], []
        for rid, text in zip(b[id_col], b["text"]):
            grams = set(word_shingles(text, n, strict=strict))
            if grams:
                hs = np.unique(_stable_u64(np.array(sorted(grams), dtype=object)))
                ids.extend([rid] * len(hs))
                ghs.extend(hs.view(np.int64))
                szs.extend([len(grams)] * len(hs))
        return pd.DataFrame({id_col: ids, "gram": ghs, "sz": np.asarray(szs, dtype=np.int64)})

    grams_ds = ds.map_batches(explode, batch_format="pandas")

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t["gram"], num_partitions))

    empty = pd.DataFrame({
        "id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
        "inter": pd.Series(dtype="int64"),
        "sz_a": pd.Series(dtype="int64"), "sz_b": pd.Series(dtype="int64"),
    })

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated(["gram"], keep=False)]
        if max_gram_df is not None and len(dup):
            # each gram is COMPLETE within this partition → value_counts is
            # its exact corpus-wide document frequency
            dfreq = dup["gram"].value_counts()
            dup = dup[dup["gram"].map(dfreq) <= max_gram_df]
        out_a, out_b, sz_a, sz_b = [], [], [], []
        for _, g in dup.groupby("gram", sort=False):
            gu = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(gu) < 2:
                continue
            ids = gu[id_col].to_numpy()
            szs = gu["sz"].to_numpy()
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.extend(ids[ia])
            out_b.extend(ids[ib])
            sz_a.extend(szs[ia])
            sz_b.extend(szs[ib])
        if not out_a:
            return empty
        d = pd.DataFrame({"id_a": out_a, "id_b": out_b, "sz_a": sz_a, "sz_b": sz_b})
        return d.groupby(["id_a", "id_b"], as_index=False).agg(
            inter=("sz_a", "size"), sz_a=("sz_a", "first"), sz_b=("sz_b", "first")
        )

    tagged = grams_ds.map_batches(add_pkey, batch_format="pyarrow")
    partial_counts = tagged.groupby("_pkey").map_groups(count_pairs, batch_format="pandas")
    merged = _grouped_min(
        partial_counts, group_cols=["id_a", "id_b"],
        agg_cols=[("inter", "sum"), ("sz_a", "min"), ("sz_b", "min")], pkey_col="id_a",
    )

    out_name = "containment" if score == "containment" else "jaccard"

    def score_fn(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy().astype(np.float64)
        sa = t["sz_a"].to_numpy().astype(np.float64)
        sb = t["sz_b"].to_numpy().astype(np.float64)
        if out_name == "containment":
            val = inter / np.minimum(sa, sb)
        else:
            val = inter / (sa + sb - inter)
        out = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                        out_name: pa.array(val)})
        return out.filter(pc.greater_equal(out[out_name], threshold))

    return merged.map_batches(score_fn, batch_format="pyarrow")


def dup_rate_by_group(
    ds: Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    num_partitions: int = 64,
) -> Dataset:
    """Exact-duplicate contamination rate per group: for each group
    (source/shard/snapshot), how many of its docs carry a text that
    appears more than once ANYWHERE in the corpus — the corpus-health
    dashboard row beside :func:`exact_dedup_ids` (which picks survivors;
    this measures how much there was to kill, attributed to the group
    that contributed it).

    One text-hash exchange: docs partition by hash(text) so all copies
    of a text co-locate (only ``(hash, group)`` crosses, never text);
    each partition marks dup membership vectorized and folds per-group
    partials; a final tiny merge sums ≤ |groups| rows on one partition.
    Hash-dup semantics match exact_dedup_ids (md5; collisions
    negligible and identical on both paths).

    Output: ``{group_col}, n_docs, n_dup_docs, dup_ratio`` by group.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({group_col: b[group_col],
                             "h": md5_hex(b[text_col])})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"])
        if len(df) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype="object"),
                                 "n_docs": pd.Series([], dtype="int64"),
                                 "n_dup_docs": pd.Series([], dtype="int64")})
        n_copies = df.groupby("h", sort=False)["h"].transform("size")
        return pd.DataFrame({
            group_col: df[group_col].to_numpy(),
            "n_docs": np.ones(len(df), dtype=np.int64),
            "n_dup_docs": (n_copies.to_numpy() > 1).astype(np.int64),
        }).groupby(group_col, sort=False, as_index=False).sum()

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t["h"], num_partitions))

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    partials = (hashed.map_batches(add_pkey, batch_format="pyarrow")
                .groupby("_pkey").map_groups(fold, batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        m = t.group_by(group_col, use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum")])
        nd = pc.cast(m["n_docs_sum"], pa.float64())
        dd = pc.cast(m["n_dup_docs_sum"], pa.float64())
        return pa.table({
            group_col: m[group_col],
            "n_docs": m["n_docs_sum"],
            "n_dup_docs": m["n_dup_docs_sum"],
            "dup_ratio": pc.divide(dd, nd),
        })

    return (partials.repartition(1)
            .map_batches(finish, batch_format="pyarrow").sort(group_col))


# ---------------------------------------------------------------------------
# blocked edit-distance near-dup
# ---------------------------------------------------------------------------


def _pad_bytes_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 strings -> zero-padded byte matrix [n, Lmax] + byte lengths.

    Fully vectorized: the utf8 values buffer is viewed as uint8 and
    scattered by offsets — no per-row Python encode loop.
    """
    a = pc.cast(arr, pa.string())
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    offs = np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset: a.offset + len(a) + 1].astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    lmax = max(int(lens.max(initial=0)), 1)
    m = np.zeros((len(a), lmax), dtype=np.uint8)
    mask = np.arange(lmax)[None, :] < lens[:, None]
    m[mask] = data[(offs[:-1, None] + np.arange(lmax)[None, :])[mask]]
    return m, lens


def _levenshtein_pairs(A: np.ndarray, la: np.ndarray,
                       B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Byte-level Levenshtein for P row pairs, vectorized ACROSS pairs.

    One Python iteration per a-side byte position (<= max byte length);
    inside a row the insertion dependency
    ``dp[j] = min(t[j], dp[j-1] + 1)`` is resolved closed-form with the
    prefix-scan identity ``dp[j] = j + cummin_{k<=j}(t[k] - k)`` — so the
    inner work is pure numpy over the [P, Lmax+1] plane.  Unit = BYTES,
    matching DuckDB ``levenshtein`` exactly (which edits UTF-8 bytes:
    ``levenshtein('héllo','hello') = 2``).
    """
    P, Lb = B.shape
    cols = np.arange(Lb + 1, dtype=np.int64)
    dp = np.broadcast_to(cols, (P, Lb + 1)).copy()
    t = np.empty_like(dp)
    for i in range(1, int(la.max(initial=0)) + 1):
        cost = (B != A[:, i - 1][:, None]).astype(np.int64)
        t[:, 0] = i
        t[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        new = np.minimum.accumulate(t - cols, axis=1) + cols
        active = la >= i
        dp[active] = new[active]
    return dp[np.arange(P), lb]


def edit_distance_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 12,
    max_dist: int = 10,
    num_partitions: int = 64,
) -> Dataset:
    """Blocked edit-distance near-dup: pairs (id_a < id_b) whose texts are
    within ``max_dist`` BYTE edits, among docs sharing the same first
    ``prefix_len`` CODEPOINTS (the classic prefix-blocking scheme for
    typo/near-rewrite dedup; complements MinHash, which misses short
    texts, and SimHash, which misses transpositions).

    Reference analog: TSFEDL has no string ops (dense ndarrays,
    SURVEY.md §2.7); this is an engine curation addition.

    Scale design: every row belongs to exactly ONE block (its prefix), so
    a single hash exchange on the block key co-locates all candidates and
    pairs can never be discovered twice (no second dedup exchange, unlike
    multi-bucket LSH).  Inside a partition the non-colliding majority is
    dropped with one vectorized duplicated-mask, pairs are pruned by the
    byte-length band (dist >= |len_a - len_b| in byte units), and ALL
    surviving pairs run through one multi-pair vectorized DP
    (`_levenshtein_pairs`) — no per-pair Python loop.
    """

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "id": t[id_col],
            "text": t[text_col],
            "block": pc.utf8_slice_codeunits(t[text_col], 0, prefix_len),
        })
        return out.append_column(
            "_pkey", _stable_pkey(out["block"], num_partitions))

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        idt = df["id"].dtype
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=idt),
                              "id_b": pd.Series([], dtype=idt),
                              "dist": pd.Series([], dtype="int64")})
        dup = df[df.duplicated("block", keep=False)]
        if len(dup) == 0:
            return empty
        dup = dup.sort_values(["block", "id"],
                              kind="mergesort").reset_index(drop=True)
        M, lens = _pad_bytes_matrix(pa.array(dup["text"], pa.string()))
        blocks = dup["block"].to_numpy()
        bounds = np.flatnonzero(
            np.r_[True, blocks[1:] != blocks[:-1], True])
        ia_l, ib_l = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = int(e - s)
            if k < 2:
                continue
            ti, tj = np.triu_indices(k, k=1)
            ia_l.append(ti + s)
            ib_l.append(tj + s)
        if not ia_l:
            return empty
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
        band = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib = ia[band], ib[band]
        if len(ia) == 0:
            return empty
        d = _levenshtein_pairs(M[ia], lens[ia], M[ib], lens[ib])
        keep = d <= max_dist
        ia, ib, d = ia[keep], ib[keep], d[keep]
        ids = dup["id"].to_numpy()
        # sorted by (block, id) with ti < tj inside a block => id_a < id_b
        return pd.DataFrame({"id_a": pd.Series(ids[ia], dtype=idt),
                             "id_b": pd.Series(ids[ib], dtype=idt),
                             "dist": pd.Series(d, dtype="int64")})

    tagged = ds.map_batches(prep, batch_format="pyarrow")
    pairs = tagged.groupby("_pkey").map_groups(
        pairs_partition, batch_format="pandas")
    return pairs.sort(["id_a", "id_b"])
