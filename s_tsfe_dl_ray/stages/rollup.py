"""Tiered tumbling-window rollup with partial (combiner) aggregation.

This is the engine's core operator — the continuous-aggregate re-expression
of the reference's windowed convolution / pooling downsample semantics
(reference: models_keras.py:137-142 Conv1D window reduce; 59-63
MaxPooling1D; blocks_keras.py:96 GlobalAveragePooling; the 5-level pooled
downsample cascades at models_keras.py:1386-1392).

Scale design (SURVEY.md §4):

- **One shuffle, minimal bytes.**  Each input batch is pre-aggregated to at
  most one row per ``(key, window)`` *inside* ``map_batches`` (a pyarrow
  ``Table.group_by`` — vectorized, zero-copy in).  Only these partials go
  through the ``groupby`` shuffle.  For a 100 TB input with bounded
  (key, window) cardinality this reduces the all-to-all exchange by orders
  of magnitude.
- **Hot keys are pre-salted for free.**  Because partials are per *batch*,
  a hot conversation's turns are combined into per-batch partial rows
  before they ever hit the shuffle — the classic salted two-pass merge
  (SURVEY.md §4 skew row) falls out of the combiner: count/sum/min/max are
  associative, mean is carried as (sum, count), so the merge is exact.
- **Cascades never re-read raw data.**  The 1h tier is an exact
  re-aggregation of 1m partials, 1d of 1h (associative stats combine
  exactly; mean = sum/count at finalize only).  ``cascade()`` re-windows
  and re-combines partials per batch before its (much smaller) shuffle.
- **Floats stay exact where the contract needs it.** token_len stats are
  integers end-to-end; float sums (events.value) are float64 partial sums
  — deterministic per blocking, and within 1e-12 relative of any
  association order at realistic group sizes.

Internal ("partial") schema carried between stages::

    keys..., window_start:int64(µs), _n:int64,
    __{col}__sum, __{col}__min, __{col}__max, __{col}__cnt  per metric

``finalize()`` turns partials into the public tier table (mean = sum/cnt,
rate = sum/_n, window_start → timestamp[us]).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.windows import (
    _tier_us, rewindow_us, window_start_us, window_to_timestamp,
)

_BASE_AGGS = ("sum", "min", "max", "cnt")


@dataclass(frozen=True)
class Metric:
    """One value column and the per-window stats requested for it."""

    col: str
    aggs: tuple[str, ...] = ("sum", "min", "max", "mean")
    prefix: str | None = None  # public column prefix; defaults to ``col``
    public: bool = True  # False → carried for rates only, no output columns
    #: declares every individual value of ``col`` fits int32 (e.g. a
    #: per-turn token count) → the partials' min/max cross the exchange
    #: as int32.  Sums stay int64 unless ``indicator``.
    narrow_minmax: bool = False
    #: declares ``col`` is a 0/1 indicator → its per-batch partial sum is
    #: bounded by the batch row count (always < 2^31) and crosses the
    #: exchange as int32, as do min/max.
    indicator: bool = False

    @property
    def out_prefix(self) -> str:
        return self.prefix if self.prefix is not None else self.col

    def needs(self) -> set[str]:
        """Base (associative) aggregates required to serve ``aggs``."""
        base = set()
        for a in self.aggs:
            if a == "mean":
                base.update(("sum", "cnt"))
            elif a == "count":
                base.add("cnt")
            else:
                base.add(a)
        return base


@dataclass(frozen=True)
class RollupSpec:
    keys: tuple[str, ...]
    ts_col: str
    metrics: tuple[Metric, ...]
    count_alias: str = "n_rows"  # public name for the per-window row count
    #: public rate columns: out_name -> metric col (finalize: sum(col)/_n)
    rates: dict[str, str] = field(default_factory=dict)

    def _internal(self, col: str, agg: str) -> str:
        return f"__{col}__{agg}"

    def partial_columns(self) -> list[str]:
        cols = list(self.keys) + ["window_start", "_n"]
        for m in self.metrics:
            for a in sorted(m.needs()):
                cols.append(self._internal(m.col, a))
        for col in self.rates.values():
            if not any(m.col == col for m in self.metrics):
                cols.append(self._internal(col, "sum"))
        return cols


def _pa_partial(spec: RollupSpec, batch: pa.Table) -> pa.Table:
    """Combine one Arrow batch (with ``window_start`` already assigned)
    down to per-(key, window) partial rows."""
    pa_aggs: list[tuple[str, str]] = [(spec.ts_col, "count")]
    renames = {f"{spec.ts_col}_count": "_n"}
    wanted: set[tuple[str, str]] = set()
    for m in spec.metrics:
        for a in m.needs():
            wanted.add((m.col, a))
    for col in spec.rates.values():
        wanted.add((col, "sum"))
    for col, a in sorted(wanted):
        fn = "count" if a == "cnt" else a
        pa_aggs.append((col, fn))
        renames[f"{col}_{fn}"] = spec._internal(col, a)
    keys = list(spec.keys) + ["window_start"]
    out = batch.group_by(keys, use_threads=False).aggregate(pa_aggs)
    return out.rename_columns([renames.get(c, c) for c in out.column_names])


def _narrow_partials(spec: RollupSpec, t: pa.Table) -> pa.Table:
    """Shrink the bytes/row of partial rows BEFORE the exchange (the
    measured single-box scaling limiter is the combine/exchange stage's
    memory-bus traffic — BASELINE.md per-stage scaling).

    Statically-safe narrowings only (the decision must be deterministic so
    every block shares one schema):

    - ``_n`` and every ``__col__cnt``: per-batch counts, bounded by the
      batch row count < 2^31 → int32.
    - ``__col__min/max`` when the metric declares ``narrow_minmax`` (or is
      an ``indicator``): individual VALUES of the column → int32.
    - ``__col__sum`` when the metric is an ``indicator``: bounded by the
      per-batch count → int32.

    Non-indicator sums stay int64 (a hot window's per-batch sum has no
    static bound); float columns are never touched (exactness).  The casts
    are checked (``safe=True``) so a violated declaration fails loudly.
    ``_merge_partials_table`` widens everything back to int64 after the
    shuffle, so the public schema is unchanged.
    """
    narrow = {"_n"}
    for m in spec.metrics:
        for a in m.needs():
            if (
                a == "cnt"
                or (a in ("min", "max") and (m.narrow_minmax or m.indicator))
                or (a == "sum" and m.indicator)
            ):
                narrow.add(spec._internal(m.col, a))
    cols = []
    for name in t.column_names:
        c = t[name]
        if name in narrow and pa.types.is_int64(c.type):
            c = pc.cast(c, pa.int32())
        cols.append(c)
    return pa.table(dict(zip(t.column_names, cols)))


def _dict_encode_keys(spec: RollupSpec, t: pa.Table) -> pa.Table:
    """Dictionary-encode string key columns of a partials table: each
    partial block carries one string per DISTINCT key plus int32 indices
    instead of one string per (key, window) row — the key strings are the
    widest thing crossing the exchange otherwise.  Decoded right after the
    shuffle (``_merge_partials_table``); a pure representation change."""
    for k in spec.keys:
        c = t[k]
        if pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
            enc = pc.dictionary_encode(
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            )
            t = t.set_column(t.column_names.index(k), k, enc)
    return t


#: partition-key fan-out of the merge shuffle.  At 10^12 turns this would
#: scale with cluster size (one partition ≈ one reducer's memory budget).
DEFAULT_MERGE_PARTITIONS = 64


def _stable_pkey(key_col: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    """Vectorized, process-stable partition id for the merge shuffle
    (polars xxhash — PYTHONHASHSEED-independent)."""
    import numpy as np
    import polars as pl

    arr = key_col.combine_chunks() if isinstance(key_col, pa.ChunkedArray) else key_col
    h = pl.Series(arr).hash(seed=0).to_numpy()
    return pa.array((h % np.uint64(num_partitions)).astype(np.int64))


class _PartialBatch:
    """Stateless per-batch combiner: assign window, pre-aggregate, tag the
    merge partition (``_pkey`` = hash of the primary key)."""

    def __init__(self, spec: RollupSpec, tier: str, num_partitions: int = DEFAULT_MERGE_PARTITIONS):
        self.spec, self.tier = spec, tier
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        ws = window_start_us(batch[spec.ts_col], self.tier)
        batch = batch.append_column("window_start", ws)
        out = _pa_partial(spec, batch)
        out = out.append_column(
            "_pkey",
            pc.cast(_stable_pkey(out[spec.keys[0]], self.num_partitions), pa.int32()),
        )
        # exchange-bytes reduction: int32 for statically-bounded partials,
        # dictionary indices for key strings (widened back post-shuffle)
        return _dict_encode_keys(spec, _narrow_partials(spec, out))


def _merge_partials_table(spec: RollupSpec, t: pa.Table) -> pa.Table:
    """Vectorized combine of partial rows within one table: count/sum/cnt
    merge by sum, min by min, max by max (all associative → exact).

    Any partition/bucket tag columns present (``_pkey``) ride along as
    extra group keys — they are functions of the primary key, so they
    never split a real group."""
    # group_by over a many-chunked table (one chunk per upstream run after
    # a shuffle) degrades sharply; one defragmenting copy first is cheap
    # (it also unifies the per-block key dictionaries)
    t = t.combine_chunks()
    # post-shuffle: decode dictionary-encoded key strings back to plain
    # strings (the narrow form only needs to exist ACROSS the exchange)
    for k in spec.keys:
        c = t[k]
        if pa.types.is_dictionary(c.type):
            t = t.set_column(t.column_names.index(k), k, pc.cast(c, c.type.value_type))
    group_keys = list(spec.keys) + ["window_start"]
    if "_pkey" in t.column_names:
        group_keys.append("_pkey")
    aggs: list[tuple[str, str]] = []
    renames: dict[str, str] = {}
    for name in t.column_names:
        if name in group_keys:
            continue
        fn = "min" if name.endswith("__min") else "max" if name.endswith("__max") else "sum"
        aggs.append((name, fn))
        renames[f"{name}_{fn}"] = name
    out = t.group_by(group_keys, use_threads=False).aggregate(aggs)
    out = out.rename_columns([renames.get(c, c) for c in out.column_names])
    # widen _narrow_partials' int32 partials back to int64 so every schema
    # downstream of the merge is byte-for-byte what it was pre-narrowing
    # (sums already promoted to int64 by the aggregate; min/max have not)
    for name in out.column_names:
        if name not in group_keys and pa.types.is_int32(out[name].type):
            out = out.set_column(
                out.column_names.index(name), name, pc.cast(out[name], pa.int64())
            )
    return out


def cascade_table(spec: RollupSpec, t: pa.Table, to_tier: str) -> pa.Table:
    """Pure-table tier cascade (used by Ray stages AND bucket-local
    compute in the checkpointed job): re-window + associative combine."""
    ws = rewindow_us(t["window_start"], to_tier)
    t = t.set_column(t.schema.get_field_index("window_start"), "window_start", ws)
    return _merge_partials_table(spec, t)


def finalize_table(spec: RollupSpec, batch: pa.Table, window_col: str = "window_start") -> pa.Table:
    """Pure-table partials → public tier rows (mean = sum/cnt,
    rate = sum/_n, window µs → timestamp)."""
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for k in spec.keys:
        cols[k] = batch[k]
    cols[window_col] = window_to_timestamp(batch["window_start"])
    n = batch["_n"]
    cols[spec.count_alias] = n
    for m in spec.metrics:
        if not m.public:
            continue
        p = m.out_prefix
        for a in m.aggs:
            if a == "mean":
                cols[f"{p}_mean"] = pc.divide(
                    pc.cast(batch[spec._internal(m.col, "sum")], pa.float64()),
                    pc.cast(batch[spec._internal(m.col, "cnt")], pa.float64()),
                )
            elif a == "count":
                cols[f"{p}_count"] = batch[spec._internal(m.col, "cnt")]
            else:
                cols[f"{p}_{a}"] = batch[spec._internal(m.col, a)]
    for out_name, col in spec.rates.items():
        cols[out_name] = pc.divide(
            pc.cast(batch[spec._internal(col, "sum")], pa.float64()),
            pc.cast(n, pa.float64()),
        )
    return pa.table(cols)


def _ray_merge(spec: RollupSpec, ds: Dataset) -> Dataset:
    """The one shuffle: co-locate each key's partials by ``_pkey`` (a
    coarse hash partition — cheap to shuffle), then merge them with ONE
    vectorized ``pyarrow`` group_by per partition.

    This deliberately avoids ``Dataset.aggregate``'s per-group accumulator
    machinery: measured ~20× faster on skinny partial rows (see
    BASELINE.md).  Exactness is unchanged — the merge is the same
    associative combine, just executed as a columnar kernel.
    """

    def merge_partition(t: pa.Table) -> pa.Table:
        return _merge_partials_table(spec, t)

    return ds.groupby("_pkey").map_groups(merge_partition, batch_format="pyarrow")


def rollup_partial(
    ds: Dataset,
    spec: RollupSpec,
    tier: str,
    *,
    batch_size: int | None = None,
) -> Dataset:
    """raw rows → merged per-(key, window) partials at ``tier``.

    Pipeline: ``map_batches(pre-aggregate, pyarrow, zero-copy)`` →
    ``groupby(keys+window).aggregate`` (the only shuffle; carries partials,
    not rows).

    ``batch_size=None`` (default) lets the combiner consume whole input
    blocks AND keeps Read→MapBatches operator fusion possible — with a
    batch_size set, Ray refuses to fuse a row-modifying read into the
    combiner and every raw batch crosses the object store once.
    """
    partials = ds.map_batches(
        _PartialBatch(spec, tier),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return _ray_merge(spec, partials)


def merge_partials(parts: list[Dataset], spec: RollupSpec) -> Dataset:
    """Continuous-aggregate merge: combine independently computed partial
    sets (e.g. yesterday's stored partials + today's delta rollup) into one
    exact partial set — ``finalize(merge_partials([rollup(a), rollup(b)]))``
    equals ``finalize(rollup(a ∪ b))`` because every carried stat is
    associative (count/sum/cnt by sum, min/max by min/max; mean derives at
    finalize only).

    This is the incremental-update half of the engine's continuous
    aggregates (north rule): new data is rolled up alone and merged into
    the standing tier without re-reading history.  The merge is one
    ``_pkey`` co-partition + one vectorized group_by per partition — the
    ``_pkey`` column each partial set already carries is a pure function of
    the primary key, so identical keys from different sets meet in the
    same partition by construction.

    Reference analog: the reference refreshes its pooled feature summaries
    by re-running the whole extractor (models_keras.py downsample
    cascades); here the refresh cost is proportional to the delta.
    """
    if not parts:
        raise ValueError("parts must be non-empty")
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return _ray_merge(spec, ds)


def cascade(ds_partial: Dataset, spec: RollupSpec, to_tier: str) -> Dataset:
    """Exact tier cascade: finer-tier partials → coarser-tier partials.

    Analog of the reference's pooled downsample cascade
    (models_keras.py:1386-1392): re-aggregate the finer tier, never the raw
    input.  Associative stats combine exactly; shuffle input is again
    pre-combined per batch.
    """

    combined = ds_partial.map_batches(
        lambda batch: cascade_table(spec, batch, to_tier),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _ray_merge(spec, combined)


def apply_retention(
    tier_ds: Dataset, *, window_col: str = "window_start", keep_from
) -> Dataset:
    """Retention cutoff: drop windows older than ``keep_from`` (a
    timestamp-like).  The streaming analog of the reference's positional
    head/tail splits (IGN_experiment.py:221-225; last-500k-rows holdout
    keras_experiment.py:33,39): retention = drop windows older than the
    tier horizon (SURVEY.md §2.6).

    In the checkpointed job layout, retention additionally deletes whole
    bucket files whose max window precedes the cutoff (cheap, metadata
    only); this operator is the row-level filter.
    """
    import numpy as np

    keep_from = pa.scalar(np.datetime64(keep_from, "us"))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[window_col], keep_from))

    return tier_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def finalize(
    ds_partial: Dataset,
    spec: RollupSpec,
    *,
    window_col: str = "window_start",
    sort: bool = False,
) -> Dataset:
    """Partials → public tier table.

    mean = sum/cnt, rate = sum/_n, window_start → timestamp[us]; internal
    columns dropped.  Optional sort for human-readable output (the driver's
    correctness compare is order-insensitive, so default off — a sort is an
    extra all-to-all at scale).
    """

    def to_public(batch: pa.Table) -> pa.Table:
        return finalize_table(spec, batch, window_col)

    out = ds_partial.map_batches(to_public, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        out = out.sort(list(spec.keys) + [window_col])
    return out


def hopping_rollup(
    ds: Dataset,
    spec: RollupSpec,
    *,
    size: "str | int",
    hop: "str | int",
) -> Dataset:
    """OVERLAPPING (hopping) event-time windows: every ``hop`` a window
    of length ``size`` opens, and each row belongs to ``size/hop``
    windows — the sliding-window aggregate of stream processors (and the
    aggregate analog of the reference's overlapping window generator,
    timeseries_batch_generator.py:186-221 ``length``/``stride``).

    Pane composition, NOT row duplication: rows pre-aggregate once into
    tumbling ``hop``-sized PANES (the standard rollup combiner + its one
    partials-only shuffle); each merged pane row is then replicated to
    the ``size/hop`` windows that contain it and re-combined WITHIN the
    partition (``_pkey`` is a function of the key alone, so no second
    exchange is needed).  Exchange bytes are identical to a tumbling
    rollup at ``hop``; the k-way amplification happens only on the tiny
    merged pane rows.  Windows with zero events do not appear (gap-fill
    downstream if a dense grid is wanted).

    ``size``/``hop``: tier names (``"1h"``) or raw µs ints; ``hop`` must
    divide ``size``.  Output: the same public schema as ``finalize``
    (keys, window_start, count, metric stats), one row per (key, window
    start) with ≥1 event.
    """
    import numpy as np

    size_us = _tier_us(size)
    hop_us = _tier_us(hop)
    if size_us % hop_us:
        raise ValueError(f"hop must divide size ({size_us} % {hop_us} != 0)")
    k = size_us // hop_us
    offs = np.arange(k, dtype=np.int64) * hop_us

    panes = ds.map_batches(
        _PartialBatch(spec, hop_us),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = _ray_merge(spec, panes)

    def explode_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), k)
        t2 = t.take(pa.array(idx))
        ws = t2["window_start"].to_numpy(zero_copy_only=False) \
            - np.tile(offs, t.num_rows)
        t2 = t2.set_column(t2.column_names.index("window_start"),
                           "window_start", pa.array(ws, pa.int64()))
        return _merge_partials_table(spec, t2)

    win = merged.map_batches(explode_merge, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
    return win.map_batches(lambda t: finalize_table(spec, t),
                           batch_format="pyarrow", zero_copy_batch=True)
