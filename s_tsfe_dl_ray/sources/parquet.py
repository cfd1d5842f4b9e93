"""Parquet sources with projection pushdown + ingest schema validation.

Analog of the reference's directory-scan reader (data.py:99-154
``read_mit_bih``: per-file read → segment → concat).  Ray Data's
``read_parquet`` already parallelizes over files/row-groups (SURVEY.md §4
"parallel input: free"); what we add is

- **column pruning at the read** (``columns=[...]``) so only needed bytes
  leave storage — a read that loads ``text`` for a count-only rollup is
  wrong at 100 TB;
- **schema validation** at ingest (reference: utils.py:96-102
  ``check_inputs``) — fail fast, not three stages downstream.
"""

from __future__ import annotations

import os

import ray.data

from ..schema import EVENTS_SCHEMA, TRANSCRIPTS_SCHEMA, validate_schema


def read_table(
    path: str,
    *,
    columns: list[str] | None = None,
    expected_schema=None,
    **kwargs,
) -> ray.data.Dataset:
    # One read task per file for sharded directories: Ray's default
    # coalesces fragments into few tasks, capping read parallelism AND
    # adding per-task overhead (measured: 17.6s → 9.7s single-core,
    # 12.2s → 4.3s at 4 cores, on a 77-shard 4.4 GB table).
    if "override_num_blocks" not in kwargs and os.path.isdir(path):
        nfiles = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        if nfiles > 1:
            kwargs["override_num_blocks"] = nfiles
    ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    if expected_schema is not None:
        subset = expected_schema
        if columns is not None:
            import pyarrow as pa

            subset = pa.schema([f for f in expected_schema if f.name in columns])
        validate_schema(ds.schema().base_schema, subset)
    return ds


def read_transcripts(path: str, *, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    return read_table(path, columns=columns, expected_schema=TRANSCRIPTS_SCHEMA, **kw)


def read_events(sf_dir_or_path: str, *, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    path = sf_dir_or_path
    if os.path.isdir(path):
        path = os.path.join(path, "events.parquet")
    return read_table(path, columns=columns, expected_schema=EVENTS_SCHEMA, **kw)


def read_csv_typed(
    path: str,
    *,
    dtypes: dict[str, "pa.DataType"] | None = None,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """CSV source with explicit per-column dtype casting.

    Analog of the reference's KDD-Cup reader (experiments/utils.py:4-85
    ``readDataset``: named columns + per-column dtype map before the
    one-hot expansion).  Casting happens in a vectorized ``map_batches``
    right after the read; pair with ``stages.transform.one_hot`` /
    ``binarize_label`` for the full readDataset pipeline.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_csv(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    if dtypes:
        def cast(t: pa.Table) -> pa.Table:
            for col, typ in dtypes.items():
                i = t.schema.get_field_index(col)
                if i >= 0 and t.schema.field(i).type != typ:
                    t = t.set_column(i, col, pc.cast(t[col], typ))
            return t

        ds = ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def parquet_layout_audit(paths: list[str]) -> "Dataset":
    """Physical-layout audit of a parquet fileset: one row per
    (file, row group) with row/column counts and compressed/uncompressed
    byte sizes — the input every 100 TB compaction / small-files /
    row-group-sizing decision reads (Ray Data's read parallelism and
    predicate pushdown are both bounded by this layout).

    Footer-only: each task reads parquet FOOTERS (KBs), never data
    pages, so auditing a petabyte fileset costs one metadata round per
    file.  The file list is distributed as a Dataset and footers are
    fetched inside ``map_batches`` — the driver never touches a footer.

    Output: ``file_name, row_group_id (int64), n_rows (int64),
    n_columns (int64), compressed_bytes (int64), uncompressed_bytes
    (int64)``.
    """
    import numpy as np

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    files = ray.data.from_items([{"file_name": p} for p in paths])

    def audit(t: pa.Table) -> pa.Table:
        names, rgids, rows, cols, comp, uncomp = [], [], [], [], [], []
        for p in t["file_name"].to_pylist():
            md = pq.ParquetFile(p).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                names.append(p)
                rgids.append(i)
                rows.append(rg.num_rows)
                cols.append(rg.num_columns)
                comp.append(sum(rg.column(j).total_compressed_size
                                for j in range(rg.num_columns)))
                uncomp.append(sum(rg.column(j).total_uncompressed_size
                                  for j in range(rg.num_columns)))
        return pa.table({
            "file_name": pa.array(names, pa.string()),
            "row_group_id": pa.array(np.array(rgids, dtype=np.int64)),
            "n_rows": pa.array(np.array(rows, dtype=np.int64)),
            "n_columns": pa.array(np.array(cols, dtype=np.int64)),
            "compressed_bytes": pa.array(np.array(comp, dtype=np.int64)),
            "uncompressed_bytes": pa.array(np.array(uncomp, dtype=np.int64)),
        })

    return files.map_batches(audit, batch_format="pyarrow")


def parquet_zonemap_audit(paths: list[str]) -> "Dataset":
    """Per-column zone-map (statistics) audit of a parquet fileset: for
    every (file, row group, column) — value count, null count, and
    whether min/max statistics exist.  Columns WITHOUT min/max stats
    defeat row-group pruning (`read_parquet(filters=…)` degrades to
    full scans), so at 100 TB this is the read-side health check that
    pairs with :func:`parquet_layout_audit`'s write-side sizing check.

    Footer-only and distributed exactly like the layout audit.
    Output: ``file_name, row_group_id (int64), column (string),
    n_values (int64), null_count (int64), has_min_max (bool)``.
    """
    import numpy as np

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    files = ray.data.from_items([{"file_name": p} for p in paths])

    def audit(t: pa.Table) -> pa.Table:
        names, rgids, cols, nvals, nulls, hasmm = [], [], [], [], [], []
        for p in t["file_name"].to_pylist():
            md = pq.ParquetFile(p).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    st = c.statistics
                    names.append(p)
                    rgids.append(i)
                    cols.append(c.path_in_schema)
                    nvals.append(c.num_values)
                    nulls.append(st.null_count if st is not None
                                 and st.has_null_count else 0)
                    hasmm.append(bool(st is not None and st.has_min_max))
        return pa.table({
            "file_name": pa.array(names, pa.string()),
            "row_group_id": pa.array(np.array(rgids, dtype=np.int64)),
            "column": pa.array(cols, pa.string()),
            "n_values": pa.array(np.array(nvals, dtype=np.int64)),
            "null_count": pa.array(np.array(nulls, dtype=np.int64)),
            "has_min_max": pa.array(hasmm, pa.bool_()),
        })

    return files.map_batches(audit, batch_format="pyarrow")


def plan_compaction(
    audit: "Dataset",
    *,
    target_bytes: int = 128 << 20,
    bytes_col: str = "compressed_bytes",
) -> "Dataset":
    """Greedy first-fit-decreasing compaction plan over a
    :func:`parquet_layout_audit` result: assign files to merge bins so
    each bin's total compressed size approaches ``target_bytes`` —
    the standard small-files remediation (too many tiny files starve
    Ray's read parallelism of useful work per task; the greedy FFD bound
    is ≤ 11/9·OPT + 1 bins).  The sibling of the token-level
    ``stages.text.pack_chunks`` greedy packer, at file grain.

    The plan is a driver-scale decision over file-level rows (one row
    per file — already ~10⁶× smaller than the data), so the fold runs
    on one partition by design.  Deterministic: files sorted by
    (size desc, name).  Files ≥ target get their own bin.
    Output: ``file_name, bin_id (int64), file_bytes (int64),
    bin_bytes (int64)`` sorted by (bin_id, file_name).
    """
    import numpy as np
    import pandas as pd

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        per_file = (
            df.groupby("file_name", sort=False)[bytes_col].sum()
            .reset_index()
            .sort_values([bytes_col, "file_name"],
                         ascending=[False, True], kind="mergesort")
        )
        bins: list[int] = []  # running byte total per bin
        assign = []
        for _, row in per_file.iterrows():
            sz = int(row[bytes_col])
            placed = None
            for bi, used in enumerate(bins):
                if used + sz <= target_bytes:
                    placed = bi
                    break
            if placed is None:
                bins.append(0)
                placed = len(bins) - 1
            bins[placed] += sz
            assign.append(placed)
        out = pd.DataFrame({
            "file_name": per_file["file_name"].to_numpy(),
            "bin_id": np.array(assign, dtype=np.int64),
            "file_bytes": per_file[bytes_col].to_numpy().astype(np.int64),
        })
        out["bin_bytes"] = out.groupby("bin_id")["file_bytes"].transform("sum")
        return out.sort_values(["bin_id", "file_name"],
                               kind="mergesort").reset_index(drop=True)

    return audit.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)
