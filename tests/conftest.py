"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_small(tmp_path_factory):
    """Deterministic ~50k-turn transcript parquet (seed 42)."""
    from s_tsfe_dl_ray.synth import transcripts_parquet

    base = str(tmp_path_factory.mktemp("synth"))
    return transcripts_parquet(n_turns=50_000, seed=42, base_dir=base)


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def to_pdf(result) -> pd.DataFrame:
    """Normalize a Dataset / pyarrow.Table / DataFrame to pandas."""
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        df = result.to_pandas()
        if len(df.columns) == 0 and len(df) == 0:
            # Ray drops the schema of a fully-empty dataset at
            # to_pandas() even when schema() still knows it — rebuild
            # the typed empty frame so empty-result parity is checkable
            sch = result.schema()
            if sch is not None:
                base = getattr(sch, "base_schema", None)
                if isinstance(base, pa.Schema):
                    return base.empty_table().to_pandas()
                if base is not None:  # PandasBlockSchema
                    return pd.DataFrame(
                        {n: pd.Series([], dtype=t)
                         for n, t in zip(base.names, base.types)})
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def assert_frames_match(
    actual: pd.DataFrame, expected: pd.DataFrame, *, atol=1e-9, rtol=1e-9,
    check_kind=False,
):
    """Order-insensitive, column-name-sorted comparison (mirrors the
    driver's compare: sort columns by name, sort rows, compare values).

    ``check_kind=True`` additionally requires each column's dtype FAMILY
    (integer vs float) to agree — the driver's value-hash distinguishes
    ``1`` from ``1.0`` (round-1 `events_sessionize_30m` lesson), so an
    engine int64 against an oracle float64 is a hash fail even when every
    value is numerically equal."""
    if len(actual.columns) == 0 and len(actual) == 0 and len(expected) == 0:
        # Ray discards fully-empty blocks, so a legitimately-empty result
        # loses its schema (Dataset.schema() is None); 0 rows == 0 rows
        # is the strongest check available there (documented limitation)
        return
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    if check_kind:
        fam = lambda k: "int" if k in "iu" else "float" if k in "fc" else "other"
        bad = [
            (c, actual[c].dtype, expected[c].dtype)
            for c in actual.columns
            if fam(actual[c].dtype.kind) != fam(expected[c].dtype.kind)
        ]
        assert not bad, f"dtype family mismatch (engine vs oracle): {bad}"
    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in df.columns:
            if df[c].dtype.kind == "M":  # normalize datetime64 unit (ns vs us)
                df[c] = df[c].astype("datetime64[us]")
        return df

    actual, expected = norm(actual), norm(expected)
    cols = sorted(actual.columns)
    # Classify jointly: a column is "float" if float in EITHER frame
    # (DuckDB returns sum(int) as float64 while the engine keeps int64 —
    # per-frame classification would sort with different column priorities
    # and misalign rows).
    floats = [
        c for c in cols
        if actual[c].dtype.kind in "fc" or expected[c].dtype.kind in "fc"
    ]
    exact = [c for c in cols if c not in floats]

    def ordered(df: pd.DataFrame) -> pd.DataFrame:
        # Row alignment: sort by exact columns first; float columns only as
        # coarsely-rounded tiebreakers, so ~1e-13 float-association diffs
        # between engine and oracle can't flip the row order.
        key_df = df.assign(
            **{f"__r_{c}": df[c].astype("float64").round(3) for c in floats}
        )
        order = key_df.sort_values(exact + [f"__r_{c}" for c in floats]).index
        return df.loc[order, cols].reset_index(drop=True)

    a, e = ordered(actual), ordered(expected)
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    if atol == 0 and rtol == 0:
        # Driver emulation: the driver rounds float columns to 6 decimals on
        # BOTH sides before hashing (so last-ulp engine-vs-DuckDB rounding
        # differences collapse), then compares exactly.
        import numpy as np

        for c in floats:
            a[c] = np.round(a[c].astype("float64"), 6)
            e[c] = np.round(e[c].astype("float64"), 6)
        pd.testing.assert_frame_equal(a, e, check_dtype=False, atol=0, rtol=0)
    else:
        pd.testing.assert_frame_equal(a, e, check_dtype=False, atol=atol, rtol=rtol)
