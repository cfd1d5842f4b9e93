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
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, *, atol=1e-9, rtol=1e-9):
    """Order-insensitive, column-name-sorted comparison (mirrors the
    driver's compare: sort columns by name, sort rows, compare values)."""
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    cols = sorted(actual.columns)
    a = actual[cols].sort_values(cols).reset_index(drop=True)
    e = expected[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    pd.testing.assert_frame_equal(a, e, check_dtype=False, atol=atol, rtol=rtol)
