"""Driver-contract rehearsal: run EVERY oracle-paired query at sf0.01 and
compare against its DuckDB oracle exactly like the driver does (sorted
columns, order-insensitive rows, value equality after the 6-decimal
rounding both sides apply).  Rows-only queries are smoke-checked."""

from __future__ import annotations

import sys

import pytest

from conftest import SF_CHECK, assert_frames_match, to_pdf

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402


@pytest.fixture(scope="module")
def views(ddb):
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        ddb.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_CHECK}/{t}.parquet'")
    return ddb


def test_every_oracle_key_has_a_query():
    q = entrymod.queries()
    missing = set(entrymod.oracle_sql()) - set(q)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_entry_smoke():
    out = to_pdf(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) >= {"user_id", "window_start", "n_events", "fill_method"}


_ORACLE_KEYS = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", _ORACLE_KEYS)
def test_oracle_paired_query(views, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    actual = to_pdf(q(SF_CHECK))
    expected = views.sql(sql).df()
    # exact: the driver hashes the (6-decimal-rounded) values — any
    # difference at all, including int-vs-float dtype family, is a fail
    assert_frames_match(actual, expected, atol=0, rtol=0, check_kind=True)


_ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(name):
    # run at the DRIVER's scale (sf0.01) — a query that only works at the
    # smoke scale would pass here but break in the correctness run
    out = to_pdf(entrymod.queries()[name](SF_CHECK))
    assert len(out) >= 0
    if name == "transcripts_codec_roundtrip":
        assert out["roundtrip_ok"].all()


def test_first_50_recorded_slots_all_oracle_paired():
    """The driver records rows for exactly the FIRST 50 queries()
    entries (insertion order) — every recorded slot must be
    oracle-paired or the driver logs a weaker rows-only check for it.
    Guards against an accidental dict reorder."""
    q = entrymod.queries()
    s = entrymod.oracle_sql()
    first50 = list(q)[:50]
    missing = [k for k in first50 if k not in s]
    assert not missing, f"recorded slots without oracle SQL: {missing}"
