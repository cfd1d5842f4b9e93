"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline smoke over /root/testdata/sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins for every SQL-expressible query; rows-only
queries (MinHash/SimHash LSH, IVF kNN, codec round-trip, transcript
pipelines over synthesized input) have no entry here by design.

Ray is initialised by the driver BEFORE this module is imported: nothing
below calls ``ray.init()``/``ray.shutdown()``.

Float policy: every oracle-paired float column is rounded to 6 decimals on
BOTH sides (pyarrow ``half_towards_infinity`` == DuckDB ``round`` half-away
-from-zero) so last-ulp association differences can't flip a value hash.
Residual risk (accepted, per round-2 advice): queries whose float64 sums
are irreducibly float (events_attention_pool exp-sums, events_value_variance,
events_ensemble_mean) sum partials in engine tree order vs DuckDB's
sequential order; a value landing exactly on a ...5 boundary at the 7th
decimal could flip the 6-decimal rounding.  Money/int-derivable sums are
decomposed onto exactly-summable bases (scaled int64 / decimal128) instead;
for the exp-sum/variance cases no exact base exists, so the risk is
documented here rather than hidden.

Driver row cap: the driver records exactly the first 50 entries of
``queries()`` — keep oracle-paired queries within the first 50 (see the
ORDER MATTERS note in s_tsfe_dl_ray/queries/registry.py).  With 410
registered queries (371 oracle-paired) the tail is ordered by
information value: the demoted round-3 wave (r4 driver rows on record)
first, then demoted veterans (r1–r3 rows), then the round-4/5 waves
(all oracle-paired, verified at driver scale by
tests/test_entry_contract.py), then the pytest-covered rows-only queries
(minhash dedup, IVF, EWMA, dup-words, mixture sampling, embedding-LSH
recall probe, simhash, rolling fingerprint, LTTB, media demos).  EWMA /
dup-words / mixture DO have exact DuckDB twins, but those live in pytest
(tests/test_ewma.py, tests/test_text.py) rather than ``oracle_sql()`` so
the driver never sees a registered oracle it cannot check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# helpers kept importable from here for compatibility (tests use
# _round_floats); bodies live in s_tsfe_dl_ray/queries/_common.py
from s_tsfe_dl_ray.queries._common import (  # noqa: F401
    _dd_round6, _events_gapfill, _round_floats, _transcripts_for,
)


def entry() -> Any:
    """Flagship: full tier cascade + gap-fill over sf0.001 events."""
    return _events_gapfill("/root/testdata/sf0.001", "ffill")


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordered query registry — FIRST 50 entries are the driver-recorded
    slots (see the ORDER MATTERS comment in
    s_tsfe_dl_ray/queries/registry.py)."""
    from s_tsfe_dl_ray.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins, one per SQL-expressible query
    (s_tsfe_dl_ray/queries/oracles.py)."""
    from s_tsfe_dl_ray.queries import build_oracle_sql

    return build_oracle_sql()
