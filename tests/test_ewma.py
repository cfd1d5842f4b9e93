"""EWMA (exponentially-weighted moving average) per key.

Oracle: a DuckDB RECURSIVE CTE computing the identical float64 recurrence
``y_0 = x_0; y_i = alpha*x_i + (1-alpha)*y_{i-1}`` — verified
bitwise-identical to pandas ``ewm(adjust=False)`` (both evaluate
``alpha*x + (1-alpha)*y`` in double; note ``1 - 0.3 == 0.7`` exactly in
IEEE754, so literal coefficients in the SQL match).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from conftest import SF_CHECK, assert_frames_match, to_pdf

EVENTS = f"{SF_CHECK}/events.parquet"
ALPHA = 0.3


def test_ewma_matches_duckdb_recursive_oracle(ddb):
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.transform import ewma

    ds = read_table(EVENTS, columns=["event_id", "user_id", "ts", "value"])
    actual = to_pdf(
        ewma(ds, keys=["user_id"], order_by=["ts", "event_id"],
             col="value", alpha=ALPHA, out_col="value_ewma")
    )[["event_id", "user_id", "value_ewma"]]
    expected = ddb.sql(
        f"""
        WITH RECURSIVE base AS (
            SELECT event_id, user_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM '{EVENTS}'
        ), r AS (
            SELECT event_id, user_id, rn, value AS value_ewma
            FROM base WHERE rn = 1
            UNION ALL
            SELECT b.event_id, b.user_id, b.rn,
                   {ALPHA}*b.value + {1 - ALPHA}*r.value_ewma
            FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1
        )
        SELECT event_id, user_id, value_ewma FROM r
        """
    ).df()
    # the recurrences are bitwise-identical -> exact compare
    assert_frames_match(actual, expected, atol=0.0, rtol=0.0, check_kind=True)


def test_ewma_salted_matches_unsalted(transcripts_small):
    """Mega-key mode: tiny salt window forces many chunks per hot
    conversation; the (v, w) carry fold reassociates float products, so
    equality is to float64 precision, not bitwise."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from s_tsfe_dl_ray.functions.derive import derive_transcript_columns
    from s_tsfe_dl_ray.sources.parquet import read_transcripts
    from s_tsfe_dl_ray.stages.transform import ewma

    def narrow(t: pa.Table) -> pa.Table:
        t = derive_transcript_columns(t)
        return t.select(["conv_id", "ts", "turn_idx"]).append_column(
            "value", pc.cast(t["token_len"], pa.float64())
        )

    ds = read_transcripts(
        transcripts_small, columns=["conv_id", "ts", "turn_idx", "text", "tool"]
    ).map_batches(narrow, batch_format="pyarrow")

    plain = to_pdf(
        ewma(ds, keys=["conv_id"], order_by=["ts", "turn_idx"],
             col="value", alpha=ALPHA)
    ).sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    salted = to_pdf(
        ewma(ds, keys=["conv_id"], order_by=["ts", "turn_idx"],
             col="value", alpha=ALPHA, salt_every_us=3_600_000_000)
    ).sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    assert len(plain) == len(salted) > 0
    np.testing.assert_allclose(
        plain["value_ewma"].to_numpy(), salted["value_ewma"].to_numpy(),
        rtol=1e-12, atol=1e-9,
    )


def test_ewma_single_key_sequence_exact():
    """One key, known sequence: engine output equals the hand recurrence."""
    import ray.data as rd

    from s_tsfe_dl_ray.stages.transform import ewma

    x = [10.0, 20.0, 0.0, 5.0, 5.0]
    df = pd.DataFrame({"k": ["a"] * 5, "ts": range(5), "value": x})
    got = to_pdf(
        ewma(rd.from_pandas(df), keys=["k"], order_by=["ts"],
             col="value", alpha=ALPHA)
    ).sort_values("ts")["value_ewma"].to_numpy()
    acc, exp = x[0], [x[0]]
    for xi in x[1:]:
        acc = ALPHA * xi + (1 - ALPHA) * acc
        exp.append(acc)
    np.testing.assert_array_equal(got, np.array(exp))


def test_ewma_alpha_validation():
    import pytest
    import ray.data as rd

    from s_tsfe_dl_ray.stages.transform import ewma

    ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "ts": [0], "value": [1.0]}))
    with pytest.raises(ValueError):
        ewma(ds, keys=["k"], order_by=["ts"], col="value", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(ds, keys=["k"], order_by=["ts"], col="value", alpha=1.5)
