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


def test_holt_matches_sequential_reference():
    """Holt level/trend/forecast equal the literal recurrence fold per
    key under multi-block input; linear ramp converges to slope 1."""
    import numpy as np
    import pandas as pd
    import ray

    from s_tsfe_dl_ray.stages.transform import holt_smooth

    t0 = 1_704_067_200_000_000
    rng = np.random.default_rng(3)
    rows = []
    for k in range(6):
        for i in range(200):
            rows.append((f"k{k}", t0 + i * 1_000_000,
                         float(i) if k == 0 else rng.normal(10, 2)))
    df = pd.DataFrame(rows, columns=["k", "ts_us", "v"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    df["i"] = range(len(df))
    a, b = 0.5, 0.3
    out = to_pdf(holt_smooth(
        ray.data.from_pandas(df).repartition(5),
        keys=["k"], order_by=["ts", "i"], col="v", alpha=a, beta=b,
    )).sort_values(["k", "i"]).reset_index(drop=True)
    # independent sequential reference
    exp_l, exp_t = [], []
    for k, g in df.sort_values(["k", "ts", "i"]).groupby("k"):
        l = tr = None
        for j, x in enumerate(g["v"]):
            if j == 0:
                l, tr = float(x), 0.0
            else:
                ln = a * x + (1 - a) * (l + tr)
                tr = b * (ln - l) + (1 - b) * tr
                l = ln
            exp_l.append(l)
            exp_t.append(tr)
    np.testing.assert_allclose(out.holt_level.to_numpy(), exp_l, rtol=1e-12)
    np.testing.assert_allclose(out.holt_trend.to_numpy(), exp_t, rtol=1e-12)
    np.testing.assert_allclose(out.holt_forecast.to_numpy(),
                               np.array(exp_l) + np.array(exp_t), rtol=1e-12)
    # ramp key: trend converges to the true slope 1, forecast ~ next value
    ramp = out[out.k == "k0"].iloc[-1]
    np.testing.assert_allclose(ramp.holt_trend, 1.0, atol=1e-3)
    np.testing.assert_allclose(ramp.holt_forecast, 200.0, atol=0.01)


def test_holt_salted_parity():
    """Affine (A^n, v) chunk summaries reproduce the unsalted fold
    across chunk boundaries to float64 association."""
    import numpy as np

    from conftest import SF_CHECK
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.transform import holt_smooth

    EV = f"{SF_CHECK}/events.parquet"
    kw = dict(keys=["user_id"], order_by=["ts", "event_id"], col="value",
              alpha=0.4, beta=0.2)
    cols = ["event_id", "user_id", "ts", "value"]
    base = to_pdf(holt_smooth(read_table(EV, columns=cols), **kw)) \
        .sort_values("event_id").reset_index(drop=True)
    salted = to_pdf(holt_smooth(read_table(EV, columns=cols), **kw,
                                salt_every_us=2 * 86_400_000_000)) \
        .sort_values("event_id").reset_index(drop=True)
    for c in ("holt_level", "holt_trend", "holt_forecast"):
        np.testing.assert_allclose(base[c].to_numpy(), salted[c].to_numpy(),
                                   rtol=1e-9, atol=1e-9)
