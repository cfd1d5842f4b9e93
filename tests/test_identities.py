"""Property tests (hypothesis, no Ray) for the algebraic identities the
round-3 operators rely on: if these hold for arbitrary inputs, the
distributed dataflows built on them are exact by construction."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

floats = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(floats, min_size=1, max_size=60), floats)
def test_cusum_reflected_walk_identity(xs, target):
    """s_i = max(0, s_{i-1} + x - k)  ==  c_i − min(0, min_{j≤i} c_j)
    (stages/scan.cusum's vectorization)."""
    x = np.array(xs) - target
    c = np.cumsum(x)
    m = np.minimum.accumulate(c)
    vec = np.maximum(c - np.minimum(m, 0.0), 0.0)
    s, seq = 0.0, []
    for v in x:
        s = max(0.0, s + v)
        seq.append(s)
    np.testing.assert_allclose(vec, seq, rtol=1e-9, atol=1e-9)


@settings(max_examples=100, deadline=None)
@given(st.lists(floats, min_size=1, max_size=40),
       st.lists(floats, min_size=1, max_size=40),
       st.floats(min_value=0.05, max_value=1.0),
       st.floats(min_value=0.0, max_value=1.0))
def test_holt_affine_composition(xs1, xs2, alpha, beta):
    """Chunk 2 started from chunk 1's end state equals the single
    uninterrupted fold — and the (A^n, v) summary reproduces the same
    state without seeing chunk 2's carry (stages/transform.holt_smooth's
    salted mode)."""
    A = np.array([[1 - alpha, 1 - alpha],
                  [-alpha * beta, 1 - alpha * beta]])

    def fold(x, s0):
        if s0 is None:
            l, b = float(x[0]), 0.0
            rest = x[1:]
        else:
            l, b = s0
            rest = x
        for v in rest:
            ln = alpha * v + (1 - alpha) * (l + b)
            b = beta * (ln - l) + (1 - beta) * b
            l = ln
        return np.array([l, b])

    whole = fold(xs1 + xs2, None)
    s1 = fold(xs1, None)
    chained = fold(xs2, tuple(s1))
    np.testing.assert_allclose(chained, whole, rtol=1e-9, atol=1e-6)
    # affine summary of chunk 2: s_end = A^n s_in + v
    v = fold(xs2, (0.0, 0.0))
    M = np.linalg.matrix_power(A, len(xs2))
    summarized = M @ s1 + v
    np.testing.assert_allclose(summarized, chained, rtol=1e-7, atol=1e-4)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30),
                min_size=1, max_size=300),
       st.integers(min_value=1, max_value=8))
def test_misra_gries_trim_bound(items, capacity):
    """After the MG decrement trim, est ≤ true ≤ est + err for every
    surviving item, and every item with true count > err survives
    (stages/distinct.heavy_hitters' per-summary guarantee)."""
    vals, cnts = np.unique(np.array(items), return_counts=True)
    err = 0
    v, c = vals.copy(), cnts.copy().astype(np.int64)
    while len(c) > capacity:
        kth = np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1]
        keep = c > kth
        v, c = v[keep], c[keep] - kth
        err += int(kth)
    true = dict(zip(vals.tolist(), cnts.tolist()))
    est = dict(zip(v.tolist(), c.tolist()))
    for item, e in est.items():
        assert e <= true[item] <= e + err
    for item, t in true.items():
        if t > err:
            assert item in est


def test_expectations_detect_violations():
    """Each rule kind actually fires on a corpus built to violate it."""
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.schema import expectations_report

    df = pd.DataFrame({
        "event_id": [1, 1, 2, 3],            # dup PK
        "event_type": ["view", "bogus", "view", "view"],
        "value": [5.0, None, 2000.0, 7.0],   # null + out-of-range
        "props": ["{}", "nope", "{}", "{}"],
    })
    rules = [
        {"rule": "not_null", "col": "value"},
        {"rule": "unique", "col": "event_id"},
        {"rule": "in_set", "col": "event_type",
         "values": ["view", "click"]},
        {"rule": "range", "col": "value", "lo": -1000.0, "hi": 1000.0},
        {"rule": "regex", "col": "props", "pattern": r"\{.*\}"},
    ]
    out = to_pdf(expectations_report(
        ray.data.from_pandas(df), rules)).set_index("rule_id")
    assert out.loc[0, "n_violations"] == 1 and not out.loc[0, "passed"]
    assert out.loc[1, "n_violations"] == 1          # one extra copy of PK 1
    assert out.loc[2, "n_violations"] == 1          # 'bogus'
    assert out.loc[3, "n_violations"] == 2          # null + 2000.0
    assert out.loc[4, "n_violations"] == 1          # 'nope'
    assert (out.n_checked == 4).all()
