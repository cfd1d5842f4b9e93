"""Sliding-window feature generator (reference window-generator
semantics: length/stride/sampling_rate, full windows only) + reverse."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _mk(n=40, keys=2):
    rng = np.random.default_rng(5)
    return pd.DataFrame({
        "k": np.repeat([f"u{i}" for i in range(keys)], n),
        "i": np.tile(np.arange(n), keys),
        "v": rng.normal(10, 3, n * keys).round(3),
    })


def test_sliding_matches_naive_with_dilation():
    import ray.data as rd

    from s_tsfe_dl_ray.stages.slide import sliding_window_features

    df = _mk()
    L, S, r = 4, 2, 3
    out = sliding_window_features(
        rd.from_pandas(df).repartition(3),
        keys=["k"], order_by=["i"], value_col="v",
        length=L, stride=S, sampling_rate=r, stats=("mean", "min", "max", "sum"),
    ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)

    # naive oracle: explicit python windows
    rows = []
    span = (L - 1) * r + 1
    for k, g in df.groupby("k"):
        v = g.sort_values("i")["v"].to_numpy()
        for end in range(span - 1, len(v), S):
            w = v[end - (L - 1) * r : end + 1 : r]
            assert len(w) == L
            rows.append((k, g["i"].iloc[end], w.mean(), w.min(), w.max(), w.sum()))
    exp = pd.DataFrame(rows, columns=["k", "i", "m", "lo", "hi", "s"]) \
        .sort_values(["k", "i"]).reset_index(drop=True)
    assert len(out) == len(exp)
    assert np.allclose(out["v_wmean"], exp["m"])
    assert np.allclose(out["v_wmin"], exp["lo"])
    assert np.allclose(out["v_wmax"], exp["hi"])
    assert np.allclose(out["v_wsum"], exp["s"])


def test_reverse_series_positions():
    import ray.data as rd

    from s_tsfe_dl_ray.stages.slide import reverse_series

    df = _mk(n=10)
    out = reverse_series(
        rd.from_pandas(df).repartition(2), keys=["k"], order_by=["i"]
    ).to_pandas()
    for k, g in out.groupby("k"):
        g = g.sort_values("rev_idx")
        assert (g["i"].to_numpy() == np.arange(9, -1, -1)).all()


def test_window_pairs_matches_naive():
    """Reference forecasting-generator slices
    (timeseries_batch_generator.py:186-299): input v[p-L:p:r], label
    v[p:p+Lt:r], anchors p in [L, n-1-Lt] stepped by stride (the
    reference's end_index bound) — brute-force parity across
    lengths/strides/dilations incl. too-short keys, the Lt=0
    autoencoder behaviour, and the multi-feature value_cols form."""
    import ray.data as rd

    from s_tsfe_dl_ray.stages.slide import window_pairs

    rng = np.random.default_rng(11)
    rows = []
    for k in range(10):
        n = int(rng.integers(0, 35))
        for i in range(n):
            rows.append({"k": f"u{k}", "i": i,
                         "v": int(rng.integers(-9, 120))})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(3)
    for (L, Lt, S, r) in [(3, 2, 1, 1), (4, 3, 2, 1), (5, 2, 3, 2),
                          (1, 1, 1, 1), (6, 4, 2, 3)]:
        out = window_pairs(ds, keys=["k"], order_by=["i"], value_col="v",
                           length=L, length_target=Lt, stride=S,
                           sampling_rate=r).to_pandas()
        exp = []
        for k, g in df.groupby("k"):
            v = g.sort_values("i")["v"].to_numpy()
            for p in range(L, len(v) - Lt):
                if (p - L) % S:
                    continue
                exp.append((k, p, tuple(v[p - L:p:r]),
                            tuple(v[p:p + Lt:r])))
        got = sorted((t.k, t.anchor_idx, tuple(t.input_win),
                      tuple(t.label_win)) for t in out.itertuples())
        assert got == sorted(exp), (L, Lt, S, r)

    # autoencoder behaviour: Lt = 0 → labels == inputs, anchors to n-1
    out0 = window_pairs(ds, keys=["k"], order_by=["i"], value_col="v",
                        length=3, length_target=0, stride=2).to_pandas()
    assert len(out0) and all(tuple(a) == tuple(b) for a, b in
                             zip(out0.input_win, out0.label_win))
    exp0 = sum(1 for k, g in df.groupby("k")
               for p in range(3, len(g)) if (p - 3) % 2 == 0)
    assert len(out0) == exp0

    # multi-feature form: one list-column pair per value col
    df2 = df.assign(w=df["v"] * 2 + 1)
    ds2 = rd.from_pandas(df2).repartition(3)
    outm = window_pairs(ds2, keys=["k"], order_by=["i"],
                        value_cols=["v", "w"], length=3,
                        length_target=2).to_pandas()
    assert {"input_v", "label_v", "input_w", "label_w"} <= set(outm)
    assert all(tuple(np.asarray(a) * 2 + 1) == tuple(b)
               for a, b in zip(outm.input_v, outm.input_w))
