"""Ensemble execution (reference KimMinGu analog, models_keras.py:1169-1242):
N actor pools over one input + tagged union + soft-vote combine."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_ensemble_union_and_mean():
    import ray.data as rd

    from s_tsfe_dl_ray.pipelines.ensemble import ensemble_mean, ensemble_scores

    # defined in function scope so cloudpickle ships it by VALUE — Ray
    # workers can't import tests/ modules (not on their sys.path)
    class _AddScore:
        def __init__(self, offset: float):
            self.offset = offset

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"row_id": b["row_id"], "score": b["x"] + self.offset})

    df = pd.DataFrame({"row_id": np.arange(100), "x": np.arange(100) * 1.0})
    ds = rd.from_pandas(df).repartition(4)
    scored = ensemble_scores(ds, {
        "a": (_AddScore, {"offset": 0.0}),
        "b": (_AddScore, {"offset": 1.0}),
        "c": (_AddScore, {"offset": 2.0}),
    })
    sdf = scored.to_pandas()
    assert len(sdf) == 300
    assert set(sdf["member"]) == {"a", "b", "c"}

    combined = ensemble_mean(scored, id_cols=["row_id"]).to_pandas()
    combined = combined.sort_values("row_id").reset_index(drop=True)
    assert (combined["n_members"] == 3).all()
    assert np.allclose(combined["score_mean"], df["x"] + 1.0)
