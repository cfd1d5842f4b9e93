"""Golden tests for stages/dialog.py conversation-structure operators.
(Oracle parity over the pinned 60k-turn synth corpus is covered by
test_entry_contract.py; these pin hand-computable micro-corpora.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from s_tsfe_dl_ray.stages.dialog import (
    context_cost,
    role_balance,
    role_transitions,
    tool_chain_streaks,
    tool_usage,
)


def _turns(rows):
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return ray.data.from_pandas(df)


_CORPUS = [
    # conv a: u -> a -> tool -> tool -> a   (tool streak of 2)
    ("a", 0, "user", "hi there", ""),
    ("a", 1, "assistant", "hello", "search"),
    ("a", 2, "tool", "result one", "search"),
    ("a", 3, "tool", "result two", "bash"),
    ("a", 4, "assistant", "done", ""),
    # conv b: single user turn, no tools
    ("b", 0, "user", "ping", ""),
]


def test_role_transitions_golden():
    out = role_transitions(_turns(_CORPUS)).to_pandas()
    out = out.set_index(["role_from", "role_to"])
    # conv a transitions: u->a, a->t, t->t, t->a; conv b has none
    assert out.loc[("user", "assistant"), "n_transitions"] == 1
    assert out.loc[("assistant", "tool"), "n_transitions"] == 1
    assert out.loc[("tool", "tool"), "n_transitions"] == 1
    assert out.loc[("tool", "assistant"), "n_transitions"] == 1
    assert out["n_transitions"].sum() == 4
    # fractions leaving "tool" split 50/50
    assert out.loc[("tool", "tool"), "frac_from"] == 0.5
    assert out.loc[("user", "assistant"), "frac_from"] == 1.0


def test_tool_chain_streaks_golden():
    out = tool_chain_streaks(_turns(_CORPUS)).to_pandas().set_index("conv_id")
    assert out.loc["a", "n_turns"] == 5
    assert out.loc["a", "n_tool_calls"] == 3
    # turns 1,2 carry tool (idx 1,2,3): streak = 3 consecutive
    assert out.loc["a", "longest_tool_streak"] == 3
    assert out.loc["b", "n_tool_calls"] == 0
    assert out.loc["b", "longest_tool_streak"] == 0


def test_context_cost_golden():
    out = context_cost(_turns(_CORPUS)).to_pandas().set_index("conv_id")
    lens = [8, 5, 10, 10, 4]  # char lengths of conv a texts
    pref = np.cumsum(lens)
    assert out.loc["a", "n_turns"] == 5
    assert out.loc["a", "total_chars"] == sum(lens)
    assert out.loc["a", "max_turn_chars"] == 10
    assert out.loc["a", "context_cost"] == pref.sum()
    assert out.loc["b", "context_cost"] == 4  # "ping"


def test_role_balance_golden():
    out = role_balance(_turns(_CORPUS)).to_pandas().set_index("conv_id")
    assert out.loc["a", "n_user"] == 1 and out.loc["a", "n_assistant"] == 2
    assert out.loc["a", "user_chars"] == 8
    assert out.loc["a", "assistant_chars"] == 5 + 4
    assert abs(out.loc["a", "assistant_user_ratio"] - 9 / 8) < 1e-12
    assert out.loc["b", "n_assistant"] == 0
    assert out.loc["b", "assistant_user_ratio"] == 0.0  # 0 / 4


def test_tool_usage_golden():
    out = tool_usage(_turns(_CORPUS)).to_pandas().set_index("tool")
    assert out.loc["search", "n_calls"] == 2
    assert out.loc["search", "n_convs"] == 1
    assert out.loc["bash", "n_calls"] == 1
    # search carries "hello"(5) + "result one"(10) = 15 chars
    assert out.loc["search", "total_call_chars"] == 15
    assert abs(out.loc["search", "mean_call_chars"] - 7.5) < 1e-12
    assert abs(out.loc["search", "share_of_calls"] - 2 / 3) < 1e-12
    assert len(out) == 2


def test_hourly_profile_golden():
    from s_tsfe_dl_ray.stages.dialog import hourly_profile

    t = pd.Timestamp
    rows = [
        ("a", 0, "user", "x", "", t("2024-01-01 09:10")),
        ("a", 1, "assistant", "y", "bash", t("2024-01-01 09:50")),
        ("a", 2, "user", "z", "", t("2024-01-01 10:05")),
        ("b", 0, "user", "w", "sql", t("2024-01-01 09:30")),
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "text", "tool", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = hourly_profile(ray.data.from_pandas(df)).to_pandas() \
        .set_index("hour")
    assert out.loc[9, "n_turns"] == 3
    assert out.loc[9, "n_tool_calls"] == 2
    assert out.loc[9, "n_convs"] == 2
    assert out.loc[10, "n_turns"] == 1 and out.loc[10, "n_convs"] == 1
    assert len(out) == 2


def test_final_role_distribution_golden():
    from s_tsfe_dl_ray.stages.dialog import final_role_distribution

    out = final_role_distribution(_turns(_CORPUS)).to_pandas() \
        .set_index("final_role")
    # conv a ends with assistant, conv b with user
    assert out.loc["assistant", "n_convs"] == 1
    assert out.loc["user", "n_convs"] == 1
    assert abs(out.loc["user", "frac"] - 0.5) < 1e-12
    assert len(out) == 2
