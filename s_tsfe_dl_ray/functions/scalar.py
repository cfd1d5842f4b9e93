"""Elementwise scalar-function layer (vectorized pyarrow kernels).

The engine analog of the reference's activation/elementwise zoo —
relu/elu/tanh/sigmoid/LeakyReLU applied pervasively
(models_keras.py:636, 910), the custom clipped-log loss ``en_loss``
(models_keras.py:1538-1550: log/pow/clip), and per-row |a−b| scoring
(experiments/utils.py:139-155).  Each function takes/returns an Arrow
array so it composes inside any ``map_batches`` at zero copies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ArrowCol = "pa.Array | pa.ChunkedArray"


def relu(x):
    return pc.max_element_wise(x, pa.scalar(0.0))


def leaky_relu(x, alpha: float = 0.01):
    return pc.max_element_wise(x, pc.multiply(x, pa.scalar(alpha)))


def sigmoid(x):
    # exp via pc: 1 / (1 + e^-x); pyarrow has exp
    return pc.divide(
        pa.scalar(1.0),
        pc.add(pa.scalar(1.0), pc.exp(pc.negate(pc.cast(x, pa.float64())))),
    )


def tanh(x):
    arr = x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
    return pa.array(np.tanh(np.asarray(pc.cast(arr, pa.float64()))))


def clip(x, lo: float, hi: float):
    return pc.min_element_wise(pc.max_element_wise(x, pa.scalar(float(lo))), pa.scalar(float(hi)))


def log_safe(x, eps: float = 1e-12):
    """ln(max(x, eps)) — the reference's clipped log (en_loss pattern)."""
    return pc.ln(pc.max_element_wise(pc.cast(x, pa.float64()), pa.scalar(eps)))


def abs_error(a, b):
    """|a − b| per row (reference computeScore, experiments/utils.py:155)."""
    return pc.abs(pc.subtract(pc.cast(a, pa.float64()), pc.cast(b, pa.float64())))


def softmax_rows(mat: np.ndarray) -> np.ndarray:
    """Row-wise softmax over a dense (N, C) block — used where a
    per-window probability vector is carried as list<float>
    (reference softmax-mean: models_keras.py:1474-1477)."""
    m = mat - mat.max(axis=1, keepdims=True)
    e = np.exp(m)
    return e / e.sum(axis=1, keepdims=True)
