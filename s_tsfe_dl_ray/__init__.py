"""s_tsfe_dl_ray — a Ray-Data-native time-series rollup + downsample +
retention engine, built from scratch with the query/data-processing
capabilities of the reference ari-dasci/S-TSFE-DL (see SURVEY.md).

The reference packages sliding-window feature extraction over ordered
sequences (windowed conv / pooling downsample / stateful recurrence /
global aggregates — SURVEY.md §0, §2).  This engine re-expresses those
semantics as continuous aggregates over Ray Data:

- windowed conv / pooling   → tiered tumbling-window rollups (1m/1h/1d)
                              with exact associative cascades
                              (reference: models_keras.py:137-142 Conv1D,
                              59-63 MaxPooling1D cascade levels)
- recurrent state scan      → per-key ordered scans + stateful actor-pool
                              codecs (Gorilla XOR / delta-of-delta)
                              (reference: models_keras.py:64 LSTM,
                              models_pytorch.py:204)
- window gap exclusion      → gap-fill (ffill / linear interpolation)
                              (reference: timeseries_batch_generator.py:238-256)
- autoencoder encode/decode → exact compress/decompress round-trip
                              (reference: models_keras.py:1055-1091)
- checkpoint weights        → per-partition lineage manifest + resume
                              (reference: test_keras.py:85-91 save/reload)

Everything is expressed Ray-Data-first: ``read_parquet → map_batches
(zero-copy Arrow) → groupby().aggregate()/map_groups → sort/limit →
write_parquet`` with partial aggregation before every shuffle.
No module in this package calls ``ray.init()``/``ray.shutdown()``.
"""

import os as _os

# polars sizes its global thread pool to ALL machine cores at import; in
# a Ray worker that means num_cpus-way oversubscription for the hash
# kernels (_stable_pkey / _stable_bucket) running in 32 concurrent
# 1-CPU tasks.  Every worker imports this package before any polars
# import, so pin the pool unless the user chose otherwise.
# Import-order caveat: the pin is a no-op if polars was already imported
# in this process (its pool is sized once, at first import) — hence the
# sys.modules guard.  It also pins the DRIVER process when the driver
# imports this package first; driver-side polars use is limited to the
# tiny hash-fingerprint probe, so single-threaded is fine there.
import sys as _sys

if "polars" not in _sys.modules:
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
