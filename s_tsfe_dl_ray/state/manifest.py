"""Per-partition lineage / checkpoint manifest.

The engine's durable-state analog of the reference's ``.h5`` weight
checkpoints + two-phase resume (ModelCheckpoint arrythmia_experiment.py:90;
frozen-encoder resume test_pytorch.py:125-133): after a partition (hash
bucket) of the rollup output is written, a manifest record is persisted so
a rerun skips that partition entirely (SURVEY.md §4 checkpoint/resume).

Layout under an output root::

    out_dir/tier=1m/bucket=00007.parquet     (temp-file + rename = atomic)
    out_dir/_manifest/bucket=00007.json      (written AFTER the data files)

Manifest record fields: bucket id, per-tier row counts + output paths +
content hashes, conv/key count, input fragment list hash, engine version.
The JSON is written atomically too, so a crash between data and manifest
just means that bucket is redone — never double-counted, never partial.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any

MANIFEST_DIR = "_manifest"


def bucket_name(bucket: int) -> str:
    return f"bucket={bucket:05d}"


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, bucket_name(bucket) + ".json")


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_manifest(out_dir: str, bucket: int, record: dict[str, Any]) -> None:
    atomic_write_bytes(
        manifest_path(out_dir, bucket),
        json.dumps(record, sort_keys=True, indent=1).encode(),
    )


def read_manifests(out_dir: str) -> dict[int, dict[str, Any]]:
    """All completed-bucket records (missing dir → empty: fresh job)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("bucket=") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            rec = json.load(f)
        out[int(rec["bucket"])] = rec
    return out


def fragments_hash(paths: list[str]) -> str:
    """Stable hash of the input fragment list (lineage identity)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


def file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
