"""Schema constants + ingest validation.

The reference declares a fixed implicit schema ``(N, T, V)`` at graph
construction and validates it by assertion (reference: utils.py:96-102
``check_inputs``; models_keras.py:625-634 channel checks).  The engine
makes the schema explicit Arrow and validates at ingest.
"""

from __future__ import annotations

import pyarrow as pa

# Primary engine input (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Driver-provided stream table (/root/testdata/sf*/events.parquet).
EVENTS_SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ]
)


class SchemaError(ValueError):
    pass


def validate_schema(actual: pa.Schema, expected: pa.Schema, *, subset: bool = True) -> None:
    """Assert `actual` carries the expected columns with expected types.

    ``subset=True`` allows extra columns in `actual` (projection happens at
    the read, so usually actual ⊆ expected is what we check per stage).
    Analog of the reference's ``check_inputs`` (utils.py:61-104).
    """
    for field in expected:
        idx = actual.get_field_index(field.name)
        if idx < 0:
            raise SchemaError(f"missing column {field.name!r}; have {actual.names}")
        have = actual.field(idx).type
        if have != field.type:
            raise SchemaError(
                f"column {field.name!r} has type {have}, expected {field.type}"
            )
    if not subset:
        extra = set(actual.names) - {f.name for f in expected}
        if extra:
            raise SchemaError(f"unexpected columns {sorted(extra)}")
