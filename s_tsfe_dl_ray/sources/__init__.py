from .parquet import read_events, read_table, read_transcripts  # noqa: F401
