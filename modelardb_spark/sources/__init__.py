"""Input sources for transcripts-shaped data."""

from modelardb_spark.sources.readers import (
    read_transcripts_csv,
    read_transcripts_orc,
    read_transcripts_parquet,
    register_external_table,
)

__all__ = [
    "read_transcripts_csv",
    "read_transcripts_parquet",
    "read_transcripts_orc",
    "register_external_table",
]
