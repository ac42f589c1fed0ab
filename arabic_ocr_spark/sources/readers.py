"""Transcript table readers for the formats a corpus actually arrives in.

The production source is an Iceberg/parquet table with the input-hint
schema (conv_id, turn_idx, role, text, tool, ts); ingest drops also land as
CSV or JSONL.  Every reader applies the SAME explicit schema — schema
inference over 10^12 rows is both a full extra scan and a correctness
hazard (a conv_id column of digit-like strings must stay a string), so it
is never used.  Column pruning and filter pushdown work identically on all
three (Catalyst handles parquet natively; CSV/JSON get column pruning and
partition pruning, with row-level filters evaluated post-parse)."""

from __future__ import annotations

from pyspark.sql import DataFrame

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_FORMATS = ("parquet", "csv", "json")


def read_transcripts(spark, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Transcripts table from `path` in parquet / csv / json(l), with the
    canonical schema enforced.  CSV defaults to headered, escaped-quote
    files; pass reader options through **options to override."""
    from pyspark.sql import functions as F

    if fmt not in _FORMATS:
        raise ValueError(f"unsupported transcripts format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.schema(TRANSCRIPTS_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", "true").option("escape", '"')
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path)
    if fmt in ("csv", "json"):
        # CSV cannot distinguish '' from null, and JSONL rows may omit keys
        # or carry explicit nulls; the transcripts contract uses empty
        # strings for blank turns/roles/tools, so normalize both formats to
        # it (otherwise null-text rows silently vanish from text != ''
        # payload filters that '' rows pass through)
        for c in ("conv_id", "role", "text", "tool"):
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return df
