"""Watermark semantics: a row arriving beyond the watermark horizon is
dropped from the windowed aggregate (append mode), on-time rows are not."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from arabic_ocr_spark.streaming.stream_job import streaming_events_hourly


def _events_table(rows):
    import numpy as np

    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows]),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    d = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)

    outdir = str(tmp_path / "agg_out")

    def drain(_name):
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).parquet(d)
        q = (
            streaming_events_hourly(stream)
            .writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # drain 1: on-time events advance the watermark to 13:00 - 2h = 11:00
    pq.write_table(_events_table([
        (1, "2024-01-01T09:30:00", "click"),
        (2, "2024-01-01T09:40:00", "click"),
        (3, "2024-01-01T13:00:00", "view"),
    ]), os.path.join(d, "part-0.parquet"))
    drain("wm_a")
    # drain 2: one LATE click at 09:45 (< 11:00 watermark -> dropped) and one
    # fresh event that advances the stream further
    pq.write_table(_events_table([
        (4, "2024-01-01T09:45:00", "click"),
        (5, "2024-01-01T15:10:00", "view"),
    ]), os.path.join(d, "part-1.parquet"))
    drain("wm_b")

    rows = spark.read.parquet(outdir).collect()
    out = {}
    for r in rows:
        k = (r.hour.isoformat(), r.event_type)
        out[k] = out.get(k, 0) + r.n_events
    # the 09:00 click window CLOSED with 2 events; the late 09:45 click did
    # not resurrect or amend it
    assert out.get(("2024-01-01T09:00:00", "click")) == 2
    assert all(et != "click" or h == "2024-01-01T09:00:00" for (h, et) in out)
