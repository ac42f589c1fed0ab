"""The batch extraction job: Spark plan around the pure-NumPy kernel.

Plan shape (SURVEY.md §2.7/§4; the reference's serial file loop
re-expressed as a DataFrame program, reference segment_words.py:234-277):

    scan (Iceberg table or parquet; Catalyst pushes the column prune +
          payload-bearing-row filter into the source)
 -> salted chunk assignment: chunk = pmod(xxhash64(conv_id, salt), C)
    where salt = pmod(xxhash64(turn_idx), S).  Turns are independent, so
    salting splits a pathologically long conversation (hot conv_id) across
    chunks; S is derived from a cheap skew sketch.  chunk is DETERMINISTIC
    -> it is also the lineage/checkpoint key.
 -> repartition(C, chunk): every chunk's rows colocate in one task
 -> sortWithinPartitions(conv_id, turn_idx): stable turn ordering inside
    each partition (the north rule's ordering guarantee)
 -> mapInPandas(extract kernel): Arrow batches in, NumPy per payload,
    classifier weights + templates broadcast ONCE per executor
 -> checkpointed write: chunks are grouped into WAVES; each wave commits
    its data directory atomically (parquet _SUCCESS; Iceberg snapshot on a
    real catalog) and then appends its lineage rows (chunk, turn range,
    rows, failures, wall time).  A killed run resumes by reading the
    lineage table and recomputing only waves without lineage; a wave whose
    data committed but whose lineage write was lost is overwritten
    idempotently (deterministic wave -> path mapping).

At 100 TB: C is sized so a chunk's payload bytes fit one task comfortably
(e.g. 2-8 GB/chunk -> C in the tens of thousands), waves bound the blast
radius of a failure, and the only shuffle in the whole job is the single
repartition by chunk — the kernel itself is map-only.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import time
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from .kernel.classifier import CharModel
from .kernel.pipeline import extract_page
from .kernel.segmentation import TemplateSpec
from .sources.codec import decode_payload

__all__ = ["ExtractionJobConfig", "derive_salt_buckets", "plan_extraction",
           "stage_chunked", "run_extraction", "read_lineage", "lineage_rows"]

RESULT_SCHEMA = (
    "conv_id string, turn_idx int, chunk int, part_id int, extracted_text string, "
    "n_lines int, n_words int, ok boolean, err string, proc_us bigint"
)

LINEAGE_SCHEMA = (
    "wave int, chunk int, rows_processed bigint, n_ok bigint, n_failed bigint, "
    "turn_min int, turn_max int, conv_min string, conv_max string, "
    "wall_us bigint, extraction_acc double, committed_at double"
)


@dataclass
class ExtractionJobConfig:
    num_chunks: int = 64
    num_waves: int = 4
    # S; >= max(1, hottest_conv_rows / target_rows_per_chunk).  None ->
    # derived from a sampled skew sketch at plan time (derive_salt_buckets)
    salt_buckets: int | None = 16
    model_path: str | None = None
    payload_roles: tuple = ()       # optional role filter pushed into the scan
    require_payload: bool = True    # filter text != '' at the scan
    # Iceberg output (production): when set and an Iceberg catalog is on the
    # classpath, each wave commits via writeTo(table).overwritePartitions()
    # with the wave as a partition column — an atomic snapshot per wave, the
    # exact production analog of the parquet wave-directory commit used in
    # the sandbox (no Iceberg runtime jar here).  Production DDL, catalog
    # config and the sandbox->catalog artifact mapping: docs/iceberg.md.
    iceberg_table: str | None = None
    iceberg_lineage_table: str | None = None
    # optional golden table (conv_id, turn_idx, expected_text): when set,
    # each lineage row carries the chunk's extraction accuracy (the north
    # star's per-partition "extraction accuracy" metric)
    golden_path: str | None = None
    # opt-in pre-kernel quality gate (operators/multimodal.with_quality_flag):
    # drop payloads that decode to nothing usable (no detectable text line,
    # implausible ink ratio) BEFORE the shuffle and the OCR kernel.  The
    # gate's decode+projection cost is a small fraction of extraction, so on
    # dirty corpora this trades a cheap map-only pass for kernel + shuffle
    # work on the dropped fraction.  Default off: a clean corpus only pays
    # the extra decode.
    quality_filter: bool = False
    quality_min_ink: float = 0.005
    quality_max_ink: float = 0.5
    # dedup-before-compute: extract each DISTINCT payload once and join the
    # result back to the turns.  Real transcript corpora repeat payloads
    # (retries, quoted/forwarded documents); when the duplication factor is
    # d, this trades two cheap shuffles on a 32-char hash for a d-fold
    # reduction of kernel work.  Default off: with unique payloads it only
    # adds the shuffles.
    dedup_payloads: bool = False


def _iceberg_available(spark) -> bool:
    try:
        # NB: plain _jvm attribute access is lazy (returns a JavaPackage even
        # for missing classes); Class.forName actually probes the classpath
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def derive_salt_buckets(df, num_chunks: int, sample_fraction: float = 0.02,
                        safety: float = 2.0, max_buckets: int = 4096) -> int:
    """Cheap skew sketch -> salt bucket count S.

    Samples the conv_id column (column-pruned scan of one string column),
    estimates the hottest conversation's share of total rows, and returns
    the number of chunks that conversation must spread over so no chunk
    exceeds ~an average chunk's row count, times a safety factor.  At
    10^12 rows this is a planning-time sample aggregation — the per-conv
    counts partial-aggregate map-side and only the max survives.  A uniform
    table returns 1 (salting off); the cap bounds sort-key cardinality."""
    from pyspark.sql import functions as F

    s = df.select("conv_id").sample(fraction=sample_fraction, seed=7)
    row = (
        s.groupBy("conv_id").count()
        .agg(F.max("count").alias("hot"), F.sum("count").alias("total"))
        .collect()[0]
    )
    if not row["total"]:
        return 1
    spread = row["hot"] * num_chunks / row["total"]  # chunks the hot conv needs
    return int(min(max_buckets, max(1, math.ceil(spread * safety))))


def _make_kernel(model_bc, templates_bc, passthrough_col: str | None = None):
    """Returns the mapInPandas function.  The broadcast values deserialize
    once per executor (Spark broadcast semantics) — the reference reloads
    its 1.4 MB model JSON per image and its template PNGs per contour; here
    both cross the wire exactly once per executor.

    passthrough_col: optional extra input column copied to the output ahead
    of the result schema (used by the distinct-payload plan)."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        model: CharModel = model_bc.value
        templates: list[TemplateSpec] = templates_bc.value
        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            n = len(pdf)
            texts = pdf["text"].tolist()
            out = {}
            if passthrough_col:
                out[passthrough_col] = pdf[passthrough_col].tolist()
            out.update({
                "conv_id": pdf["conv_id"].tolist(),
                "turn_idx": pdf["turn_idx"].tolist(),
                "chunk": pdf["chunk"].tolist(),
                "part_id": [part_id] * n,
                "extracted_text": [""] * n,
                "n_lines": [0] * n,
                "n_words": [0] * n,
                "ok": [False] * n,
                "err": [""] * n,
                "proc_us": [0] * n,
            })
            for i in range(n):
                t0 = time.perf_counter()
                res = extract_page(decode_payload(texts[i]), model, templates)
                out["extracted_text"][i] = res.text
                out["n_lines"][i] = res.n_lines
                out["n_words"][i] = res.n_words
                out["ok"][i] = res.ok
                out["err"][i] = res.err
                out["proc_us"][i] = int((time.perf_counter() - t0) * 1e6)
            yield pd.DataFrame(out)

    return extract_batches


def plan_extraction(spark, df, cfg: ExtractionJobConfig, model: CharModel | None = None,
                    templates: list[TemplateSpec] | None = None, wave: int | None = None,
                    model_bc=None, templates_bc=None, prechunked: bool = False):
    """Builds the extraction DataFrame (no side effects; one shuffle).

    wave: restrict the plan to one checkpoint wave.  The predicate is on the
    PRE-kernel salted chunk column (`pmod(chunk, num_waves) == wave`), so it
    prunes before the repartition — a wave scans, shuffles, and extracts only
    its own 1/num_waves of the input.  (Filtering the kernel OUTPUT instead
    would re-run the opaque mapInPandas kernel over everything per wave:
    Catalyst cannot push a predicate through it.)

    model_bc / templates_bc: pre-created broadcast handles, so callers that
    build many plans per session (the wave loop, streaming foreachBatch)
    broadcast the model exactly once instead of once per plan.
    """
    from pyspark.sql import functions as F

    if model_bc is None:
        model = model or CharModel.load(cfg.model_path)
        model_bc = spark.sparkContext.broadcast(model)
    if templates_bc is None:
        templates_bc = spark.sparkContext.broadcast(templates or [])

    if prechunked:
        # staged input (stage_chunked): the salted chunk column is already
        # materialized and the caller's read was partition-pruned to the
        # wave — no hashing, no wave filter.  The role filter still applies
        # here: stage_chunked carries `role` through the staged layout
        # precisely so a role-restricted run over a staged directory is not
        # a silent no-op (a pre-r3 staged layout without the column raises
        # rather than extracting every role)
        base = df
        if cfg.payload_roles:
            if "role" not in base.columns:
                raise ValueError(
                    "payload_roles is set but the staged input has no 'role' "
                    "column; re-run stage_chunked on a role-bearing source"
                )
            base = base.filter(F.col("role").isin(*cfg.payload_roles))
        salted = base.select("conv_id", "turn_idx", "text", "chunk")
    else:
        cols = df.select("conv_id", "turn_idx", "text")
        if cfg.payload_roles:
            cols = df.filter(F.col("role").isin(*cfg.payload_roles)).select("conv_id", "turn_idx", "text")

        salt_buckets = cfg.salt_buckets
        if salt_buckets is None:
            salt_buckets = derive_salt_buckets(cols, cfg.num_chunks)
            cfg.salt_buckets = salt_buckets  # pin: every wave must salt identically

        salted = cols.withColumn(
            "chunk",
            F.pmod(
                F.xxhash64(F.col("conv_id"), F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt_buckets))),
                F.lit(cfg.num_chunks),
            ).cast("int"),
        )
        if wave is not None:
            salted = salted.filter(_wave_of(F.col("chunk"), cfg.num_waves) == wave)
    gate = None
    if cfg.quality_filter:
        # pre-kernel gate (operators/multimodal.with_quality_flag): drops
        # unusable payloads BELOW the kernel and below the repartition
        from .operators.multimodal import with_quality_flag

        def gate(d):
            return (
                with_quality_flag(d, cfg.quality_min_ink, cfg.quality_max_ink)
                .filter(F.col("quality_ok"))
                .drop("quality_ok")
            )

    if cfg.dedup_payloads:
        # extract once per distinct payload, join results back to the turns.
        # The distinct side repartitions on the payload hash (its own even
        # key space); the join back is a hash join on the same 32-char key.
        hashed = salted.withColumn("_ph", F.md5("text"))
        distinct = hashed.select("_ph", "text").dropDuplicates(["_ph"])
        if gate is not None:
            # gate the DISTINCT payloads, not the occurrences: the decode
            # runs once per distinct payload (duplication factor d would
            # otherwise re-pay it d times), and the inner join back below
            # drops every turn of a gated-out payload — same row set as the
            # direct path's gate
            distinct = gate(distinct)
        distinct = (
            distinct
            .withColumn("conv_id", F.lit(""))
            .withColumn("turn_idx", F.lit(0))
            .withColumn("chunk", F.pmod(F.xxhash64("_ph"), F.lit(cfg.num_chunks)).cast("int"))
            .repartition(cfg.num_chunks, F.col("chunk"))
        )
        per_payload = distinct.mapInPandas(
            _make_kernel(model_bc, templates_bc, passthrough_col="_ph"),
            schema="_ph string, " + RESULT_SCHEMA,
        ).select("_ph", "extracted_text", "n_lines", "n_words", "ok", "err", "proc_us")
        joined = (
            hashed.select("conv_id", "turn_idx", "chunk", "_ph")
            .join(per_payload, "_ph")
            .drop("_ph")
        )
        # restore the canonical partitioning/order contract; part_id is the
        # task that OWNS the row's chunk after this repartition (the kernel
        # task's id would describe the distinct-payload shuffle, not the
        # chunk->partition mapping lineage reports on)
        return (
            joined.repartition(cfg.num_chunks, F.col("chunk"))
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("part_id", F.spark_partition_id())
            .select(
                "conv_id", "turn_idx", "chunk", "part_id", "extracted_text",
                "n_lines", "n_words", "ok", "err", "proc_us",
            )
        )
    if gate is not None:
        salted = gate(salted)
    partitioned = salted.repartition(cfg.num_chunks, F.col("chunk")).sortWithinPartitions(
        "conv_id", "turn_idx"
    )
    return partitioned.mapInPandas(_make_kernel(model_bc, templates_bc), schema=RESULT_SCHEMA)


def _wave_of(chunk_col, num_waves: int):
    from pyspark.sql import functions as F

    return F.pmod(chunk_col, F.lit(num_waves)).cast("int")


def stage_chunked(spark, df, cfg: ExtractionJobConfig, staged_dir: str) -> str:
    """ONE pass over the raw input writing it re-laid-out as
    `staged_dir/wave=<w>/` partitions with the salted chunk column
    materialized.  Why: the wave predicate is a hash of (conv_id, turn_idx)
    and cannot push into a parquet/Iceberg scan, so every checkpointed wave
    of `run_extraction` re-scans the FULL input to find its rows — cheap
    relative to the OCR kernel at small wave counts, but W full scans at
    W=64 on 100 TB is real money.  Staging costs one scan + one write, and
    afterwards each wave's read is partition-pruned to exactly its 1/W of
    the bytes (run_extraction detects the wave=... layout automatically).
    The production analog is an Iceberg table partitioned by the wave
    column; the staged copy is also what you keep when the same corpus
    will be extracted more than once."""
    from pyspark.sql import functions as F

    if cfg.salt_buckets is None:
        cfg.salt_buckets = derive_salt_buckets(df.select("conv_id", "turn_idx", "text"), cfg.num_chunks)
    # `role` rides along so a later role-restricted run over the staged
    # layout can still filter (plan_extraction's prechunked branch); sources
    # without the column stage role-less and such runs raise there
    keep = ["conv_id", "turn_idx", "text"] + (["role"] if "role" in df.columns else [])
    cols = df.select(*keep)
    salted = cols.withColumn(
        "chunk",
        F.pmod(
            F.xxhash64(F.col("conv_id"), F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(cfg.salt_buckets))),
            F.lit(cfg.num_chunks),
        ).cast("int"),
    ).withColumn("wave", _wave_of(F.col("chunk"), cfg.num_waves))
    salted.write.mode("overwrite").partitionBy("wave").parquet(staged_dir)
    with open(os.path.join(staged_dir, "_partitioning.json"), "w", encoding="utf-8") as f:
        json.dump({"num_chunks": cfg.num_chunks, "num_waves": cfg.num_waves,
                   "salt_buckets": cfg.salt_buckets}, f)
    return staged_dir


def _is_staged(input_path: str | None) -> bool:
    return bool(input_path) and os.path.exists(os.path.join(input_path, "_partitioning.json"))


def lineage_rows(written, wave: int, golden=None):
    """Per-chunk lineage aggregate in the canonical LINEAGE_SCHEMA — the ONE
    definition shared by the batch wave commit and the streaming foreachBatch
    sink (stream_job.py), so a consumer written against either lineage table
    reads both.  `wave` is the commit unit id (checkpoint wave in batch,
    micro-batch id in streaming); `golden` an optional
    (conv_id, turn_idx, expected_text) frame for the per-chunk
    extraction-accuracy metric (null when no golden is configured)."""
    from pyspark.sql import functions as F

    if golden is not None:
        written = written.join(
            golden.select("conv_id", "turn_idx", "expected_text"),
            ["conv_id", "turn_idx"], "left",
        ).withColumn(
            "is_exact", (F.col("extracted_text") == F.col("expected_text")).cast("double")
        )
    else:
        written = written.withColumn("is_exact", F.lit(None).cast("double"))
    return (
        written.groupBy("chunk")
        .agg(
            F.count("*").alias("rows_processed"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.sum((~F.col("ok")).cast("long")).alias("n_failed"),
            F.min("turn_idx").alias("turn_min"),
            F.max("turn_idx").alias("turn_max"),
            F.min("conv_id").alias("conv_min"),
            F.max("conv_id").alias("conv_max"),
            F.sum("proc_us").alias("wall_us"),
            F.avg("is_exact").alias("extraction_acc"),
        )
        .withColumn("wave", F.lit(wave))
        .withColumn("committed_at", F.lit(time.time()))
        .select(
            "wave", "chunk", "rows_processed", "n_ok", "n_failed",
            "turn_min", "turn_max", "conv_min", "conv_max", "wall_us",
            "extraction_acc", "committed_at",
        )
    )


def _committed_waves(output_dir: str) -> set[int]:
    """Wave ids whose lineage COMMITTED (the `_SUCCESS` marker of the
    lineage directory, not its row contents): a wave that legitimately
    produced zero rows — e.g. every payload dropped by the quality gate —
    still counts as done, so a resumed run skips it instead of re-scanning
    and re-gating it forever."""
    done: set[int] = set()
    for p in glob.glob(os.path.join(output_dir, "lineage", "wave=*")):
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            try:
                done.add(int(os.path.basename(p).split("=", 1)[1]))
            except ValueError:
                pass
    return done


def read_lineage(spark, output_dir: str):
    """All committed lineage rows, or None when no wave has committed."""
    paths = sorted(glob.glob(os.path.join(output_dir, "lineage", "wave=*")))
    done = [p for p in paths if os.path.exists(os.path.join(p, "_SUCCESS"))]
    if not done:
        return None
    df = spark.read.schema(LINEAGE_SCHEMA).parquet(*done)
    return df


def run_extraction(
    spark,
    input_path: str | None,
    output_dir: str,
    cfg: ExtractionJobConfig | None = None,
    model: CharModel | None = None,
    templates: list[TemplateSpec] | None = None,
    fail_after_wave: int | None = None,
    input_table: str | None = None,
) -> dict:
    """Execute the job in resumable waves.  Returns run stats.

    input_path: parquet path; or pass input_table to read a catalog table
    (the production Iceberg source — any Spark catalog name resolves, and
    Iceberg's scan supports the same pruning/pushdown the plan tests pin).
    fail_after_wave: test hook — raise after committing that many waves
    (simulates a mid-run kill for the resume test).
    """
    from pyspark.sql import functions as F

    cfg = cfg or ExtractionJobConfig()
    if (input_path is None) == (input_table is None):
        raise ValueError("exactly one of input_path / input_table is required")
    staged = _is_staged(input_path)
    if staged:
        # stage_chunked layout: adopt its pinned partitioning (the chunk
        # column in the data was computed with it) and read the wave-
        # partitioned copy so per-wave scans prune to 1/num_waves
        with open(os.path.join(input_path, "_partitioning.json"), encoding="utf-8") as f:
            sp = json.load(f)
        if sp["num_chunks"] != cfg.num_chunks or sp["num_waves"] != cfg.num_waves:
            raise ValueError(
                f"staged input was chunked with num_chunks={sp['num_chunks']}, "
                f"num_waves={sp['num_waves']}; the run must use the same values"
            )
        if cfg.salt_buckets is not None and cfg.salt_buckets != sp["salt_buckets"]:
            raise ValueError(f"staged input was salted with S={sp['salt_buckets']}")
        cfg.salt_buckets = sp["salt_buckets"]
    df = spark.table(input_table) if input_table else spark.read.parquet(input_path)
    if cfg.require_payload:
        df = df.filter(F.col("text") != "")

    # pin the partitioning parameters for the OUTPUT's lifetime: chunk (and
    # therefore wave membership) is a function of (salt_buckets, num_chunks),
    # so a resumed run MUST salt exactly like the committed waves — a
    # re-derived sample sketch could land on a different S and silently
    # duplicate/drop rows across the resume boundary
    params_path = os.path.join(output_dir, "_partitioning.json")
    if os.path.exists(params_path):
        with open(params_path, encoding="utf-8") as f:
            pinned = json.load(f)
        if pinned["num_chunks"] != cfg.num_chunks or pinned["num_waves"] != cfg.num_waves:
            raise ValueError(
                f"output dir was written with num_chunks={pinned['num_chunks']}, "
                f"num_waves={pinned['num_waves']}; resume must use the same values"
            )
        if cfg.salt_buckets is not None and cfg.salt_buckets != pinned["salt_buckets"]:
            raise ValueError(
                f"output dir was salted with S={pinned['salt_buckets']}, "
                f"got salt_buckets={cfg.salt_buckets}"
            )
        cfg.salt_buckets = pinned["salt_buckets"]
    else:
        if cfg.salt_buckets is None:
            cfg.salt_buckets = derive_salt_buckets(
                df.select("conv_id", "turn_idx", "text"), cfg.num_chunks
            )
        os.makedirs(output_dir, exist_ok=True)
        with open(params_path, "w", encoding="utf-8") as f:
            json.dump({"num_chunks": cfg.num_chunks, "num_waves": cfg.num_waves,
                       "salt_buckets": cfg.salt_buckets}, f)

    # broadcast once for the whole run; every wave's plan reuses the handles
    model_bc = spark.sparkContext.broadcast(model or CharModel.load(cfg.model_path))
    templates_bc = spark.sparkContext.broadcast(templates or [])

    # resume ledger = the lineage directories' commit markers, NOT the
    # lineage row values: an all-dropped wave commits an empty-but-valid
    # lineage file and must still be skipped on resume
    done_waves = _committed_waves(output_dir)

    waves_run = 0
    rows_written = 0
    t_start = time.time()
    for wave in range(cfg.num_waves):
        data_dir = os.path.join(output_dir, "data", f"wave={wave}")
        lin_dir = os.path.join(output_dir, "lineage", f"wave={wave}")
        if wave in done_waves:
            continue
        # data committed but lineage lost -> idempotent overwrite
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir, ignore_errors=True)

        # per-wave plan: the wave predicate sits BELOW the kernel (on the
        # pre-shuffle salted chunk), so this wave scans/shuffles/extracts
        # only its own 1/num_waves of the rows; with a staged input the
        # predicate is a PARTITION filter and even the scan reads 1/W
        if staged:
            wave_src = df.filter(F.col("wave") == wave).drop("wave")
            wave_df = plan_extraction(
                spark, wave_src, cfg, model_bc=model_bc, templates_bc=templates_bc,
                prechunked=True,
            )
        else:
            wave_df = plan_extraction(
                spark, df, cfg, wave=wave, model_bc=model_bc, templates_bc=templates_bc
            )
        wave_df.write.mode("overwrite").parquet(data_dir)
        if cfg.iceberg_table and _iceberg_available(spark):
            # production path: one atomic Iceberg snapshot per wave
            # (overwritePartitions on the wave partition -> retry-idempotent),
            # fed from the COMMITTED parquet files so the kernel runs exactly
            # once per wave and the snapshot's rows are the committed rows;
            # the parquet wave directory stays the sandbox-testable system of
            # record, so with a catalog configured this dual-writes during
            # migration
            (spark.read.parquet(data_dir).withColumn("wave", F.lit(wave))
             .writeTo(cfg.iceberg_table).overwritePartitions())

        # lineage derived from the COMMITTED files (read-back of the tiny
        # metric columns only -> column-pruned scan), so lineage can never
        # claim rows that did not commit
        written = spark.read.parquet(data_dir)
        golden = (
            spark.read.parquet(cfg.golden_path) if cfg.golden_path else None
        )
        lin = lineage_rows(written, wave, golden)
        lin.coalesce(1).write.mode("overwrite").parquet(lin_dir)
        waves_run += 1
        # row count from the just-committed (tiny) lineage — not another
        # pass over the wave's data
        rows_written += (
            spark.read.schema(LINEAGE_SCHEMA).parquet(lin_dir)
            .agg(F.sum("rows_processed")).collect()[0][0] or 0
        )
        if fail_after_wave is not None and waves_run >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {wave}")

    return {
        "waves_total": cfg.num_waves,
        "waves_run": waves_run,
        "waves_skipped": len(done_waves),
        "rows_written": rows_written,
        "wall_s": time.time() - t_start,
    }
