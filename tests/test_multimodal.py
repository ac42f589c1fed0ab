"""Multimodal payload operators: JVM-side header decode parity with the
Python codec, and ink-feature values pinned against the serial kernel."""

import numpy as np
import pytest

from arabic_ocr_spark.kernel.imgops import binarize_inv, horizontal_projection
from arabic_ocr_spark.operators.multimodal import payload_features, payload_meta, round_ratio
from arabic_ocr_spark.sources.codec import decode_payload, encode_payload
from arabic_ocr_spark.sources.glyphs import compose_text_image


@pytest.fixture(scope="module")
def payload_df(spark):
    img1, _ = compose_text_image(["abc defg", "hij Lmn"])
    img2, _ = compose_text_image(["qrs"])
    blank = np.zeros((5, 9), dtype=np.uint8)
    rows = [
        ("c0", 0, encode_payload(img1)),
        ("c0", 1, encode_payload(img2)),
        ("c0", 2, encode_payload(blank)),          # valid envelope, no ink
        ("c1", 0, ""),                             # blank turn
        ("c1", 1, "!!!not-base64!!!"),             # undecodable
        ("c1", 2, encode_payload(img1)[:-10]),     # truncated
        ("c1", 3, "QUJDREVGR0g="),                 # valid b64, wrong magic
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string"), rows


def test_payload_meta_matches_python_codec(spark, payload_df):
    df, rows = payload_df
    got = {(r["conv_id"], r["turn_idx"]): (r["height"], r["width"], r["valid"])
           for r in payload_meta(df).collect()}
    for conv_id, turn_idx, text in rows:
        img = decode_payload(text)
        want = (img.shape[0], img.shape[1], True) if img is not None else (0, 0, False)
        assert got[(conv_id, turn_idx)] == want, (conv_id, turn_idx)


def test_payload_meta_is_jvm_only(spark, payload_df):
    df, _ = payload_df
    plan = payload_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_payload_features_pinned_vs_serial_kernel(spark, payload_df):
    df, rows = payload_df
    got = {(r["conv_id"], r["turn_idx"]): r for r in payload_features(df).collect()}
    n_valid = 0
    for conv_id, turn_idx, text in rows:
        r = got[(conv_id, turn_idx)]
        img = decode_payload(text)
        if img is None:
            assert (r["valid"], r["ink_ratio"], r["n_lines"], r["quality_ok"]) == (
                False, 0.0, 0, False)
            continue
        n_valid += 1
        binary = binarize_inv(img)
        ink = np.count_nonzero(binary) / binary.size
        # reported ratios use exact integer half-up (round_ratio), not
        # Python float round — see its docstring on decimal-tie portability
        assert r["valid"] and r["ink_ratio"] == round_ratio(
            int(np.count_nonzero(binary)), binary.size, 6)
        hp = horizontal_projection(binary)
        nz = hp > 0
        starts = np.flatnonzero(nz & ~np.concatenate(([False], nz[:-1])))
        assert r["n_lines"] == len(starts)
        if len(starts):
            assert r["mean_line_height"] == round_ratio(
                int(np.count_nonzero(nz)), len(starts), 4)
        assert r["quality_ok"] == bool(len(starts) > 0 and 0.005 <= ink <= 0.5)
    assert n_valid == 3


def test_quality_filter_separates_real_pages_from_junk(spark, payload_df):
    df, _ = payload_df
    ok = {(r["conv_id"], r["turn_idx"]) for r in
          payload_features(df).filter("quality_ok").collect()}
    assert ok == {("c0", 0), ("c0", 1)}  # real pages pass, blank/junk don't


def test_payload_thumbnail_roundtrips_envelope(spark, payload_df):
    from arabic_ocr_spark.operators.multimodal import payload_thumbnail

    df, rows = payload_df
    got = {(r["conv_id"], r["turn_idx"]): r for r in payload_thumbnail(df, max_side=8).collect()}
    for conv_id, turn_idx, text in rows:
        r = got[(conv_id, turn_idx)]
        img = decode_payload(text)
        if img is None:
            assert r["thumb"] == "" and not r["valid"]
            continue
        stride = max(1, -(-max(img.shape) // 8))
        want = img[::stride, ::stride]
        thumb = decode_payload(r["thumb"])
        assert thumb is not None and r["valid"]
        assert thumb.shape == want.shape == (r["height"], r["width"])
        assert max(thumb.shape) <= 8
        assert np.array_equal(thumb, want)


def test_payload_meta_parity_fuzz(spark):
    """Property check: for random envelopes and random corruptions, the
    JVM-side decoder and the Python codec agree on (height, width, valid) —
    one Spark job over the whole case batch."""
    rng = np.random.default_rng(99)
    cases = []
    for i in range(60):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        enc = encode_payload(rng.integers(0, 256, size=(h, w)).astype(np.uint8))
        kind = i % 5
        if kind == 1 and len(enc) > 8:
            cut = int(rng.integers(1, len(enc) - 1))
            enc = enc[:cut]                                  # truncation
        elif kind == 2:
            pos = int(rng.integers(0, len(enc)))
            enc = enc[:pos] + "*" + enc[pos + 1:]            # invalid b64 char
        elif kind == 3:
            enc = enc + "AAAA"                               # trailing garbage
        elif kind == 4:
            import base64
            raw = base64.b64decode(enc)
            flip = int(rng.integers(0, 8))                   # header corruption
            raw = raw[:flip] + bytes([raw[flip] ^ 0xFF]) + raw[flip + 1:]
            enc = base64.b64encode(raw).decode()
        cases.append((f"c{i}", i, enc))
    df = spark.createDataFrame(cases, "conv_id string, turn_idx int, text string")
    got = {r["turn_idx"]: (r["height"], r["width"], r["valid"])
           for r in payload_meta(df).collect()}
    for _cid, i, enc in cases:
        img = decode_payload(enc)
        want = (img.shape[0], img.shape[1], True) if img is not None else (0, 0, False)
        assert got[i] == want, (i, enc[:24], got[i], want)


def test_quality_filter_gates_extraction_path(spark, payload_df):
    """cfg.quality_filter wires with_quality_flag as the pre-kernel gate:
    junk payloads (no detectable line / implausible ink) never reach the OCR
    kernel, good pages extract identically to the ungated plan."""
    from arabic_ocr_spark.job import ExtractionJobConfig, plan_extraction
    from arabic_ocr_spark.operators.multimodal import with_quality_flag
    from arabic_ocr_spark.sources.synth import default_model_path

    df, _ = payload_df
    df = df.filter("text <> ''")
    cfg = ExtractionJobConfig(num_chunks=4, model_path=default_model_path())

    # the pass-through flag preserves every input column + appends the flag
    flagged = with_quality_flag(df)
    assert flagged.columns == df.columns + ["quality_ok"]

    gated_cfg = ExtractionJobConfig(num_chunks=4, model_path=default_model_path(),
                                    quality_filter=True)
    gated = plan_extraction(spark, df, gated_cfg).collect()
    ungated = plan_extraction(spark, df, cfg).collect()

    ok_keys = {(r["conv_id"], r["turn_idx"]) for r in
               payload_features(df).filter("quality_ok").collect()}
    assert {(r["conv_id"], r["turn_idx"]) for r in gated} == ok_keys == {("c0", 0), ("c0", 1)}
    # surviving rows are byte-identical to the ungated extraction
    keep = ["conv_id", "turn_idx", "extracted_text", "n_lines", "n_words", "ok"]
    gated_rows = {tuple(r[c] for c in keep) for r in gated}
    ungated_rows = {tuple(r[c] for c in keep) for r in ungated
                    if (r["conv_id"], r["turn_idx"]) in ok_keys}
    assert gated_rows == ungated_rows


def test_quality_gate_composes_with_dedup_payloads(spark, payload_df):
    """Gate + distinct-payload extraction: the gate runs on the DISTINCT
    payloads (once per payload, not per occurrence) and the join-back drops
    every turn of a gated-out payload — same row set as the direct gate."""
    from pyspark.sql import functions as F

    from arabic_ocr_spark.job import ExtractionJobConfig, plan_extraction
    from arabic_ocr_spark.sources.synth import default_model_path

    df, _ = payload_df
    # duplicate the turns so payloads repeat across conversations
    df = df.filter("text <> ''").unionByName(
        df.filter("text <> ''").select(
            F.concat(F.col("conv_id"), F.lit("_dup")).alias("conv_id"), "turn_idx", "text"
        )
    )
    kw = dict(num_chunks=4, model_path=default_model_path(), quality_filter=True)
    direct = plan_extraction(spark, df, ExtractionJobConfig(**kw)).collect()
    deduped = plan_extraction(
        spark, df, ExtractionJobConfig(dedup_payloads=True, **kw)
    ).collect()
    keep = ["conv_id", "turn_idx", "extracted_text", "ok"]
    assert {tuple(r[c] for c in keep) for r in direct} == {
        tuple(r[c] for c in keep) for r in deduped
    }
    assert len(direct) == len(deduped) == 4  # 2 good payloads x 2 conv copies


def test_all_dropped_wave_resumes_as_committed(spark, tmp_path):
    """A wave whose rows are ALL dropped (reachable via the quality gate)
    commits empty lineage; resume must count it done instead of re-running
    it forever (the ledger is the _SUCCESS marker, not the row values)."""
    import numpy as np

    from arabic_ocr_spark.job import ExtractionJobConfig, run_extraction
    from arabic_ocr_spark.sources.codec import encode_payload
    from arabic_ocr_spark.sources.synth import default_model_path

    blank = encode_payload(np.zeros((6, 9), dtype=np.uint8))  # valid, no ink
    rows = [(f"c{i}", t, blank) for i in range(6) for t in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    src = str(tmp_path / "src.parquet")
    df.write.parquet(src)
    out = str(tmp_path / "out")
    cfg = dict(num_chunks=4, num_waves=2, model_path=default_model_path(),
               quality_filter=True)
    s1 = run_extraction(spark, src, out, ExtractionJobConfig(**cfg))
    assert s1["waves_run"] == 2 and s1["rows_written"] == 0
    s2 = run_extraction(spark, src, out, ExtractionJobConfig(**cfg))
    assert s2["waves_run"] == 0 and s2["waves_skipped"] == 2


def test_payload_ink_stats_pinned_vs_numpy(spark, payload_df):
    """Integer pixel stats match a direct NumPy computation per payload
    (the DuckDB oracle replays the same ints from the raw bytes)."""
    from arabic_ocr_spark.operators.multimodal import payload_ink_stats

    df, rows = payload_df
    got = {(r["conv_id"], r["turn_idx"]): (r["n_ink"], r["n_pixels"], r["n_lines"], r["nz_rows"])
           for r in payload_ink_stats(df).collect()}
    for conv_id, turn_idx, text in rows:
        img = decode_payload(text)
        if img is None:
            assert got[(conv_id, turn_idx)] == (0, 0, 0, 0)
            continue
        binary = img <= 127
        nzr = binary.any(axis=1)
        starts = int((nzr & ~np.concatenate(([False], nzr[:-1]))).sum())
        assert got[(conv_id, turn_idx)] == (
            int(binary.sum()), img.size, starts, int(nzr.sum()))
