"""Training-path tests: serial/Spark equivalence, normalizer parity,
validation predicates, model artifact stability."""

import hashlib

from arabic_ocr_spark.kernel.classifier import CharModel
from arabic_ocr_spark.training import (
    compare_and_assign,
    normalize_ground_truth,
    train_serial,
    train_spark,
    train_words_for_alphabet,
    validate_fv,
)


def test_normalize_ground_truth():
    assert normalize_ground_truth("ab   cd \n") == ["ab", "cd"]
    assert normalize_ground_truth("  ") == []
    assert normalize_ground_truth("xلاy z") == ["xLy", "z"]


def test_compare_and_assign_rejects_count_mismatch():
    fvs = [[0, 1, 12.0, 0, -1, 0, 0, 0, 0]]
    assert compare_and_assign(fvs, "ab", {}) == -1


def test_compare_and_assign_dedups():
    fv = [0, 2, 12.0, 0, -1, 0, 0, 0, 0]
    m = compare_and_assign([list(fv)], "a", {})
    m = compare_and_assign([list(fv)], "a", m)
    assert len(m["0"]) == 1


def test_validations_from_alphabet():
    # 'o' is box + one dot above: requires dots, top position
    assert validate_fv("o", [2, 2, 14.0, 1, 1, 1, 4, 4, 1])
    assert not validate_fv("o", [2, 2, 14.0, 0, -1, 0, 4, 4, 1])
    # 'b' is the plain box: requires no dots
    assert validate_fv("b", [2, 2, 14.0, 0, -1, 0, 4, 4, 1])
    assert not validate_fv("b", [2, 2, 14.0, 1, 1, 1, 4, 4, 1])


def test_committed_model_artifact_reproducible():
    from arabic_ocr_spark.training import DEFAULT_SKEW_ROUNDS

    raw, rejected, total = train_serial(skew_rounds=DEFAULT_SKEW_ROUNDS)
    assert total > 0
    import json
    import tempfile

    m = CharModel.from_raw(raw)
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(m.to_raw(), f, ensure_ascii=False)
        path = f.name
    new = hashlib.sha256(open(path, "rb").read()).hexdigest()
    old = hashlib.sha256(open("arabic_ocr_spark/model/config_map.json", "rb").read()).hexdigest()
    assert new == old


def test_train_spark_equals_serial(spark):
    """Bucket-internal ORDER included: 1-NN keeps the first minimum, so a
    spark-trained artifact must reproduce the serial insertion order exactly
    or distance ties could classify differently."""
    pages = train_words_for_alphabet(n_random=10)
    serial_raw, _r, _t = train_serial(pages)
    model = train_spark(spark, pages)
    serial = CharModel.from_raw(serial_raw)
    assert model.to_raw() == serial.to_raw()
