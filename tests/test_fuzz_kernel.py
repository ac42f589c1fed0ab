"""Fuzz the page kernel: arbitrary noise images must never crash or hang —
they either extract something or come back ok=False (the reference would
crash its whole run on many of these; our per-turn containment is the
observable contract)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from arabic_ocr_spark.kernel.classifier import CharModel
from arabic_ocr_spark.kernel.pipeline import extract_page
from arabic_ocr_spark.sources.synth import default_model_path

MODEL = CharModel.load(default_model_path())


@given(
    st.integers(1, 60),
    st.integers(1, 60),
    st.floats(0.0, 1.0),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_noise_pages_never_crash(h, w, density, seed):
    rng = np.random.default_rng(seed)
    img = np.where(rng.random((h, w)) < density, np.uint8(0), np.uint8(255))
    res = extract_page(img, MODEL)
    assert isinstance(res.text, str)
    assert res.ok in (True, False)


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_structured_noise_blocks(seed):
    rng = np.random.default_rng(seed)
    img = np.full((50, 80), 255, dtype=np.uint8)
    for _ in range(int(rng.integers(1, 8))):
        y, x = int(rng.integers(0, 40)), int(rng.integers(0, 70))
        hh, ww = int(rng.integers(1, 10)), int(rng.integers(1, 10))
        img[y:y + hh, x:x + ww] = 0
    res = extract_page(img, MODEL)
    assert isinstance(res.text, str)
