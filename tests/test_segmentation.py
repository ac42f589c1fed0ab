"""Line/word/character segmentation semantics (SURVEY.md §2.3-2.5)."""

import numpy as np
import pytest

from arabic_ocr_spark.kernel.imgops import binarize_inv
from arabic_ocr_spark.kernel.segmentation import (
    contour_seg,
    distance_between_words,
    segment_lines,
    word_separators,
)
from arabic_ocr_spark.sources.glyphs import compose_text_image


def test_distance_between_words_frequency_then_stable():
    # inner = [2,2,8,6,2]; counts: 2->3, 8->1, 6->1; stable order keeps 8 before 6
    d = distance_between_words([9, 2, 2, 8, 6, 2, 9])
    # top3 unique by freq = [2, 8, 6] -> min 2 + floor(8/4) = 4
    assert d == 4


def test_distance_between_words_single_value():
    assert distance_between_words([5, 2, 2, 2, 5]) == 2 + 0


def test_distance_between_words_raises_on_short():
    with pytest.raises(ValueError):
        distance_between_words([5, 9])  # inner empty -> reference min() crash


def test_segment_lines_skips_first_gap():
    img = np.zeros((20, 10), dtype=np.uint8)
    img[3:6, 2:8] = 255   # line 1
    img[12:15, 2:8] = 255  # line 2
    lines = segment_lines(img)
    assert len(lines) == 2
    # first crop starts at row 0 (top margin merged into line 1)
    assert lines[0].shape[0] + lines[1].shape[0] == 20
    assert lines[0][3:6, 2:8].min() == 255
    assert lines[1][12 - lines[0].shape[0] + 3 - 3, 2] in (0, 255)  # shape sanity


def test_segment_lines_single_line_whole_image():
    img = np.zeros((10, 8), dtype=np.uint8)
    img[4:7, 1:7] = 255
    lines = segment_lines(img)
    assert len(lines) == 1 and lines[0].shape == (10, 8)


def test_word_separators_on_composed_line():
    img, _ = compose_text_image(["abc def"])
    line = segment_lines(binarize_inv(img))[0]
    seps, baseline = word_separators(line)
    # two words -> margin separator + one inter-word separator
    assert len(seps) == 2
    vp = line.sum(axis=0)
    for s in seps:
        assert vp[int(s)] == 0  # separators sit in gaps
    hp = line.sum(axis=1)
    assert hp[baseline] == hp.max()


def test_contour_seg_subword_gaps_become_cuts():
    img, _ = compose_text_image(["aaa"])
    line = segment_lines(binarize_inv(img))[0]
    seps, baseline = word_separators(line)
    word = line[:, int(seps[0]):line.shape[1]]
    cuts = contour_seg(word, baseline)
    assert cuts == sorted(cuts)
    # at least the two inter-glyph gap centres appear among the cuts
    vp = word.sum(axis=0)
    gap_cuts = [c for c in cuts if isinstance(c, float) and vp[int(c)] == 0]
    assert len(gap_cuts) >= 2


def test_contour_seg_empty_image():
    img = np.zeros((10, 10), dtype=np.uint8)
    assert contour_seg(img, 5) == []
