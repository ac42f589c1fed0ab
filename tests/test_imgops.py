"""Unit tests for the elementary kernel operators (SURVEY.md §5)."""

import numpy as np
import pytest

from arabic_ocr_spark.kernel.imgops import (
    baseline_y,
    binarize,
    binarize_inv,
    dilate3x3,
    horizontal_projection,
    most_frequent,
    vertical_projection,
    zero_run_gaps,
)


def test_binarize_threshold_edges():
    img = np.array([[126, 127, 128, 255, 0]], dtype=np.uint8)
    assert binarize(img).tolist() == [[0, 0, 255, 255, 0]]
    # inverted: ink (dark) becomes 255
    assert binarize_inv(img).tolist() == [[255, 255, 0, 0, 255]]


def test_projections_int32():
    img = np.full((3, 4), 255, dtype=np.uint8)
    hp = horizontal_projection(img)
    vp = vertical_projection(img)
    assert hp.dtype == np.int32 and vp.dtype == np.int32
    assert hp.tolist() == [1020, 1020, 1020]
    assert vp.tolist() == [765, 765, 765, 765]


def test_baseline_first_max():
    assert baseline_y(np.array([3, 9, 9, 1])) == 1


def test_dilate3x3_single_pixel():
    img = np.zeros((5, 5), dtype=np.uint8)
    img[2, 2] = 255
    out = dilate3x3(img)
    assert out[1:4, 1:4].min() == 255
    assert out.sum() == 255 * 9


def test_most_frequent_excludes_zero_mode():
    assert most_frequent(np.array([0, 0, 0, 5, 5, 7])) == 5
    assert most_frequent(np.array([5, 5, 7])) == 5
    # tie -> smallest value (np.unique sort + first argmax)
    assert most_frequent(np.array([5, 5, 7, 7])) == 5


def test_zero_run_gaps_mean_and_width():
    #        idx: 0  1  2  3  4  5  6  7  8
    p = np.array([0, 5, 0, 0, 0, 7, 0, 3, 0])
    centres, widths = zero_run_gaps(p)
    # trailing open run at idx 8 dropped
    assert centres == [0.0, 3.0, 6.0]
    assert widths == [1, 3, 1]


def test_zero_run_gaps_open_runs_dropped():
    centres, widths = zero_run_gaps(np.array([0, 0, 0]))
    assert centres == [] and widths == []
    centres, widths = zero_run_gaps(np.array([5, 5]))
    assert centres == [] and widths == []


def test_zero_run_gaps_fractional_centre():
    p = np.array([1, 0, 0, 1])
    centres, widths = zero_run_gaps(p)
    assert centres == [1.5] and widths == [2]
