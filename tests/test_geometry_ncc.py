"""Deskew geometry + NCC template matching (SURVEY.md §2.9)."""

import numpy as np

from arabic_ocr_spark.kernel.geometry import (
    convex_hull,
    deskew,
    min_area_rect_angle,
    rotation_matrix_2d,
    warp_affine_cubic,
)
from arabic_ocr_spark.kernel.ncc import match_template_ccoeff_normed, template_match_points


def test_convex_hull_square():
    pts = np.array([[0, 0], [0, 4], [4, 0], [4, 4], [2, 2], [1, 3]])
    hull = convex_hull(pts)
    assert sorted(map(tuple, hull.tolist())) == [(0.0, 0.0), (0.0, 4.0), (4.0, 0.0), (4.0, 4.0)]


def test_min_area_rect_axis_aligned_is_minus_90():
    pts = np.array([[0, 0], [0, 10], [3, 0], [3, 10], [1, 5]])
    assert min_area_rect_angle(pts) == -90.0


def test_min_area_rect_rotated():
    # a 45-degree line of points
    pts = np.array([[i, i] for i in range(10)], dtype=float)
    ang = min_area_rect_angle(pts)
    assert -90.0 <= ang < 0.0
    assert abs(ang - (-45.0)) < 1e-9


def test_rotation_matrix_identity():
    m = rotation_matrix_2d((5, 5), 0.0)
    assert np.allclose(m, [[1, 0, 0], [0, 1, 0]])


def test_warp_identity_fast_path():
    img = (np.arange(36).reshape(6, 6) * 7 % 256).astype(np.uint8)
    m = rotation_matrix_2d((3, 3), 0.0)
    out = warp_affine_cubic(img, m, (6, 6))
    assert np.array_equal(out, img)


def test_warp_90_degrees_binary_roundtrip():
    img = np.zeros((9, 9), dtype=np.uint8)
    img[2:4, 1:8] = 255
    m = rotation_matrix_2d((4, 4), 90.0)
    out = warp_affine_cubic(img, m, (9, 9))
    # exact integer coordinates at 90 degrees: nearest-source gather via the
    # true inverse matrix must agree with the bicubic warp on a binary image
    ainv = np.linalg.inv(m[:, :2])
    binv = -ainv @ m[:, 2]
    expected = np.zeros((9, 9), dtype=np.uint8)
    for y in range(9):
        for x in range(9):
            sx = int(round(ainv[0, 0] * x + ainv[0, 1] * y + binv[0]))
            sy = int(round(ainv[1, 0] * x + ainv[1, 1] * y + binv[1]))
            expected[y, x] = img[min(max(sy, 0), 8), min(max(sx, 0), 8)]
    assert np.array_equal(out, expected)
    # the bar must end up vertical
    assert (out.sum(axis=0) > 0).sum() == 2
    assert (out.sum(axis=1) > 0).sum() == 7


def test_deskew_recovers_small_rotation():
    # a wide solid block, rotated by a small angle, deskews back to level
    base = np.zeros((60, 120), dtype=np.uint8)
    base[25:35, 10:110] = 255
    m = rotation_matrix_2d((60, 30), 4.0)
    rotated = warp_affine_cubic(base, m, (120, 60))
    rotated = ((rotated > 127) * np.uint8(255)).astype(np.uint8)
    out = deskew(rotated)
    ys = np.nonzero(out.sum(axis=1))[0]
    # levelled: vertical extent close to the original 10 rows
    assert ys.max() - ys.min() <= 13


def test_ncc_perfect_match_is_one():
    img = np.zeros((10, 12), dtype=np.uint8)
    img[2:5, 3:7] = 255
    img[3, 4] = 0
    tpl = img[2:5, 3:7].copy()
    res = match_template_ccoeff_normed(img, tpl)
    assert abs(res[2, 3] - 1.0) < 1e-12
    assert res.max() <= 1.0 + 1e-12


def test_ncc_constant_window_is_zero():
    img = np.zeros((8, 8), dtype=np.uint8)
    tpl = np.zeros((3, 3), dtype=np.uint8)
    tpl[1, 1] = 255
    res = match_template_ccoeff_normed(img, tpl)
    assert np.all(res == 0.0)


def test_template_match_points_dedup_within_width():
    img = np.zeros((6, 30), dtype=np.uint8)
    # periodic stripes: the template matches at every even offset in the band
    img[1:4, 2:14:2] = 255
    tpl = np.zeros((3, 4), dtype=np.uint8)
    tpl[:, 0] = 255
    tpl[:, 2] = 255
    pts, width = template_match_points(img, tpl, 0.99)
    assert width == 4
    # raw matches at every even x in 2..10; dedup keeps only hits >= width apart
    assert pts == [2, 6, 10]


def test_template_match_too_small_image():
    img = np.zeros((2, 2), dtype=np.uint8)
    tpl = np.zeros((3, 3), dtype=np.uint8)
    assert template_match_points(img, tpl, 0.5) == ([], 0)
