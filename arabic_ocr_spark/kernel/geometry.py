"""Deskew geometry (pure NumPy).

Reproduces the reference's deskew stage (reference preprocess.py:33-51):
min-area rotated rectangle over the foreground pixel coordinates, OpenCV 4.1
angle convention (angle in [-90, 0)), then rotation about the image centre
with bicubic interpolation (a = -0.75) and replicated borders.

The min-area rectangle is computed from scratch: Andrew monotone-chain
convex hull + rotating-edge search (for every hull edge, the area of the
hull's bounding box aligned to that edge; the optimal rectangle is flush
with a hull edge).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["convex_hull", "min_area_rect_angle", "rotation_matrix_2d", "warp_affine_cubic", "deskew"]


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points: (N,2) float/int. Returns hull vertices
    in counter-clockwise order (standard orientation), shape (M,2) float64."""
    pts = np.unique(points.astype(np.float64), axis=0)  # sorted lexicographically
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def min_area_rect_angle(points: np.ndarray) -> float:
    """Angle (degrees) of the minimum-area bounding rectangle of `points`,
    in OpenCV-4.1 convention: angle in [-90, 0); an axis-aligned point set
    yields -90.0."""
    hull = convex_hull(points)
    if len(hull) <= 1:
        return -90.0
    if len(hull) == 2:
        d = hull[1] - hull[0]
        edge_angle = math.atan2(d[1], d[0])
    else:
        n = len(hull)
        best_area = math.inf
        edge_angle = 0.0
        for i in range(n):
            d = hull[(i + 1) % n] - hull[i]
            theta = math.atan2(d[1], d[0])
            c, s = math.cos(-theta), math.sin(-theta)
            rx = hull[:, 0] * c - hull[:, 1] * s
            ry = hull[:, 0] * s + hull[:, 1] * c
            area = (rx.max() - rx.min()) * (ry.max() - ry.min())
            if area < best_area - 1e-12:
                best_area = area
                edge_angle = theta
    deg = math.degrees(edge_angle) % 90.0  # reduce to [0, 90)
    return deg - 90.0  # [-90, 0)


def rotation_matrix_2d(center: tuple[float, float], angle_deg: float, scale: float = 1.0) -> np.ndarray:
    """2x3 affine matrix, same formula as cv2.getRotationMatrix2D (positive
    angle = counter-clockwise in a y-down image)."""
    a = math.radians(angle_deg)
    alpha = scale * math.cos(a)
    beta = scale * math.sin(a)
    cx, cy = center
    return np.array(
        [
            [alpha, beta, (1.0 - alpha) * cx - beta * cy],
            [-beta, alpha, beta * cx + (1.0 - alpha) * cy],
        ],
        dtype=np.float64,
    )


def _cubic_weights(frac: np.ndarray) -> np.ndarray:
    """Bicubic kernel weights, a = -0.75 (OpenCV's constant).

    frac: (N,) in [0,1). Returns (N,4) weights for taps at offsets
    -1, 0, +1, +2 relative to floor(coord).
    """
    a = -0.75
    f = frac
    w = np.empty((len(f), 4), dtype=np.float64)
    # |x| for the four taps: 1+f, f, 1-f, 2-f
    x0 = 1.0 + f
    w[:, 0] = a * x0**3 - 5.0 * a * x0**2 + 8.0 * a * x0 - 4.0 * a
    w[:, 1] = (a + 2.0) * f**3 - (a + 3.0) * f**2 + 1.0
    x2 = 1.0 - f
    w[:, 2] = (a + 2.0) * x2**3 - (a + 3.0) * x2**2 + 1.0
    x3 = 2.0 - f
    w[:, 3] = a * x3**3 - 5.0 * a * x3**2 + 8.0 * a * x3 - 4.0 * a
    return w


def warp_affine_cubic(img: np.ndarray, m: np.ndarray, dsize: tuple[int, int]) -> np.ndarray:
    """Affine warp with bicubic sampling and replicated borders.

    `m` is the forward 2x3 transform (src -> dst), as cv2.warpAffine takes;
    sampling inverts it.  dsize = (width, height).  Fast path: an identity
    transform returns the input unchanged (the common zero-skew case).
    """
    w_out, h_out = dsize
    ident = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    if img.shape == (h_out, w_out) and np.allclose(m, ident, atol=1e-12):
        return img.copy()

    # invert the affine
    a = m[:, :2]
    b = m[:, 2]
    ainv = np.linalg.inv(a)
    binv = -ainv @ b

    ys, xs = np.mgrid[0:h_out, 0:w_out]
    sx = ainv[0, 0] * xs + ainv[0, 1] * ys + binv[0]
    sy = ainv[1, 0] * xs + ainv[1, 1] * ys + binv[1]

    h, w = img.shape
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0).ravel()
    fy = (sy - y0).ravel()
    wx = _cubic_weights(fx)  # (N,4)
    wy = _cubic_weights(fy)

    imgf = img.astype(np.float64)
    acc = np.zeros(h_out * w_out, dtype=np.float64)
    x0r = x0.ravel()
    y0r = y0.ravel()
    for j in range(4):  # y taps
        yy = np.clip(y0r + (j - 1), 0, h - 1)
        row_acc = np.zeros_like(acc)
        for i in range(4):  # x taps
            xx = np.clip(x0r + (i - 1), 0, w - 1)
            row_acc += wx[:, i] * imgf[yy, xx]
        acc += wy[:, j] * row_acc
    out = np.clip(np.rint(acc), 0, 255).astype(np.uint8)
    return out.reshape(h_out, w_out)


def deskew(image: np.ndarray) -> np.ndarray:
    """Reference deskew semantics (preprocess.py:33-51): estimate the skew
    angle from the min-area rect over (row, col) coords of foreground pixels,
    fold into (-45, 45], rotate about the centre with bicubic sampling."""
    fg = image > 0
    if not fg.any():
        return image.copy()
    # hull-candidate reduction: the min-area rect depends only on the convex
    # hull, and the hull of (row, col) points only ever uses each row's
    # extreme columns — O(H) candidates instead of O(ink pixels)
    rows = np.flatnonzero(fg.any(axis=1))
    first = np.argmax(fg[rows], axis=1)
    last = image.shape[1] - 1 - np.argmax(fg[rows][:, ::-1], axis=1)
    coords = np.concatenate(
        [np.column_stack([rows, first]), np.column_stack([rows, last])]
    ).astype(np.float64)
    angle = min_area_rect_angle(coords)
    if angle < -45:
        angle = -(90 + angle)
    else:
        angle = -angle
    h, w = image.shape[:2]
    center = (w // 2, h // 2)
    m = rotation_matrix_2d(center, angle, 1.0)
    return warp_affine_cubic(image, m, (w, h))
