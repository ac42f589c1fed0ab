"""Normalized cross-correlation template matching (pure NumPy).

Reproduces cv2.matchTemplate(TM_CCOEFF_NORMED) + the reference's match-point
dedup loop (reference preprocess.py:245-269):

    R(x,y) = sum(T' * I'_window) / sqrt(sum(T'^2) * sum(I'_window^2))

with T' and I'_window zero-meaned, including the canonical numeric guard
(|num| < den -> divide; < 1.125*den -> clamp to +-1; else 0).
"""

from __future__ import annotations

import numpy as np

__all__ = ["match_template_ccoeff_normed", "template_match_points"]


def match_template_ccoeff_normed(image: np.ndarray, template: np.ndarray) -> np.ndarray:
    """Result map of shape (H-h+1, W-w+1), float64."""
    img = image.astype(np.float64)
    tpl = template.astype(np.float64)
    h, w = tpl.shape
    big_h, big_w = img.shape
    out_h, out_w = big_h - h + 1, big_w - w + 1
    n = h * w

    tpl_z = tpl - tpl.mean()
    tpl_norm2 = float((tpl_z**2).sum())

    # window sums via integral images
    ii = np.zeros((big_h + 1, big_w + 1))
    ii[1:, 1:] = img.cumsum(0).cumsum(1)
    ii2 = np.zeros((big_h + 1, big_w + 1))
    ii2[1:, 1:] = (img**2).cumsum(0).cumsum(1)

    def win(iimg: np.ndarray) -> np.ndarray:
        return iimg[h:, w:] - iimg[:-h, w:] - iimg[h:, :-w] + iimg[:-h, :-w]

    s1 = win(ii)
    s2 = win(ii2)
    wnd_var = s2 - s1 * s1 / n  # sum of I'^2 per window
    np.clip(wnd_var, 0.0, None, out=wnd_var)

    # numerator: cross-correlation with zero-mean template (sum T' * I)
    num = np.zeros((out_h, out_w))
    for i in range(h):
        for j in range(w):
            c = tpl_z[i, j]
            if c != 0.0:
                num += c * img[i:i + out_h, j:j + out_w]

    den = np.sqrt(wnd_var * tpl_norm2)
    res = np.zeros((out_h, out_w))
    absnum = np.abs(num)
    ok = absnum < den
    res[ok] = num[ok] / den[ok]
    near = (~ok) & (absnum < den * 1.125)
    res[near] = np.sign(num[near])
    return res


def template_match_points(image: np.ndarray, template: np.ndarray, threshold: float) -> tuple[list[int], int]:
    """The reference's template_match: returns (x positions, template width).

    Positions where the NCC map >= threshold, scanned in row-major order,
    keeping a hit only when its x is at least a template-width right of the
    previously kept x (reference preprocess.py:256-266 — the comparison is
    x-only across rows, reproduced as-is)."""
    if image.shape[0] < template.shape[0] or image.shape[1] < template.shape[1]:
        return [], 0
    res = match_template_ccoeff_normed(image, template)
    ys, xs = np.nonzero(res >= threshold)
    points: list[int] = []
    for x in xs:  # np.nonzero is row-major: y outer, x inner
        if points and x - points[-1] < template.shape[1]:
            continue
        points.append(int(x))
    return points, template.shape[1]
