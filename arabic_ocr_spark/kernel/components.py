"""8-connected component labeling (pure NumPy, run-based two-pass union-find).

Semantics match the reference's two uses of cv2.connectedComponentsWithStats
(reference train_recognition.py:7-55):

- labels: 0 = background, components numbered 1..n-1 in raster order of
  first encounter (deterministic; the reference's tie-break `sizes[i] >
  max_size` keeps the smallest label, so label order is part of the
  semantics);
- an all-background image has a single stats row, and the reference's
  `sizes[1]` access raises IndexError — `largest_label` reproduces that
  (callers rely on the exception to reject empty segments).
"""

from __future__ import annotations

import numpy as np

__all__ = ["label_components", "largest_label", "remove_dots", "split_largest_component"]


def label_components(img: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """Label 8-connected foreground (nonzero) components.

    Returns (n_labels, labels, sizes) where n_labels counts the background,
    labels is int32 HxW, and sizes[k] is the pixel count of label k
    (sizes[0] = background count).
    """
    h, w = img.shape
    fg = img != 0
    labels = np.zeros((h, w), dtype=np.int32)
    if not fg.any():
        return 1, labels, np.array([img.size], dtype=np.int64)

    # one vectorized pass: runs over the row-padded flat image (the sentinel
    # column breaks runs at row boundaries)
    fgp = np.zeros((h, w + 1), dtype=np.int8)
    fgp[:, :w] = fg
    flat = fgp.ravel()
    d = np.diff(flat, prepend=np.int8(0))
    run_starts = np.flatnonzero(d == 1)
    run_ends = np.flatnonzero(d == -1)  # exclusive; sentinel guarantees closure
    wp = w + 1
    rows = run_starts // wp
    s_cols = run_starts % wp
    e_cols = ((run_ends - 1) % wp) + 1

    parent = np.arange(len(run_starts) + 1, dtype=np.int64)  # union-find over run ids (1-based)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return int(x)

    prev_row = -2
    prev_runs: list[tuple[int, int, int]] = []  # (s, e, run_id)
    cur_runs: list[tuple[int, int, int]] = []
    cur_row = -2
    labels_flat = np.zeros(h * wp, dtype=np.int32)
    for i in range(len(run_starts)):
        y = int(rows[i])
        if y != cur_row:
            prev_runs, prev_row = (cur_runs, cur_row) if y == cur_row + 1 else ([], -2)
            cur_runs, cur_row = [], y
        s, e = int(s_cols[i]), int(e_cols[i])
        rid = i + 1
        if prev_row == y - 1:
            for ps, pe, pr in prev_runs:
                if ps < e + 1 and pe > s - 1:  # 8-conn overlap (extended by 1)
                    ra, rb = find(rid), find(pr)
                    if ra != rb:
                        if ra < rb:
                            parent[rb] = ra
                        else:
                            parent[ra] = rb
        labels_flat[run_starts[i]:run_ends[i]] = rid
        cur_runs.append((s, e, rid))

    n_runs = len(run_starts)
    roots = np.array([find(i) for i in range(n_runs + 1)], dtype=np.int64)
    # relabel roots in raster order of first encounter (runs are raster-ordered)
    remap = np.zeros(n_runs + 1, dtype=np.int32)
    run_len = (run_ends - run_starts).astype(np.int64)
    next_label = 1
    for i in range(n_runs):
        r = roots[i + 1]
        if remap[r] == 0:
            remap[r] = next_label
            next_label += 1
    lut = remap[roots]
    labels = lut[labels_flat].reshape(h, wp)[:, :w]

    sizes = np.zeros(next_label, dtype=np.int64)
    np.add.at(sizes, lut[np.arange(1, n_runs + 1)], run_len)
    sizes[0] = img.size - sizes[1:].sum()
    return next_label, labels, sizes


def largest_label(sizes: np.ndarray, n_labels: int) -> int:
    """Reference scan (train_recognition.py:17-22): start at label 1 (raises
    IndexError if there is no foreground component), strict > keeps the
    smallest label on size ties."""
    max_label = 1
    max_size = sizes[1]  # IndexError on background-only images, by design
    for i in range(2, n_labels):
        if sizes[i] > max_size:
            max_label = i
            max_size = sizes[i]
    return max_label


def remove_dots(image: np.ndarray) -> np.ndarray:
    """Keep only the largest component, as a 0/255 uint8 image
    (reference train_recognition.py:33-55)."""
    n, labels, sizes = label_components(image)
    max_label = largest_label(sizes, n)
    out = np.zeros(labels.shape)
    out[labels == max_label] = 255
    return out.astype(np.uint8)


def split_largest_component(image: np.ndarray) -> tuple[np.ndarray, int]:
    """Zero out the largest component in the LABEL image and return
    (labels_without_largest, largest_label) — the reference's
    `get_largest_connected_component` (train_recognition.py:7-30); the
    returned label image keeps raw label values (the dots), which downstream
    transition counters consume directly."""
    n, labels, sizes = label_components(image)
    max_label = largest_label(sizes, n)
    labels = labels.copy()
    labels[labels == max_label] = 0
    return labels, max_label
