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
    parent: list[int] = [0]  # union-find over provisional run labels
    size: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    prev_runs: list[tuple[int, int, int]] = []  # (start, end_excl, label)
    for y in range(h):
        row = fg[y]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(np.concatenate(([0], row.view(np.int8), [0])))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        cur_runs: list[tuple[int, int, int]] = []
        for s, e in zip(starts, ends):
            lbl = 0
            # 8-connectivity: overlap with previous-row runs extended by 1
            for ps, pe, pl in prev_runs:
                if ps < e + 1 and pe > s - 1:
                    if lbl == 0:
                        lbl = pl
                    else:
                        union(lbl, pl)
            if lbl == 0:
                lbl = len(parent)
                parent.append(lbl)
                size.append(0)
            labels[y, s:e] = lbl
            size[lbl] += e - s
            cur_runs.append((int(s), int(e), lbl))
        prev_runs = cur_runs

    if len(parent) == 1:
        return 1, labels, np.array([img.size], dtype=np.int64)

    # resolve roots; relabel in raster order of first encounter
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int32)
    remap = np.zeros(len(parent), dtype=np.int32)
    next_label = 1
    flat = labels.ravel()
    order = np.flatnonzero(flat)  # raster order of foreground pixels
    for idx in order:
        r = roots[flat[idx]]
        if remap[r] == 0:
            remap[r] = next_label
            next_label += 1
    final = np.zeros_like(flat)
    final[order] = remap[roots[flat[order]]]
    labels = final.reshape(h, w)

    sizes = np.zeros(next_label, dtype=np.int64)
    root_sizes: dict[int, int] = {}
    for lbl in range(1, len(parent)):
        r = int(roots[lbl])
        root_sizes[r] = root_sizes.get(r, 0) + size[lbl]
    for r, s in root_sizes.items():
        sizes[remap[r]] = s
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
