"""The per-payload extraction pipeline (pure NumPy — the function that runs
inside the Spark `mapInPandas` kernel AND as the serial test oracle).

Mirrors the reference's per-image flow (reference segment_words.py:214-231):
binarize+invert -> deskew -> line segmentation -> per line: baseline, word
separators, right-to-left word loop -> character cuts -> feature vectors ->
1-NN classification -> words accumulated as ``' ' + word`` (the extracted
string therefore carries the reference's leading space; lines top-to-bottom,
words right-to-left within a line).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np

from .classifier import CharModel, match_feat_to_char
from .features import batch_get_feat_vectors
from .geometry import deskew
from .imgops import binarize_inv
from .segmentation import TemplateSpec, contour_seg, segment_lines, word_separators

__all__ = ["ExtractionResult", "extract_page", "iter_words"]


@dataclass
class ExtractionResult:
    text: str = ""
    n_lines: int = 0
    n_words: int = 0
    ok: bool = True
    err: str = ""
    feat_vectors: list = field(default_factory=list, repr=False)


def iter_words(image: np.ndarray, skip_deskew: bool = False) -> Iterator[tuple[np.ndarray, list, int]]:
    """Grayscale page -> (word_image, char_cut_points, line_index) in the
    reference's processing order (lines top-down, words right-to-left).
    Word-level errors propagate; callers decide the failure policy."""
    binary = binarize_inv(image)
    if not skip_deskew:
        binary = deskew(binary)
    lines = segment_lines(binary)
    for line_idx, line in enumerate(lines):
        seps, baseline = word_separators(line)
        previous_width = line.shape[1]
        for i in range(len(seps) - 1, -1, -1):
            word = line[:, int(seps[i]):previous_width]
            previous_width = int(seps[i])
            cuts = contour_seg(word, baseline)
            yield word, cuts, line_idx


def extract_page(
    image: np.ndarray | None,
    model: CharModel,
    templates: list[TemplateSpec] | None = None,
    skip_deskew: bool = False,
    keep_feat_vectors: bool = False,
) -> ExtractionResult:
    """Full page extraction.  A page-level failure (degenerate projections,
    blank payload, reference-crash-equivalent states) yields ok=False with
    empty text — the serial oracle and the Spark kernel share this exact
    function, so per-turn equality is structural."""
    if image is None:
        return ExtractionResult(text="", ok=False, err="blank_payload")
    res = ExtractionResult()
    recognized = ""
    try:
        binary = binarize_inv(image)
        if not skip_deskew:
            binary = deskew(binary)
        lines = segment_lines(binary)
        res.n_lines = len(lines)
        for line in lines:
            seps, baseline = word_separators(line)
            previous_width = line.shape[1]
            for i in range(len(seps) - 1, -1, -1):
                word = line[:, int(seps[i]):previous_width]
                previous_width = int(seps[i])
                cuts = contour_seg(word, baseline, templates)
                fvs = batch_get_feat_vectors(word, cuts)
                if keep_feat_vectors:
                    res.feat_vectors.append([list(fv) for fv in fvs])
                recognized += " " + match_feat_to_char(model, fvs)
                res.n_words += 1
    except Exception as exc:  # reference-crash-equivalent turn
        return ExtractionResult(text="", ok=False, err=f"{type(exc).__name__}: {exc}")
    res.text = recognized
    return res
