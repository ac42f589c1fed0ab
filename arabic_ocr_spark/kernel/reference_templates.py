"""The reference's concrete pattern-template table, as data.

The reference hard-codes thirteen pattern PNGs (/root/reference/patterns/)
with per-template match thresholds and suppression actions
(/root/reference/preprocess.py:329-394).  Our engine generalizes the
mechanism into configurable TemplateSpecs (kernel/segmentation.py) because
the synthetic alphabet has different glyph shapes — but the reference's
exact (name, threshold, action) table is part of its observable tuning and
is preserved here verbatim for fidelity and parity audits.  The PNG pixels
themselves are glyph artwork for the reference's Arabic fonts and are
deliberately NOT copied; `build_specs` binds the table to any alphabet's
own pattern images.
"""

from __future__ import annotations

import numpy as np

from .segmentation import TemplateSpec

__all__ = ["REFERENCE_TEMPLATE_TABLE", "build_specs"]

# (pattern name, NCC threshold, action, enabled) — preprocess.py:329-394.
# 'enabled' False marks the two templates the reference ships but keeps
# commented out (ra2_end, dal_end) and the unused seen_mid_2 file.
REFERENCE_TEMPLATE_TABLE: tuple[tuple[str, float, str, bool], ...] = (
    ("seen_start", 0.70, "whiten", True),
    ("seen_mid", 0.80, "whiten_inset", True),   # the +3 / -5 inset masking
    ("seen_end", 0.75, "whiten", True),
    ("kaf", 0.70, "whiten", True),
    ("kaf_end", 0.65, "whiten", True),
    ("fa2", 0.65, "whiten", True),
    ("sad", 0.75, "whiten", True),
    ("ba2", 0.70, "whiten", True),
    ("ba2_end", 0.65, "whiten", True),
    ("ya2_end", 0.75, "cut_after", True),       # appends a cut at p + width
    ("ra2_end", 0.85, "whiten", False),
    ("dal_end", 0.70, "whiten", False),
    ("seen_mid_2", 0.80, "whiten_inset", False),
)


def build_specs(images: dict[str, np.ndarray], include_disabled: bool = False) -> list[TemplateSpec]:
    """Binds the reference's threshold/action table to an alphabet's own
    pattern images: `images` maps template name -> binary uint8 raster.
    Names absent from `images` are skipped (an alphabet need not have an
    analog of every Arabic ligature).  Order follows the reference's match
    order, which is observable (cuts/whitening apply in sequence)."""
    specs = []
    for name, threshold, action, enabled in REFERENCE_TEMPLATE_TABLE:
        if not (enabled or include_disabled):
            continue
        img = images.get(name)
        if img is None:
            continue
        specs.append(TemplateSpec(name=name, image=img, threshold=threshold, action=action))
    return specs
