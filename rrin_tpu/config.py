"""Frozen dataclass configs (SURVEY.md §5 "Config / flag system").

The reference exposes argparse flags only; here the model/pipeline knobs are
small frozen dataclasses so they are hashable (usable as jit static args)
and the CLI simply overrides fields.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the RRIN cascade (SURVEY.md App-A/App-B).

    Channel signatures of the four U-Nets (SURVEY.md §2.1 row 2):
      flow 6->4, refine 10->4, mask 16->2, final 9->3.
    """

    # Stem width; encoder doubles it at each of the 4 pooling stages.
    base_width: int = 32
    # Encoder conv kernel sizes per stage (stem is 7x7, SURVEY.md App-B).
    stem_kernel: int = 7
    down_kernels: Tuple[int, int, int, int] = (5, 3, 3, 3)
    # LeakyReLU negative slope (SURVEY.md §2.1 row 3).
    leaky_slope: float = 0.1
    # grid_sample-compatible warp semantics. False matches running the
    # reference under modern PyTorch defaults (SURVEY.md §7.3: re-verify when
    # the reference mount is populated; both paths are implemented).
    align_corners: bool = False
    # Epsilon in the adaptive weighted blend (SURVEY.md App-A.5).
    blend_eps: float = 1e-8
    # Spatial dims must be padded to a multiple of this (4 pooling stages).
    pad_multiple: int = 16

    @property
    def widths(self) -> Tuple[int, int, int, int, int]:
        w = self.base_width
        return (w, 2 * w, 4 * w, 8 * w, 16 * w)
