"""rrin_tpu — a TPU-native video frame-interpolation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch tool (Thomasedv/RRIN — see SURVEY.md; the reference mount was empty
during the survey session, so SURVEY.md + BASELINE.json is the normative
spec): given two consecutive video frames ``I0``, ``I1`` and a time
``t ∈ (0, 1)``, synthesize the intermediate frame ``It`` via RRIN's four
cascaded U-Nets (coarse bidirectional flow → flow refinement → adaptive
weight map → residue refinement), plus a CLI that 2^k-upsamples a whole
video's frame rate.

Design (TPU-first, not a port):
  * NHWC throughout; convs lower to XLA ``conv_general_dilated`` tiled onto
    the 128x128 MXU; the whole forward pass jits into one fused graph.
  * The backward bilinear warp (``torch.nn.functional.grid_sample`` in the
    reference) is a gather-interpolate op with a Pallas fast path fused with
    the weighted two-frame blend.
  * Video I/O streams through a double-buffered host<->HBM pipeline.
  * Multi-chip scale-out is data-parallel sharding of frame-pair batches
    over ICI via ``jax.sharding.Mesh`` + NamedSharding — no hand-written
    comm layer.

Public API (mirrors the reference surface, SURVEY.md §1 L3/L5):
    >>> from rrin_tpu import RRIN
    >>> net = RRIN.init(jax.random.key(0))
    >>> it = net(i0, i1, t=0.5)        # NHWC float32 in [0,1]
"""

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import (
    RRIN,
    forward,
    forward_calibrate,
    forward_saturation,
    init_params,
    merge_quant_stats,
    prepare_packed_params,
    scale_quant_stats,
)

__version__ = "0.1.0"

__all__ = [
    "RRIN",
    "ModelConfig",
    "init_params",
    "forward",
    "forward_calibrate",
    "forward_saturation",
    "merge_quant_stats",
    "scale_quant_stats",
    "prepare_packed_params",
    "__version__",
]
