"""TPU-native ops: backward warp, fused warp+blend, resize, padding.

These replace the native kernels the reference borrows from PyTorch
(SURVEY.md §2.2): cuDNN convs -> XLA NHWC convs (in models/), CUDA
``grid_sample`` -> gather-interpolate warp (XLA path here; Pallas fast path
in ops/warp_pallas.py), ATen pool/upsample -> hand-rolled fusable lax ops.
"""

from rrin_tpu.ops.pad import pad_to_multiple, unpad
from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear
from rrin_tpu.ops.warp import warp_bilinear, warp_blend, warp_pair

__all__ = [
    "pad_to_multiple",
    "unpad",
    "avg_pool_2x",
    "upsample_2x_bilinear",
    "warp_bilinear",
    "warp_pair",
    "warp_blend",
]
