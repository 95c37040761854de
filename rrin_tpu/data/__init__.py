"""Data feeds for training/eval.

``synthetic``: fully on-device linear-motion triplet generator — the
TPU-first stand-in for a Vimeo-90K loader in this air-gapped environment
(no dataset download, and the tunneled host<->device link would bottleneck
a host-side feed).
"""

from rrin_tpu.data.synthetic import synthetic_triplet_batch

__all__ = ["synthetic_triplet_batch"]
