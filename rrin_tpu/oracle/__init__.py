"""Parity oracle: a minimal PyTorch RRIN used only by tests/benchmarks.

Not a shipped compute path — pretrained reference weights are unavailable in
this air-gapped environment (SURVEY.md §3.4), so parity is established by
sharing one set of random weights between this torch model and the JAX model
and asserting per-pixel agreement (SURVEY.md §4 "Parity/golden").
"""
