"""Checkpoint save/load + PyTorch state-dict converter (SURVEY.md §3.4, §5).

The reference ships weights as a ``.pth`` torch state_dict (keys like
``flow.down1.conv1.weight``, OIHW). Users migrating from the reference load
those through :func:`convert_torch_state_dict`, which transposes OIHW->HWIO
and maps the module path onto our nested-dict pytree. Native checkpoints are
flat ``.npz`` files (air-gap friendly; no external deps).
"""

from rrin_tpu.params.checkpoint import (
    convert_torch_state_dict,
    flatten_params,
    load_calibration,
    load_params,
    load_torch_checkpoint,
    params_to_torch_state_dict,
    save_calibration,
    save_params,
    unflatten_params,
)

__all__ = [
    "save_params",
    "load_params",
    "save_calibration",
    "load_calibration",
    "flatten_params",
    "unflatten_params",
    "convert_torch_state_dict",
    "load_torch_checkpoint",
    "params_to_torch_state_dict",
]
