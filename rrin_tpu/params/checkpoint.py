"""Weight checkpointing and the PyTorch<->JAX converter.

Layout contract (SURVEY.md §7.3 "NCHW->NHWC + OIHW->HWIO"):
  torch ``<unet>.<block>.<conv>.weight``  (O, I, kh, kw)
    ->  params[<unet>][<block>][<conv>]["w"]  (kh, kw, I, O)
  torch ``....bias`` (O,) -> ...["b"] (O,)
A leading ``module.`` prefix (DataParallel-trained upstream checkpoints,
SURVEY.md §3.4) is stripped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict pytree -> flat {'flow.down1.conv1.w': ndarray}."""
    out: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(flatten_params(v, prefix=key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Params:
    out: Params = {}
    for key, v in flat.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return out


def save_params(path: str, params: Params) -> None:
    """Save weights: flat .npz by default, or an Orbax checkpoint when
    ``path`` ends with ``.orbax`` (multi-host-safe, SURVEY.md §5)."""
    if path.endswith(".orbax"):
        import os

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {k: np.asarray(v) for k, v in flatten_params(params).items()},
                force=True,
            )
        return
    np.savez(path, **flatten_params(params))


def load_params(path: str) -> Params:
    if path.endswith(".orbax"):
        import os

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            flat = ckptr.restore(os.path.abspath(path))
        return unflatten_params(flat)
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


CALIB_PREFIX = "__calib__."


def save_calibration(path: str, quant_stats: Params) -> None:
    """Persist int8 calibration stats (per-tensor |x| maxima from
    ``forward_calibrate``, usually already margin-scaled) as a flat .npz —
    SURVEY.md §5 checkpoint/resume: ``--int8`` serving can then load the
    ranges instead of re-calibrating (and re-compiling the calibration
    graph) on every process start. The stats are per-tensor scalars, so
    one file serves every resolution."""
    flat = {CALIB_PREFIX + k: v for k, v in flatten_params(quant_stats).items()}
    np.savez(path, **flat)


def load_calibration(path: str) -> Params:
    """Inverse of :func:`save_calibration`. Also accepts an .npz written
    without the calib prefix (plain flattened stats)."""
    with np.load(path) as data:
        flat = {}
        for k in data.files:
            key = k[len(CALIB_PREFIX):] if k.startswith(CALIB_PREFIX) else k
            flat[key] = data[k]
    if not flat:
        raise ValueError(f"no calibration entries in {path}")
    return unflatten_params(flat)


def convert_torch_state_dict(
    state_dict: Mapping[str, Any], strict: bool = True
) -> Params:
    """Convert a reference-layout torch state_dict to our param pytree.

    Accepts torch tensors or numpy arrays as values; strips a ``module.``
    prefix; transposes conv weights OIHW -> HWIO.

    strict=True (the parity-test mode) raises on any unrecognized key;
    strict=False skips non-weight entries (real checkpoints often carry
    epoch counters, optimizer state, etc. — SURVEY.md App-C item 7) and
    reports them on stderr.
    """
    flat: Dict[str, np.ndarray] = {}
    skipped = []
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module.") :]
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if key.endswith(".weight") and arr.ndim == 4:
            flat[key[: -len(".weight")] + ".w"] = np.transpose(arr, (2, 3, 1, 0))
        elif key.endswith(".bias") and arr.ndim == 1:
            flat[key[: -len(".bias")] + ".b"] = arr
        elif strict:
            raise ValueError(
                f"unrecognized state_dict key: {key} (shape {arr.shape}); "
                "pass strict=False to skip non-weight entries"
            )
        else:
            skipped.append(key)
    if skipped:
        import sys

        print(
            f"[rrin-tpu] skipped {len(skipped)} non-weight state_dict "
            f"key(s): {', '.join(skipped[:8])}"
            + (" ..." if len(skipped) > 8 else ""),
            file=sys.stderr,
        )
    return unflatten_params(flat)


def load_torch_checkpoint(path: str, strict: bool = False) -> Params:
    """Load a reference ``.pth``/``.pth.tar`` checkpoint (requires torch).

    Lenient by default: entries that are not conv weights/biases (epoch
    counters, optimizer state) are skipped with a warning.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    return convert_torch_state_dict(obj, strict=strict)


def params_to_torch_state_dict(params: Params) -> Dict[str, Any]:
    """Inverse converter (our pytree -> reference-layout torch tensors).

    Used by the parity tests to push one set of random JAX weights into the
    PyTorch oracle (SURVEY.md §4 "Parity/golden").
    """
    import torch

    out: Dict[str, Any] = {}
    for key, arr in flatten_params(params).items():
        if key.endswith(".w"):
            out[key[:-2] + ".weight"] = torch.from_numpy(
                np.ascontiguousarray(np.transpose(np.asarray(arr), (3, 2, 0, 1)))
            )
        elif key.endswith(".b"):
            out[key[:-2] + ".bias"] = torch.from_numpy(np.asarray(arr).copy())
        else:
            raise ValueError(f"unrecognized param key: {key}")
    return out
