"""Image-pair demo tool (SURVEY.md §2.1 row 9, §3.3).

The upstream-style `test.py`: interpolate the middle frame between two
still images (Vimeo-90K triplet style) and write it out. CPU-runnable
(BASELINE.json config 1).

    python -m rrin_tpu.interp_image --im1 a.png --im3 b.png -o mid.png \
        [--t 0.5] [--ckpt w.npz] [--gt im2.png]

With --gt, prints PSNR/SSIM of the prediction against the ground-truth
middle frame (the §3.3 eval flow for a single triplet).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional


def interpolate_pair(params, im1, im3, t=0.5, cfg=None, compute_dtype="float32",
                     use_pallas: bool = False, int8: bool = False,
                     int8_margin: float = 1.2):
    """im1/im3: HWC uint8 RGB -> HWC uint8 RGB interpolated frame.

    ``int8`` calibrates activation ranges on this pair and runs the
    carried-int8 packed path (requires a packed-supported shape)."""
    import jax.numpy as jnp
    import numpy as np

    from rrin_tpu.config import ModelConfig
    from rrin_tpu.models.rrin import forward, forward_calibrate, scale_quant_stats
    from rrin_tpu.ops.pad import pad_to_multiple, unpad

    cfg = cfg or ModelConfig()
    cd = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[compute_dtype]
    i0 = jnp.asarray(im1.astype("float32") / 255.0)[None]
    i1 = jnp.asarray(im3.astype("float32") / 255.0)[None]
    i0p, hw = pad_to_multiple(i0, cfg.pad_multiple)
    i1p, _ = pad_to_multiple(i1, cfg.pad_multiple)
    quant_stats = None
    if int8:
        from rrin_tpu.models.unet import packed_supported

        if not packed_supported(i0p.shape[1], i0p.shape[2], cfg):
            raise ValueError(
                "int8 needs the packed fast path, which does not support "
                f"{i0p.shape[1]}x{i0p.shape[2]}"
            )
        _, st = forward_calibrate(params, i0p, i1p, t, cfg=cfg,
                                  compute_dtype=cd, use_pallas=use_pallas)
        quant_stats = scale_quant_stats(st, int8_margin)
    pred = forward(params, i0p, i1p, t, cfg=cfg, compute_dtype=cd,
                   use_pallas=use_pallas, packed=use_pallas or int8,
                   quant_stats=quant_stats)
    pred = unpad(pred, hw)[0]
    return np.asarray(jnp.round(jnp.clip(pred, 0, 1) * 255.0)).astype("uint8")


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="rrin-tpu-image")
    p.add_argument("--im1", required=True, help="first frame image")
    p.add_argument("--im3", required=True, help="third frame image")
    p.add_argument("--output", "-o", required=True, help="predicted middle frame")
    p.add_argument("--t", type=float, default=0.5)
    p.add_argument("--ckpt", default=None, help=".npz or .pth weights")
    p.add_argument("--gt", default=None, help="ground-truth middle frame (prints PSNR/SSIM)")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="calibrated int8 packed path (see cli.py --int8)")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    im1 = cv2.imread(args.im1, cv2.IMREAD_COLOR)
    im3 = cv2.imread(args.im3, cv2.IMREAD_COLOR)
    if im1 is None or im3 is None:
        print("error: cannot read input images", file=sys.stderr)
        return 2
    if im1.shape != im3.shape:
        print(f"error: shape mismatch {im1.shape} vs {im3.shape}", file=sys.stderr)
        return 2

    import jax

    from rrin_tpu.models.rrin import init_params
    from rrin_tpu.params import load_params, load_torch_checkpoint

    if args.ckpt is None:
        print("[rrin-tpu-image] WARNING: random weights (smoke test only)",
              file=sys.stderr)
        params = init_params(jax.random.key(0))
    elif args.ckpt.endswith((".pth", ".tar", ".pt")):
        params = load_torch_checkpoint(args.ckpt)
    else:
        params = load_params(args.ckpt)

    pred = interpolate_pair(
        params, im1[:, :, ::-1], im3[:, :, ::-1], t=args.t,
        compute_dtype="float32" if args.fp32 else "bfloat16",
        use_pallas=not args.no_pallas,
        int8=args.int8,
    )
    cv2.imwrite(args.output, pred[:, :, ::-1])

    if args.gt:
        import jax.numpy as jnp

        from rrin_tpu.metrics import psnr, ssim

        gt = cv2.imread(args.gt, cv2.IMREAD_COLOR)
        if gt is None:
            print("error: cannot read --gt image", file=sys.stderr)
            return 2
        a = jnp.asarray(pred.astype(np.float32) / 255.0)[None]
        b = jnp.asarray(gt[:, :, ::-1].astype(np.float32) / 255.0)[None]
        print(json.dumps({
            "psnr": round(float(psnr(a, b)[0]), 4),
            "ssim": round(float(ssim(a, b)[0]), 5),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
