"""Trained-weights end-to-end artifact (VERDICT r2 item 5).

Trains the cascade to convergence on the on-device synthetic linear-motion
feed (rrin_tpu.data.synthetic), saves the checkpoint (float16-compressed,
resolution-independent), then evaluates on a HELD-OUT synthetic triplet
set (different seed, file-based via the standard eval harness):

  * fp32 plain path          (the quality reference)
  * bf16 packed fast path    (the serving default)
  * int8 packed path         (calibrated; the quality gate that has only
                              ever been measured with random weights)
  * random-init baseline     (proves training actually moved quality)

Writes benchmarks/TRAINED_EVAL.json. Gates (asserted here and re-checked
by tests/test_trained.py from the committed artifact + checkpoint):
  - trained PSNR beats the random-weights blend by a wide margin
  - int8 PSNR within ~0.5 dB of the fp32-path PSNR (calibration survives
    trained activation statistics)

Usage (on TPU; ~10 min):
    python benchmarks/train_artifact.py [--steps 3000] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def train(steps: int, batch: int, crop, lr: float, loss: str, log_every=100):
    from rrin_tpu.data import synthetic_triplet_batch
    from rrin_tpu.train import Trainer

    trainer = Trainer.create(
        key=jax.random.key(7), learning_rate=lr,
        compute_dtype=jnp.bfloat16, loss=loss,
    )
    key = jax.random.key(0)
    t0 = time.perf_counter()
    losses = []
    for step in range(steps):
        i0, gt, i1 = synthetic_triplet_batch(
            jax.random.fold_in(key, step), batch, tuple(crop)
        )
        cur = trainer.step(i0, gt, i1)
        losses.append(cur)
        if step % log_every == 0 or step == steps - 1:
            print(f"step {step:6d}  loss {cur:.5f}  "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    return trainer.params, losses


def evaluate_all(params, data_root: str, batch: int):
    from rrin_tpu.eval import evaluate, find_triplets

    dirs = find_triplets(data_root)
    assert dirs, data_root
    out = {}
    out["fp32_plain"] = evaluate(
        params, dirs, batch_size=batch, compute_dtype="float32",
        use_pallas=False,
    )
    out["bf16_packed"] = evaluate(
        params, dirs, batch_size=batch, compute_dtype="bfloat16",
        use_pallas=True,
    )
    out["int8_packed"] = evaluate(
        params, dirs, batch_size=batch, compute_dtype="bfloat16",
        use_pallas=True, int8=True,
    )
    # Percentile-clipped calibration (pipeline --int8-percentile): the
    # quality evidence for the outlier-clipping mode on trained weights.
    out["int8_pctl99.9_packed"] = evaluate(
        params, dirs, batch_size=batch, compute_dtype="bfloat16",
        use_pallas=True, int8=True, int8_percentile=99.9,
    )
    for k in out:
        # Per-motion-tier PSNR means (dirs are <root>/m<motion>/<i>): the
        # varied-motion breakdown (VERDICT r4 item 6) without shipping
        # every per-triplet row.
        tiers = {}
        for row in out[k].pop("per_triplet", []):
            parts = os.path.normpath(row["dir"]).split(os.sep)
            tier = next((p for p in parts if p.startswith("m") and
                         p[1:].replace(".", "").isdigit()), "all")
            tiers.setdefault(tier, []).append(row["psnr"])
        if len(tiers) > 1:
            out[k]["psnr_by_motion"] = {
                t: round(float(np.mean(v)), 4)
                for t, v in sorted(tiers.items(),
                                   key=lambda kv: float(kv[0][1:]))
            }
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--crop", type=int, nargs=2, default=(256, 448))
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--loss", default="charbonnier")
    p.add_argument("--eval-count", type=int, default=64)
    p.add_argument("--eval-batch", type=int, default=4)
    p.add_argument("--ckpt-out",
                   default=os.path.join(HERE, "trained_synth_f16.npz"))
    p.add_argument("--report-out",
                   default=os.path.join(HERE, "TRAINED_EVAL.json"))
    p.add_argument("--skip-train", action="store_true",
                   help="reuse --ckpt-out and only re-run the eval")
    args = p.parse_args()

    from rrin_tpu.eval import synthesize_triplets
    from rrin_tpu.models.rrin import init_params
    from rrin_tpu.params import flatten_params, load_params, unflatten_params

    t_start = time.perf_counter()
    if args.skip_train:
        params = load_params(args.ckpt_out)
        losses = []
    else:
        params, losses = train(
            args.steps, args.batch, args.crop, args.lr, args.loss
        )
        params = jax.device_get(params)
        # float16 on disk: resolution-independent trained weights, half
        # the repo footprint; eval below runs from THIS file so the
        # committed artifact is exactly reproducible.
        flat16 = {k: np.asarray(v, np.float16)
                  for k, v in flatten_params(params).items()}
        np.savez_compressed(args.ckpt_out, **flat16)
    params = unflatten_params(
        {k: np.asarray(v, np.float32)
         for k, v in flatten_params(load_params(args.ckpt_out)).items()}
    )

    # Held-out set: seed disjoint from the training feed's key stream.
    # Four motion tiers (per-step px; endpoint motion is 2x) — m3/m6 are
    # in-distribution (the feed trains at max_shift 6), m12/m20 probe
    # out-of-distribution magnitude, so the report shows where the linear-
    # motion checkpoint degrades and that int8 tracks fp32 across ALL
    # tiers, not just easy ones. (Flows large enough to trip the Pallas
    # warp's in-image |dx|>126 fallback cannot be reached this way — a
    # +-6px-trained net never emits them; that path is pinned by
    # tests/test_warp_pallas + bench.py's on-device selfcheck instead.)
    MOTION_TIERS = (3.0, 6.0, 12.0, 20.0)
    per_tier = max(1, args.eval_count // len(MOTION_TIERS))
    eval_root = f"/tmp/rrin_trained_eval_triplets_{per_tier}x{len(MOTION_TIERS)}"
    if not os.path.isdir(eval_root):
        for ti, motion in enumerate(MOTION_TIERS):
            synthesize_triplets(
                os.path.join(eval_root, f"m{motion:g}"), per_tier,
                hw=(256, 448), seed=1234 + ti, motion=motion,
            )

    results = evaluate_all(params, eval_root, args.eval_batch)
    rand_results = evaluate_all(
        jax.device_get(init_params(jax.random.key(0))), eval_root,
        args.eval_batch,
    )

    fp32 = results["fp32_plain"]["psnr_mean"]
    int8 = results["int8_packed"]["psnr_mean"]
    bf16 = results["bf16_packed"]["psnr_mean"]
    pctl = results["int8_pctl99.9_packed"]["psnr_mean"]
    rand = rand_results["fp32_plain"]["psnr_mean"]
    report = {
        "generated": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "backend": jax.default_backend(),
        "train": {
            "steps": args.steps, "batch": args.batch,
            "crop": list(args.crop), "lr": args.lr, "loss": args.loss,
            "loss_first": losses[0] if losses else None,
            "loss_last_100_mean":
                float(np.mean(losses[-100:])) if losses else None,
            "feed": "rrin_tpu.data.synthetic (on-device linear motion)",
        },
        "eval": {
            "set": f"{per_tier * len(MOTION_TIERS)} held-out synthetic "
                   "triplets, 256x448, motion tiers "
                   f"m{'/m'.join(f'{m:g}' for m in MOTION_TIERS)} px/step "
                   "(eval.synthesize_triplets seeds 1234+tier)",
            "trained": results,
            "random_init": rand_results,
        },
        "gates": {
            "trained_beats_random_by_db": round(fp32 - rand, 2),
            "int8_vs_fp32_db": round(int8 - fp32, 2),
            "bf16_vs_fp32_db": round(bf16 - fp32, 2),
            # Percentile clipping may BEAT absmax (finer grid) — gate only
            # the downside vs fp32, same 0.5 dB envelope.
            "int8_pctl_vs_fp32_db": round(pctl - fp32, 2),
            "ok": bool(fp32 - rand > 3.0 and abs(int8 - fp32) < 0.5
                       and abs(bf16 - fp32) < 0.5
                       and pctl - fp32 > -0.5),
        },
        "wall_seconds": round(time.perf_counter() - t_start, 1),
    }
    with open(args.report_out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["gates"], indent=2))
    return 0 if report["gates"]["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
