"""Training subsystem: loss, sharded train step, triplet data feed.

The reference repo ships inference only (SURVEY.md §2.1: "Not present in
the reference: training loop, loss functions, dataset loaders"), but the
paper trained on Vimeo-90K triplets with an L1-style reconstruction loss
(SURVEY.md §2.1 note, [P]). This module provides that capability TPU-first:

  * Charbonnier (smooth-L1) reconstruction loss, the standard robust choice
    for frame interpolation.
  * ``train_step``: pure jitted (params, opt_state, batch) update. Run it
    under a data-parallel Mesh by sharding the batch (parallel/sharding.py);
    XLA emits the gradient psum over ICI automatically — no pmap, no
    hand-written allreduce.
  * Optional spatial sharding of H for very large crops (halo exchanges
    XLA-inserted).
  * Optax Adamax (the paper's optimizer family) by default.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rrin_tpu.config import ModelConfig
from rrin_tpu.models.rrin import forward, init_params

Params = Dict[str, Any]


def charbonnier(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain L1 — one of the paper's training losses (SURVEY.md §2.1
    note: the paper trained with Laplacian + L1)."""
    return jnp.mean(jnp.abs(pred - target))


def laplacian(pred: jnp.ndarray, target: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Laplacian-pyramid L1 (the paper's perceptually-weighted loss,
    SURVEY.md §2.1 note): L1 between band-pass residuals at each pyramid
    level, weighted 2^level (coarse bands weigh more, the standard LapLoss
    schedule), plus the low-pass top. Pyramid via the framework's own
    avg-pool/bilinear resize ops — band definitions match inference math.
    """
    from rrin_tpu.ops.resize import avg_pool_2x, upsample_2x_bilinear

    total = jnp.float32(0.0)
    p, t = pred, target
    built = 0  # bands actually built (odd/small crops stop the pyramid)
    for _ in range(levels):
        if p.shape[1] % 2 or p.shape[2] % 2 or min(p.shape[1:3]) <= 2:
            break
        pd, td = avg_pool_2x(p), avg_pool_2x(t)
        lap_p = p - upsample_2x_bilinear(pd)
        lap_t = t - upsample_2x_bilinear(td)
        total = total + (2.0 ** built) * jnp.mean(jnp.abs(lap_p - lap_t))
        p, t = pd, td
        built += 1
    # Top (low-pass) term continues the schedule at the NEXT weight — on
    # a crop that admitted fewer bands, 2**levels would discontinuously
    # overweight the residual (a 32x-scaled L1 masquerading as LapLoss).
    return total + (2.0 ** built) * jnp.mean(jnp.abs(p - t))


LOSSES = {"charbonnier": charbonnier, "l1": l1, "laplacian": laplacian}


def make_optimizer(
    learning_rate: float = 1e-4, kind: str = "adamax"
) -> optax.GradientTransformation:
    if kind == "adamax":
        return optax.adamax(learning_rate)
    if kind == "adam":
        return optax.adam(learning_rate)
    raise ValueError(f"unknown optimizer: {kind}")


def loss_fn(
    params: Params,
    i0: jnp.ndarray,
    gt: jnp.ndarray,
    i1: jnp.ndarray,
    t: Any = 0.5,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: Any = jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
    loss: str = "charbonnier",
) -> jnp.ndarray:
    pred = forward(
        params, i0, i1, t, cfg=cfg, compute_dtype=compute_dtype,
        use_pallas=use_pallas, remat=remat,
    )
    return LOSSES[loss](pred, gt.astype(jnp.float32))


@partial(
    jax.jit,
    static_argnames=("optimizer", "cfg", "compute_dtype", "use_pallas",
                     "remat", "loss"),
    donate_argnames=("params", "opt_state"),
)
def train_step(
    params: Params,
    opt_state: Any,
    i0: jnp.ndarray,
    gt: jnp.ndarray,
    i1: jnp.ndarray,
    t: Any,
    optimizer: optax.GradientTransformation,
    cfg: ModelConfig = ModelConfig(),
    compute_dtype: Any = jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
    loss: str = "charbonnier",
) -> Tuple[Params, Any, jnp.ndarray]:
    """One SGD update. Shard the batch dims over a Mesh and this same jit
    becomes the multi-chip data-parallel step (gradients psum over ICI)."""
    loss_v, grads = jax.value_and_grad(loss_fn)(
        params, i0, gt, i1, t, cfg=cfg, compute_dtype=compute_dtype,
        use_pallas=use_pallas, remat=remat, loss=loss,
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_v


@dataclass
class Trainer:
    """Bundles params/optimizer/mesh for a training run (SURVEY.md §5
    checkpoint/resume: save/load via rrin_tpu.params)."""

    params: Params
    optimizer: optax.GradientTransformation
    opt_state: Any
    cfg: ModelConfig = ModelConfig()
    compute_dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    remat: bool = False
    mesh: Optional[Any] = None  # jax.sharding.Mesh
    spatial_dim: Optional[int] = None
    step_count: int = 0
    loss: str = "charbonnier"  # see LOSSES (paper: laplacian / l1)

    @classmethod
    def create(
        cls,
        key: Optional[jax.Array] = None,
        learning_rate: float = 1e-4,
        optimizer: str = "adamax",
        cfg: ModelConfig = ModelConfig(),
        mesh: Optional[Any] = None,
        params: Optional[Params] = None,
        **kw,
    ) -> "Trainer":
        if params is None:
            params = init_params(key if key is not None else jax.random.key(0), cfg)
        opt = make_optimizer(learning_rate, optimizer)
        opt_state = opt.init(params)
        if mesh is not None:
            from rrin_tpu.parallel.sharding import replicate_params

            params = replicate_params(mesh, params)
            opt_state = replicate_params(mesh, opt_state)
        return cls(params=params, optimizer=opt, opt_state=opt_state, cfg=cfg,
                   mesh=mesh, **kw)

    def step(self, i0: np.ndarray, gt: np.ndarray, i1: np.ndarray,
             t: Any = 0.5) -> float:
        if self.mesh is not None and i0.shape[0] % self.mesh.devices.size:
            raise ValueError(
                f"batch size {i0.shape[0]} must be divisible by the mesh "
                f"size {self.mesh.devices.size} for data-parallel training"
            )
        arrays = (jnp.asarray(i0), jnp.asarray(gt), jnp.asarray(i1))
        if self.mesh is not None:
            from rrin_tpu.parallel.sharding import shard_pairs

            arrays = shard_pairs(self.mesh, *arrays, spatial_dim=self.spatial_dim)
        self.params, self.opt_state, loss = train_step(
            self.params, self.opt_state, *arrays, t, self.optimizer,
            cfg=self.cfg, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas, remat=self.remat, loss=self.loss,
        )
        self.step_count += 1
        return float(loss)


def triplet_batches(
    root: str, batch_size: int, crop_hw: Tuple[int, int] = (256, 448),
    seed: int = 0, epochs: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Random-crop batches from a Vimeo-style triplet directory tree.

    Yields (i0, gt, i1) float32 NHWC batches in [0,1]. Crops are aligned to
    the /16 padding requirement so no padding is needed in training.
    """
    ch, cw = crop_hw
    if ch % 16 or cw % 16:
        raise ValueError("crop dims must be multiples of 16")

    import os

    from rrin_tpu.eval import FRAME_NAMES, find_triplets, image_hw, load_triplet

    # Filter undersized triplets ONCE up front (header-only reads) so every
    # yielded batch has exactly batch_size items: ragged batches would trip
    # the data-parallel divisibility check and force jit retraces.
    all_dirs = find_triplets(root)
    if not all_dirs:
        raise FileNotFoundError(f"no triplets under {root}")
    dirs = []
    for d in all_dirs:
        h, w = image_hw(os.path.join(d, FRAME_NAMES[0]))
        if h >= ch and w >= cw:
            dirs.append(d)
    if len(dirs) < len(all_dirs):
        import sys

        print(
            f"[rrin-tpu-train] dropped {len(all_dirs) - len(dirs)} triplet(s) "
            f"smaller than the {ch}x{cw} crop",
            file=sys.stderr,
        )
    if len(dirs) < batch_size:
        raise ValueError(
            f"only {len(dirs)} usable triplet(s) under {root} for "
            f"batch_size={batch_size}"
        )
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(dirs))
        for i in range(0, len(dirs) - batch_size + 1, batch_size):
            ims = [load_triplet(dirs[j]) for j in order[i : i + batch_size]]
            b0, bg, b1 = [], [], []
            for im1, im2, im3 in ims:
                h, w = im1.shape[:2]
                y = rng.integers(0, h - ch + 1)
                x = rng.integers(0, w - cw + 1)
                sl = np.s_[y : y + ch, x : x + cw]
                b0.append(im1[sl])
                bg.append(im2[sl])
                b1.append(im3[sl])
            yield (
                np.stack(b0).astype(np.float32) / 255.0,
                np.stack(bg).astype(np.float32) / 255.0,
                np.stack(b1).astype(np.float32) / 255.0,
            )
        epoch += 1


def main(argv=None) -> int:
    """Minimal training CLI: python -m rrin_tpu.train --data trips/ ..."""
    import argparse

    from rrin_tpu.params import save_params

    p = argparse.ArgumentParser(prog="rrin-tpu-train")
    p.add_argument("--data", default=None, help="triplet root directory")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the fully on-device linear-motion "
                   "triplet feed (rrin_tpu.data.synthetic) instead of "
                   "--data files — zero host transfer per step")
    p.add_argument("--loss", choices=sorted(LOSSES), default="charbonnier",
                   help="reconstruction loss (paper: laplacian / l1)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--crop", type=int, nargs=2, default=(256, 448))
    p.add_argument("--ckpt-out", default="rrin_tpu_ckpt.npz")
    p.add_argument("--init-from", default=None, help="warm start .npz/.pth")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="devices for DP; 0 = all")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (numeric sanitizer, "
                   "SURVEY.md §5) — slow, for debugging divergence")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize U-Nets under autodiff "
                   "(jax.checkpoint): fits much larger crops in HBM")
    args = p.parse_args(argv)

    # Validate the data source BEFORE the 32M-param model/optimizer are
    # built (Trainer.create is minutes on a tunneled TPU backend).
    if not (args.synthetic or args.data):
        p.error("one of --data or --synthetic is required")

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from rrin_tpu.parallel.distributed import initialize as dist_init

    ctx = dist_init()
    if ctx.process_count > 1:
        print(f"[rrin-tpu-train] multi-host: process {ctx.process_index}/"
              f"{ctx.process_count}, {ctx.global_device_count} devices")

    mesh = None
    if args.data_parallel != 1:
        import math

        from rrin_tpu.parallel.sharding import make_mesh

        n = args.data_parallel if args.data_parallel > 0 else len(jax.devices())
        # The batch must divide over the mesh; shrink to the largest
        # compatible device count rather than failing mid-run.
        n = math.gcd(n, args.batch)
        if n > 1:
            try:
                mesh = make_mesh(n_data=n)
            except ValueError:
                mesh = None
        if mesh is not None and mesh.devices.size == 1:
            mesh = None  # single device: skip sharding machinery

    params = None
    if args.init_from:
        from rrin_tpu.params import load_params, load_torch_checkpoint

        params = (
            load_torch_checkpoint(args.init_from)
            if args.init_from.endswith((".pth", ".tar", ".pt"))
            else load_params(args.init_from)
        )

    trainer = Trainer.create(
        learning_rate=args.lr, mesh=mesh, params=params,
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        remat=args.remat, loss=args.loss,
    )
    if args.synthetic:
        from rrin_tpu.data import synthetic_triplet_batch

        def _synthetic_gen():
            key = jax.random.key(0)
            step = 0
            while True:
                yield synthetic_triplet_batch(
                    jax.random.fold_in(key, step), args.batch,
                    tuple(args.crop),
                )
                step += 1

        batches = _synthetic_gen()
    else:
        # args.data is set: (synthetic or data) was validated up front,
        # before the model/optimizer build.
        batches = triplet_batches(args.data, args.batch, tuple(args.crop))
    t0 = time.perf_counter()
    for step in range(args.steps):
        i0, gt, i1 = next(batches)
        loss = trainer.step(i0, gt, i1)
        if step % args.log_every == 0 or step == args.steps - 1:
            dt = time.perf_counter() - t0
            print(f"step {step:6d}  loss {loss:.5f}  ({dt:.1f}s)", flush=True)
    save_params(args.ckpt_out, jax.device_get(trainer.params))
    print(f"saved {args.ckpt_out} after {trainer.step_count} steps")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
