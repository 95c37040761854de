"""Round-4 TPU A/B runner (VERDICT r3 item 1): the three decision gates
that were queued behind the 2026-08-17/18 tunnel outage, measured in one
batch and recorded crash-safely.

Decisions measured (each as env-gated on/off bench.py subprocess runs):
  * RRIN_WARP_U8      — byte-packed u8 warp variant (1 gather/tap) vs the
                        channel-paired bf16 variant, at 1080p/720p/vimeo,
                        int8 + bf16 (warp runs on both serving paths).
  * RRIN_DENSE_ENTRY  — P=8/C=16 entry pack on/off, isolated, 1080p.
  * RRIN_BF16_M0_MAX  — 4K bf16 packed kernels (scoped-VMEM bound) vs the
                        plain-path fallback, plus the 4K int8 anchor row.

Every run is a fresh subprocess (env gates are read at import), each
crash-proofed by bench.py's one-JSON-line contract plus a subprocess
timeout here. Results append to benchmarks/AB_R4.json after EVERY run,
so a mid-batch tunnel death keeps everything measured so far.

Usage (on TPU):  python benchmarks/ab_r4.py [--only name1,name2] [--list]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(HERE, "AB_R4.json")

# name -> (bench args, env overrides, timeout_s)
RUNS = [
    # -- selfcheck first: doubles as the tunnel health gate, and records
    #    the on-device parity of all three warp variants before any
    #    default-flip decision trusts them.
    ("selfcheck", ["--selfcheck-only"], {}, 2400),
    # -- warp-u8 decision ------------------------------------------------
    ("warp_base_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {}, 2400),
    ("warp_u8_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_WARP_U8": "1"}, 2400),
    ("warp_base_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"], {}, 2400),
    ("warp_u8_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_WARP_U8": "1"}, 2400),
    ("warp_base_720p_int8",
     ["--size", "720p", "--iters", "30", "--int8", "--skip-extras"],
     {}, 2400),
    ("warp_u8_720p_int8",
     ["--size", "720p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_WARP_U8": "1"}, 2400),
    ("warp_base_vimeo_int8",
     ["--size", "vimeo", "--iters", "40", "--batch", "8", "--int8",
      "--skip-extras"], {}, 2400),
    ("warp_u8_vimeo_int8",
     ["--size", "vimeo", "--iters", "40", "--batch", "8", "--int8",
      "--skip-extras"], {"RRIN_WARP_U8": "1"}, 2400),
    # -- dense-entry decision (isolated on/off; VERDICT r3 weak #1) ------
    ("dense_off_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_DENSE_ENTRY": "0"}, 2400),
    ("dense_off_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_DENSE_ENTRY": "0"}, 2400),
    # -- 4K bf16 wide decision + int8 anchor ------------------------------
    ("4k_int8_base",
     ["--size", "4k", "--iters", "15", "--int8", "--skip-extras"],
     {}, 3600),
    ("4k_bf16_plain_fallback",
     ["--size", "4k", "--iters", "8", "--skip-extras"], {}, 3600),
    ("4k_bf16_packed_wide",
     ["--size", "4k", "--iters", "8", "--skip-extras"],
     {"RRIN_BF16_M0_MAX": "1000"}, 3600),
    # -- planar-blend glue (round-4 addition; RRIN_PLANAR_BLEND skips the
    #    Pallas warps' planar->NHWC output transposes and runs the blend
    #    in planes — pure layout, bit-identical; tests/test_warp_pallas
    #    TestPlanarOut) --
    ("planar_off_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "0"}, 2400),
    ("planar_on_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "1"}, 2400),
    ("planar_off_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "0"}, 2400),
    ("planar_on_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "1"}, 2400),
    # -- multi-frame flow-UNet sharing (round-4 addition; the shared
    #    flow U-Net of pipeline._run_times vs recomputing it per time) --
    ("mf_share_off_720p_exp2_int8",
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {"RRIN_SHARE_FLOWS": "0"}, 2400),
    ("mf_share_on_720p_exp2_int8",
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {}, 2400),
    ("mf_share_off_1080p_exp2_int8",
     ["--size", "1080p", "--iters", "12", "--exp", "2", "--int8"],
     {"RRIN_SHARE_FLOWS": "0"}, 2400),
    ("mf_share_on_1080p_exp2_int8",
     ["--size", "1080p", "--iters", "12", "--exp", "2", "--int8"],
     {}, 2400),
]


def probe(timeout=240) -> bool:
    """Tiny device computation; False if the tunnel is wedged."""
    code = ("import jax, jax.numpy as jnp\n"
            "x = jnp.ones((8,128))\n"
            "assert float((x@x.T).sum()) == 8*8*128\n"
            "print('ok')\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def run_one(name, args, env_over, timeout_s):
    env = dict(os.environ)
    env.update(env_over)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), *args,
           "--watchdog", str(int(timeout_s))]
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s + 120, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"name": name, "env": env_over, "error": "timeout",
                "wall_s": round(time.perf_counter() - t0, 1)}
    row = None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            row = json.loads(line)
            break
        except ValueError:
            continue
    return {"name": name, "env": env_over, "args": args, "result": row,
            "rc": r.returncode,
            "stderr_tail": r.stderr.strip()[-400:] if row is None else None,
            "wall_s": round(time.perf_counter() - t0, 1)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated run names (default: all)")
    p.add_argument("--list", action="store_true")
    a = p.parse_args()
    if a.list:
        for name, *_ in RUNS:
            print(name)
        return 0
    sel = set(a.only.split(",")) if a.only else None

    report = {"generated": time.strftime("%Y-%m-%dT%H:%M:%S"), "runs": []}
    if os.path.exists(OUT) and sel is not None:
        with open(OUT) as f:  # merge re-runs into the existing artifact
            report = json.load(f)
        report["runs"] = [r for r in report["runs"]
                          if r["name"] not in sel]

    if not probe():
        print("TPU tunnel wedged — aborting before burning run budget",
              file=sys.stderr)
        return 2

    for name, args, env_over, timeout_s in RUNS:
        if sel is not None and name not in sel:
            continue
        print(f"=== {name} ...", flush=True)
        row = run_one(name, args, env_over, timeout_s)
        report["runs"].append(row)
        with open(OUT, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(row.get("result") or row, indent=None),
              flush=True)
        if not probe(timeout=300):
            print("tunnel died after this run — stopping", file=sys.stderr)
            return 3
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
