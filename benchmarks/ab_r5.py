"""Round-5 TPU A/B runner (VERDICT r4 items 2-4): close the interrupted
round-4 queue and decide the round-5 defaults from data.

Decisions measured (each as env-gated on/off bench.py subprocess runs):
  * multi-frame structure — the new sequential lax.scan over times
    (RRIN_MF_SEQ=1, default) vs the round-4 maximal-batch forward
    (RRIN_MF_SEQ=0), crossed with flow-UNet sharing (RRIN_SHARE_FLOWS),
    at 720p and 1080p exp2 int8. Reconciles AB_R4's contradictory
    mf_share rows (share-ON measured 2.8x SLOWER under the batched
    structure) and targets VERDICT r4 #3's ">=30 mid-fps at 720p" bar.
  * RRIN_PLANAR_BLEND — planar Pallas warp outputs + planar blend (skips
    the kernels' output transposes; bit-identical per
    tests/test_warp_pallas) vs NHWC, 1080p int8 + bf16.
  * RRIN_ENTRY_GROUPS — <=4-operand entry concats (default ON since
    round 4, shipped without a row — ADVICE r4) vs per-tensor operands,
    1080p int8 + bf16. Equivalence pinned by tests/test_entry_groups.py.

Every run is a fresh subprocess (env gates are read at import), each
crash-proofed by bench.py's one-JSON-line contract plus a subprocess
timeout here. Results append to benchmarks/AB_R5.json after EVERY run.

Usage (on TPU):  python benchmarks/ab_r5.py [--only name1,name2] [--list]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from ab_r4 import probe, run_one  # noqa: E402

OUT = os.path.join(HERE, "AB_R5.json")

# name -> (bench args, env overrides, timeout_s)
RUNS = [
    # -- tunnel health + on-device kernel parity gate ---------------------
    ("selfcheck", ["--selfcheck-only"], {}, 2400),
    # -- defaults anchor (entry-groups ON, planar OFF, warp-u8 ON): the
    #    round-5 headline candidates, and the ON cells of both glue A/Bs.
    ("default_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {}, 2400),
    ("default_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"], {}, 2400),
    # -- entry-groups decision (ADVICE r4: default flipped ON in round 4
    #    with no committed row) --
    ("entry_off_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_ENTRY_GROUPS": "0"}, 2400),
    ("entry_off_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_ENTRY_GROUPS": "0"}, 2400),
    # -- planar-blend decision (queued since round 4; default OFF) --
    ("planar_on_1080p_int8",
     ["--size", "1080p", "--iters", "30", "--int8", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "1"}, 2400),
    ("planar_on_1080p_bf16",
     ["--size", "1080p", "--iters", "30", "--skip-extras"],
     {"RRIN_PLANAR_BLEND": "1"}, 2400),
    # -- multi-frame structure: sequential scan (new default) vs legacy
    #    maximal-batch, x flow sharing, 720p exp2 int8 ------------------
    ("mf_seq_share_720p_exp2_int8",
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {}, 2400),
    ("mf_seq_noshare_720p_exp2_int8",
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {"RRIN_SHARE_FLOWS": "0"}, 2400),
    ("mf_batch_noshare_720p_exp2_int8",  # AB_R4's 8.23 mid-fps row
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {"RRIN_MF_SEQ": "0", "RRIN_SHARE_FLOWS": "0"}, 2400),
    ("mf_batch_share_720p_exp2_int8",    # AB_R4's 2.956 mid-fps row
     ["--size", "720p", "--iters", "15", "--exp", "2", "--int8"],
     {"RRIN_MF_SEQ": "0"}, 2400),
    # -- multi-frame at 1080p (BASELINE config 4 class) ------------------
    ("mf_seq_share_1080p_exp2_int8",
     ["--size", "1080p", "--iters", "12", "--exp", "2", "--int8"],
     {}, 2400),
    ("mf_batch_noshare_1080p_exp2_int8",
     ["--size", "1080p", "--iters", "12", "--exp", "2", "--int8"],
     {"RRIN_MF_SEQ": "0", "RRIN_SHARE_FLOWS": "0"}, 2400),
]


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

    # First device contact from a fresh process takes ~2.5 min over the
    # tunnel; the round-4 default (240 s) aborted a healthy queue.
    if not probe(timeout=600):
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
        # Transient UNAVAILABLE blips between subprocesses are common
        # (observed 2026-08-21: a probe failed fast while the very next
        # fresh-process probe succeeded) — only stop after two misses.
        if not (probe(timeout=600) or probe(timeout=600)):
            print("tunnel died after this run — stopping", file=sys.stderr)
            return 3
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
