#!/usr/bin/env python
"""Corpus sweep: run the benchmark CLI over every .mtx in a directory.

Analog of eval_csrmv.sh (eval_csrmv.sh:8-17): CSV header, then one
``spmv_cli --quiet --mtx=<f>`` subprocess per dataset — one process per
matrix gives crash isolation by construction, exactly like the reference
sweep.

    python tools/eval_corpus.py <mtx-dir> [--fp64] [--out results.csv]
"""

import argparse
import glob
import os
import subprocess
import sys

HEADER = ("dataset, num_rows, num_cols, num_nonzeros, row_length_mean, "
          "row_length_std_dev, row_length_variation, row_length_skewness, "
          "backend, setup_ms, avg_ms, gflops, effective_GBs")


def device_ready(timeout: int = 120) -> bool:
    """Preflight: can a fresh process see the accelerator?

    The relayed device can be down for stretches (minutes to hours); a
    sweep row started during an outage burns its full per-matrix timeout
    and records a spurious TIMEOUT (the round-2 corpus artifact's
    probe_array/probe_skew rows).  This probes in a subprocess (a hung
    in-process client would poison the parent) before each row."""
    code = ("import jax; d=jax.devices(); "
            "raise SystemExit(0 if d else 1)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    from merge_spmv_tpu.utils.hostmem import enable_warm_heap
    enable_warm_heap()   # warm-page reuse for plan-time numpy
    ap = argparse.ArgumentParser()
    ap.add_argument("mtx_dir")
    ap.add_argument("--fp64", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--backends", default="merge")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--tile-items", type=int, default=0, dest="tile_items")
    ap.add_argument("--wait-device", type=int, default=3600,
                    help="max seconds to wait for the device to come "
                         "back before a row (0 disables the preflight)")
    args = ap.parse_args(argv)

    files = sorted(glob.glob(os.path.join(args.mtx_dir, "*.mtx")))
    if not files:
        print(f"no .mtx files under {args.mtx_dir}", file=sys.stderr)
        return 1
    # stable shuffle (hash of the name): alphabetical order front-loads
    # whole generator families, so an interrupted sweep would cover one
    # corner of the CoV/size/locality space instead of a cross-section
    import hashlib
    files.sort(key=lambda p: hashlib.md5(
        os.path.basename(p).encode()).hexdigest())

    done = set()
    if args.out and os.path.exists(args.out):
        # resume: keep completed rows (remote compiles can be minutes per
        # shape class; a crash mid-sweep must not discard finished work)
        for line in open(args.out):
            name = line.split(",")[0].strip()
            if name and name != "dataset" and "TIMEOUT" not in line \
                    and "ERROR" not in line:
                done.add(name)
    out = open(args.out, "a" if done else "w") if args.out else sys.stdout
    if not done:
        print(HEADER, file=out, flush=True)
    cli = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spmv_cli.py")
    for path in files:
        name = os.path.splitext(os.path.basename(path))[0]
        if name in done:
            continue
        cmd = [sys.executable, cli, f"--mtx={path}", "--quiet",
               f"--backends={args.backends}"]
        if args.fp64:
            cmd.append("--fp64")
        if args.tile_items:
            # smaller tiles compile ~4x faster through the remote
            # service (the per-tile trace is BPT-unrolled); a corpus
            # sweep is compile-latency-bound per new shape family
            cmd.append(f"--tile-items={args.tile_items}")
        if args.wait_device:
            import time as _time
            waited = 0
            while not device_ready() and waited < args.wait_device:
                print(f"# device unreachable; waiting ({waited}s)",
                      file=sys.stderr, flush=True)
                _time.sleep(60)
                waited += 180
        status = None
        for attempt in range(2):
            # one retry: remote-tunnel runs are ~5-10 % flaky (device
            # lock handoff / compile service hiccups), independent of
            # the matrix
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=args.timeout)
                line = (r.stdout.strip().splitlines()[-1]
                        if r.stdout.strip() else "")
                status = (line if r.returncode == 0
                          else f"ERROR rc={r.returncode}")
                if r.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                status = "TIMEOUT"
                break   # a timeout is the matrix, not tunnel flake —
                        # retrying doubles the burn
        print(f"{name}, {status}", file=out, flush=True)
    if args.out:
        out.close()
        # corpus-scale acceptance statistics (paper Fig. 9 analogs):
        # skew correlation + runtime-vs-nnz linearity over the sweep
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import corpus_stats
            corpus_stats.main([args.out])
        except Exception as e:  # noqa: BLE001
            print(f"# corpus_stats failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
