#!/usr/bin/env python
"""CsrMV benchmark CLI — flag-compatible analog of the reference drivers.

Usage (mirrors cpu_spmv.cpp:686-706 / gpu_spmv.cu:676-696):

    python spmv_cli.py --mtx=<matrix market file> [options]
    python spmv_cli.py --grid2d=<width> | --grid3d=<width> |
                       --wheel=<spokes> | --dense=<cols> |
                       --powerlaw=<n> | --uniform=<n>

Options:
    --fp32 (default) | --fp64        value dtype
    --alpha=<s> / --beta=<s>         y = alpha*A*x + beta*y_in
                                     (defaults 1.0 / 0.0; y_in = ones)
    --i=<timing iterations>          default: adaptive 16G-nnz rule
    --quiet                          CSV output for corpus sweeps
    --v / --v2                       verbose / dump matrix
    --backends=merge,xla,scipy,torch comma list (default scipy,xla,merge);
                                     "split" adds the banded-split
                                     stacked operator, "hotcold" the
                                     popularity hot/cold column split
                                     (both ops/split.py), "dia" the
                                     diagonal-structure split
                                     (ops/dia.py) — opt-in setup cost
                                     reported like HYB conversion
    --tile-items=<n>                 merge items per Pallas tile
    --gather-group=<n>               blocks per gather-group visit (>1:
                                     fetch-amortized union window lists)
    --gather-cluster                 cluster-gather mode: one 8-row fetch
                                     per contiguous window cluster,
                                     roll-served visits
    --split=<n>                      quantile band count for the split
                                     backend (flag alone: geometric 8,32)
    --autotune                       sweep the knob tuple once per shape
                                     class (persistent cache)
    --seed=<n>                       generator seed
"""

import sys


def parse_args(argv):
    """--key=value / --flag parsing (utils.h:280-445 semantics)."""
    args = {}
    for a in argv[1:]:
        if not a.startswith("--"):
            print(f"unrecognized argument: {a}", file=sys.stderr)
            sys.exit(2)
        body = a[2:]
        if "=" in body:
            k, v = body.split("=", 1)
            k = k.replace("-", "_")
            if k in ("mtx", "backends"):
                args[k] = v
            elif k in ("alpha", "beta"):
                args[k] = float(v)
            else:
                args[k] = int(v)
        else:
            args[body.replace("-", "_")] = True
    if "backends" in args:
        args["backends"] = args["backends"].split(",")
    if args.get("fp64"):
        args["fp32"] = False
    else:
        args.setdefault("fp32", True)
    if "i" in args and isinstance(args["i"], bool):
        del args["i"]
    return args


def main(argv=None):
    argv = argv if argv is not None else sys.argv
    args = parse_args(argv)
    if args.get("help"):
        print(__doc__)
        return 0
    from merge_spmv_tpu.bench.driver import run_benchmark
    run_benchmark(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
