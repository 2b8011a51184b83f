#!/usr/bin/env python
"""Consistency statistics over a corpus sweep CSV — the paper's acceptance
criteria (SC'16 Fig. 9) computed from tools/eval_corpus.py output.

The reference's corpus-scale evidence is two correlations over the UF
sweep (SURVEY.md section 6, paper Fig. 9):

  * GFLOP/s vs row-length CoV — skew invariance.  Closer to 0 is better:
    GPU merge -0.01, CPU merge -0.07 (vs cuSPARSE -0.24, MKL -0.16).
  * runtime vs nnz — bandwidth-bound linearity.  Closer to 1 is better:
    CPU merge 0.97, GPU merge 0.87 (vs cuSPARSE 0.30).

Usage:
    python tools/corpus_stats.py [csv ...]   (default: the TPU sweep CSV)

Writes CORPUS_STATS.json next to the CSV when given exactly one input.
Rows with missing timings (TIMEOUT / ERROR / below_resolution) are
reported but excluded from the correlations, as the reference sweep
excludes trivial datasets (eval_csrmv.sh / cpu_spmv.cpp:556-560).
"""

import json
import math
import os
import sys


def pearson(xs, ys):
    n = len(xs)
    if n < 3:
        return None
    mx = sum(xs) / n
    my = sum(ys) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    sxx = sum((a - mx) ** 2 for a in xs)
    syy = sum((b - my) ** 2 for b in ys)
    if sxx <= 0 or syy <= 0:
        return None
    return sxy / math.sqrt(sxx * syy)


MIN_NNZ = 10_000
"""Rows below this are format/parser probes, not perf rows: a matrix
with a few dozen nonzeros times at the per-step launch floor (~3 us)
regardless of nnz, so including it in the runtime-vs-nnz Pearson only
measures the floor.  The reference sweep likewise excludes trivial
datasets (cpu_spmv.cpp:556-560)."""


def load_rows(path, backend_pref=("Merge CsrMV (pallas)", "XLA CsrMV")):
    """Parse eval_corpus rows: 9 leading fields (name, path, rows, cols,
    nnz, mean, std, cov, skewness) then repeating 5-field backend groups
    (display_name, setup_ms, avg_ms, gflops, effective_GBs).  Prefers the
    merge backend's group.  Sub-MIN_NNZ probes are skipped (reason
    'trivial')."""
    rows = []
    skipped = []
    with open(path) as f:
        for line in f:
            parts = [p.strip() for p in line.strip().split(",")]
            if len(parts) < 9 or not parts[0] or parts[0] == "dataset":
                continue
            name = parts[0]
            if any(tok in line for tok in ("TIMEOUT", "ERROR",
                                           "below_resolution")):
                skipped.append((name, "no timing"))
                continue
            try:
                nnz = float(parts[4])
                cov = float(parts[7])
            except ValueError:
                skipped.append((name, "bad stats"))
                continue
            if nnz < MIN_NNZ:
                skipped.append((name, "trivial"))
                continue
            groups = {}
            i = 9
            while i + 4 < len(parts):
                try:
                    groups[parts[i]] = (float(parts[i + 1]),
                                        float(parts[i + 2]),
                                        float(parts[i + 3]),
                                        float(parts[i + 4]))
                except ValueError:
                    pass
                i += 5
            grp = next((groups[b] for b in backend_pref if b in groups),
                       None)
            if grp is None:
                skipped.append((name, "no backend group"))
                continue
            rows.append({"dataset": name, "num_nonzeros": nnz,
                         "row_length_variation": cov,
                         "avg_ms": grp[1], "gflops": grp[2]})
    return rows, skipped


def main(argv=None):
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "merge_spmv_tpu", "bench",
        "results_corpus_tpu.csv")
    paths = (sys.argv[1:] if argv is None else argv) or [default]
    out = {}
    for path in paths:
        rows, skipped = load_rows(path)
        r_skew = pearson([r["row_length_variation"] for r in rows],
                         [r["gflops"] for r in rows])
        r_lin = pearson([r["num_nonzeros"] for r in rows],
                        [r["avg_ms"] for r in rows])
        # auxiliary: log-space linearity.  The raw Pearson (the paper's
        # anchor metric) is dominated by the worst few rows when the
        # per-nnz rate spans orders of magnitude (this corpus includes
        # global-scatter adversaries at ~650x the banded per-nnz rate —
        # a spread the K40 never exhibited); the log-log correlation
        # reads size-scaling across ALL classes on equal footing.
        r_log = pearson([math.log(r["num_nonzeros"]) for r in rows
                         if r["avg_ms"] > 0],
                        [math.log(r["avg_ms"]) for r in rows
                         if r["avg_ms"] > 0])
        rec = {
            "rows_used": len(rows),
            "rows_skipped": [s[0] for s in skipped],
            "corr_gflops_vs_row_cov": (None if r_skew is None
                                       else round(r_skew, 3)),
            "corr_runtime_vs_nnz": (None if r_lin is None
                                    else round(r_lin, 3)),
            "corr_log_runtime_vs_log_nnz": (None if r_log is None
                                            else round(r_log, 3)),
            "reference": {"gpu_merge_skew": -0.01, "cpu_merge_skew": -0.07,
                          "cusparse_skew": -0.24,
                          "cpu_merge_linearity": 0.97,
                          "gpu_merge_linearity": 0.87,
                          "cusparse_linearity": 0.30},
        }
        out[os.path.basename(path)] = rec
        print(f"{path}: n={rec['rows_used']} "
              f"skew_corr={rec['corr_gflops_vs_row_cov']} "
              f"linearity={rec['corr_runtime_vs_nnz']} "
              f"log_linearity={rec['corr_log_runtime_vs_log_nnz']} "
              f"skipped={rec['rows_skipped']}")
    if len(paths) == 1:
        dst = os.path.join(os.path.dirname(os.path.abspath(paths[0])),
                           "CORPUS_STATS.json")
        with open(dst, "w") as f:
            json.dump(out, f, indent=1); f.write("\n")
        print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
