#!/usr/bin/env python
"""Measured per-op-class VPU throughput ceilings on the real chip.

The gather serve in the merge kernel is an instruction-mix problem: each
1024-nonzero block needs K window visits, and each visit is a small fixed
bundle of vector ops (dynamic sublane fetch + broadcast + lane gather +
compare + select).  To state an honest hardware bound ("no instruction
mix can run the general gather faster than X"), this probe measures the
sustained per-(8,128)-regop rate of each op class in isolation, with
enough independent chains that the VLIW scheduler is throughput- (not
latency-) limited:

  fma      — independent multiply-adds on registers (the ALU ceiling)
  select   — jnp.where against a broadcast compare (mask+select bundle)
  gather   — take_along_axis(axis=1) lane gathers (the serve primitive)
  dynfetch — 1-sublane VMEM reads at data-dependent sublane indices
             (the per-visit window fetch)
  statfetch— 1-sublane VMEM reads at static indices (stage-mode serve)

Each kernel runs GRID steps x UNROLL independent ops on (8,128) f32
registers; timing is the in-graph chain (utils/timers.ingraph_rate_ms)
so tunnel dispatch jitter cancels.  Output: regops/cycle-equivalent at
the nominal 940 MHz v5e clock plus raw ns/regop, written to
VPU_CEILING.json for the PERF_PROBE bound paragraph.

Usage: PYTHONPATH=. python tools/vpu_ceiling.py [classes]
"""

import functools
import json
import os
import sys
import time

GRID = 4096          # sequential grid steps per kernel launch
UNROLL = 64          # independent (8,128) regops per step per chain
CHAINS = 8           # independent accumulator chains (ILP)
TABLE_ROWS = 4096    # VMEM table height for the fetch classes


def build_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def wrap(body, n_ops_per_step):
        """pallas_call over a sequential grid; body(t, table_s, accs)."""

        def kernel(x_ref, o_ref, table_s, acc_s):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                table_s[...] = jnp.tile(
                    x_ref[0:8, :], (TABLE_ROWS // 8, 1)) * 1e-9
                acc_s[...] = jnp.zeros((CHAINS, 8, 128), jnp.float32)

            accs = [acc_s[c] for c in range(CHAINS)]
            accs = body(t, table_s, accs)
            for c in range(CHAINS):
                acc_s[c] = accs[c]

            @pl.when(t == GRID - 1)
            def _():
                o_ref[...] = sum(acc_s[c] for c in range(CHAINS))

        def fn(x):
            return pl.pallas_call(
                kernel,
                grid=(GRID,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((TABLE_ROWS, 128), jnp.float32),
                    pltpu.VMEM((CHAINS, 8, 128), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(x)

        return jax.jit(fn), n_ops_per_step

    kernels = {}

    # --- fma: UNROLL independent a*b+c per chain ----------------------- #
    def fma_body(t, table_s, accs):
        b = table_s[0:8, :] + 1.0
        out = []
        for c, acc in enumerate(accs):
            for _ in range(UNROLL):
                acc = acc * 0.999999 + b
            out.append(acc)
        return out

    kernels["fma"] = wrap(fma_body, UNROLL * CHAINS)

    # --- select: compare + where against rotating int patterns --------- #
    def select_body(t, table_s, accs):
        import jax.numpy as jnp
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        b = table_s[0:8, :]
        out = []
        for c, acc in enumerate(accs):
            for u in range(UNROLL):
                acc = jnp.where(ii == ((t + u + c) & 127), b, acc)
            out.append(acc)
        return out

    kernels["select"] = wrap(select_body, UNROLL * CHAINS)

    # --- gather: take_along_axis lane gathers -------------------------- #
    from merge_spmv_tpu.ops.csrmv_pallas import _gather_lanes

    def gather_body(t, table_s, accs):
        import jax.numpy as jnp
        ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        idx = (ii * 7 + t) & 127
        out = []
        for c, acc in enumerate(accs):
            g = acc
            for _ in range(UNROLL):
                g = _gather_lanes(g + 1.0, idx)   # +1 keeps the chain live
            out.append(g)
        return out

    # each iteration = 1 gather + 1 add
    kernels["gather"] = wrap(gather_body, UNROLL * CHAINS * 2)

    # --- dynfetch: data-dependent single-sublane VMEM reads ------------ #
    def dynfetch_body(t, table_s, accs):
        import jax.numpy as jnp
        out = []
        for c, acc in enumerate(accs):
            for u in range(UNROLL):
                # index depends on grid step (not hoistable/CSE-able)
                i = (t * 37 + u * 11 + c) % (TABLE_ROWS - 8)
                row = table_s[pl.ds(i, 1), :]
                acc = acc + jnp.broadcast_to(row, (8, 128))
            out.append(acc)
        return out

    # each iteration = 1 dynamic fetch + broadcast + 1 add
    kernels["dynfetch"] = wrap(dynfetch_body, UNROLL * CHAINS)

    # --- statfetch: same reads at static indices ----------------------- #
    def statfetch_body(t, table_s, accs):
        import jax.numpy as jnp
        out = []
        for c, acc in enumerate(accs):
            for u in range(UNROLL):
                i = (u * 11 + c * 7) % (TABLE_ROWS - 8)
                row = table_s[i:i + 1, :]
                acc = acc + jnp.broadcast_to(row, (8, 128))
            out.append(acc)
        return out

    kernels["statfetch"] = wrap(statfetch_body, UNROLL * CHAINS)

    return kernels


def main():
    import jax
    import jax.numpy as jnp

    from merge_spmv_tpu.utils.timers import ingraph_rate_ms

    which = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    kernels = build_kernels()
    out = {"grid": GRID, "unroll": UNROLL, "chains": CHAINS,
           "clock_mhz_assumed": 940,
           "device": jax.devices()[0].device_kind}
    for name, (fn, ops_per_step) in kernels.items():
        if which and name not in which:
            continue
        x = jnp.ones((8, 128), jnp.float32)

        def step(xc, fn=fn):
            return xc + fn(xc) * 1e-20

        t0 = time.time()
        ms = ingraph_rate_ms(jax.jit(step), x, steps=16)
        total_ops = GRID * ops_per_step
        ns_per_op = ms * 1e6 / total_ops
        ops_per_cycle = 1.0 / (ns_per_op * 0.94)
        out[name] = {"ms_per_launch": round(ms, 4),
                     "ns_per_regop": round(ns_per_op, 3),
                     "regops_per_cycle_at_940mhz": round(ops_per_cycle, 3)}
        print(f"{name:>10}: {ms:8.3f} ms/launch  {ns_per_op:7.3f} ns/regop  "
              f"{ops_per_cycle:5.2f} regops/cyc  (wall {time.time()-t0:.0f}s)",
              flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "VPU_CEILING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    # the kernels close over pl via build_kernels' imports
    from jax.experimental import pallas as pl  # noqa: F401
    main()
