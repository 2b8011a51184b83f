#!/usr/bin/env python
"""Weak-scaling measurement of the distributed merge-path CsrMV.

Weak scaling: the matrix grows with the mesh (rows ∝ S, constant nnz/row),
so per-shard work is constant; the metric is nnz/s per shard at S vs the
S=1 baseline (north-star target: ≥85 % efficiency at multi-host scale).

On this environment the mesh is 8 virtual CPU devices
(xla_force_host_platform_device_count) — collective PATHS are real
(ppermute halo exchange + psum_scatter carries), but device compute shares
the host's single core AND its caches: at S=8 the working set is 8x the
S=1 run, so S*T1/TS conflates cache-capacity effects with framework
overhead.  To isolate the overhead the framework actually adds, each S
also times a LOCAL-ONLY variant — the identical shard_map local compute
with every collective (halo ppermutes, carry psum_scatter) removed — on
the same mesh and arrays.  ``collective_overhead_efficiency`` =
T_local_only / T_full is the number item the north star targets (>=0.85
means collectives+carries cost <=15 % of a step).  A second control,
``fixed_total_work_efficiency``, partitions ONE constant matrix over S
shards (total bytes/FLOPs identical at every S) — on a serializing
1-core host T_1/T_S then has no working-set confound and directly
reads out shard padding + collective + dispatch overhead.  Both the
raw numbers and the host core count are recorded.
Writes WEAKSCALING.json.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_multichip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_ms(step, args0, n=12, reps=3):
    import numpy as np

    out = step(*args0)
    _ = np.asarray(out[0][:1])
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        o = args0
        acc = None
        for _ in range(n):
            acc = step(*o)
        _ = np.asarray(acc[0][:1])
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = step(*args0)
        _ = np.asarray(acc[0][:1])
        one = time.perf_counter() - t0
        best = min(best, (dt - one) / (n - 1))
    return max(best, 1e-9) * 1e3


def main():
    import numpy as np
    import jax

    if len(jax.devices()) < 8:
        # site hooks may pre-initialize another backend; rebuild a
        # virtual CPU mesh (same dance as __graft_entry__.py)
        from jax.extend.backend import clear_backends
        jax.config.update("jax_platforms", "cpu")
        clear_backends()
        jax.config.update("jax_num_cpu_devices", 8)
        assert len(jax.devices()) == 8, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from merge_spmv_tpu.formats.coo import CooMatrix
    from merge_spmv_tpu.formats.csr import CsrMatrix
    from merge_spmv_tpu.parallel.distributed import (distributed_csrmv_fn,
                                                     materialize_y)
    from merge_spmv_tpu.parallel.partition import partition_csr
    from merge_spmv_tpu.utils.compare import compare_results

    rows_per_shard = 1 << 17          # 131072 rows/shard
    deg = 8
    rs = np.random.RandomState(0)

    results = {}
    for S in (1, 2, 4, 8):
        if len(jax.devices()) < S:
            print(f"skip S={S}: only {len(jax.devices())} devices")
            continue
        n = rows_per_shard * S
        rows = np.repeat(np.arange(n, dtype=np.int64), deg)
        cols = np.clip(rows + rs.randint(-2000, 2001, rows.size), 0, n - 1)
        csr = CsrMatrix.from_coo(CooMatrix(
            n, n, rows, cols, rs.uniform(0.1, 1.0, rows.size))
        ).astype(np.float32)
        x = rs.uniform(0.1, 1.0, n).astype(np.float32)

        mesh = Mesh(np.array(jax.devices()[:S]), ("shards",))
        part = partition_csr(csr, S, dtype=np.float32)
        arrays = part.to_device_sharded(mesh)
        if part.x_mode == "halo":
            xr = jax.device_put(jnp.asarray(part.shard_x(x)),
                                NamedSharding(mesh, P("shards")))
        else:
            xr = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
        fn = distributed_csrmv_fn(mesh, part, local_backend="xla")

        yw = fn(*arrays, xr)
        y = materialize_y(yw, part)
        ok = compare_results(y, csr.spmv_gold(x), verbose=False) is None

        ms = chained_ms(lambda *a: fn(*a), (*arrays, xr))

        # local-only control: same shard_map local compute, collectives
        # stripped (not a correct SpMV — purely the compute baseline the
        # collective overhead is measured against)
        from merge_spmv_tpu.parallel.distributed import _local_csrmv_xla
        H = part.halo
        halo_mode = part.x_mode == "halo"

        def body_local(values, cols_, rowends, meta, xs):
            xl = (jnp.pad(xs[0], (H, H)) if halo_mode else xs)
            return _local_csrmv_xla(values[0], cols_[0], rowends[0], xl,
                                    part.nnz_max)[None]

        f_local = jax.jit(jax.shard_map(
            body_local, mesh=mesh,
            in_specs=(P("shards"),) * 4
            + (P("shards") if halo_mode else P(),),
            out_specs=P("shards"), check_vma=False))
        ms_local = chained_ms(lambda *a: f_local(*a), (*arrays, xr))

        nnz_per_s = csr.num_nonzeros / (ms / 1e3)
        results[S] = {
            "rows": n, "nnz": csr.num_nonzeros, "x_mode": part.x_mode,
            "halo": part.halo, "verified": ok, "avg_ms": round(ms, 3),
            "local_only_ms": round(ms_local, 3),
            "nnz_per_s_per_shard": round(nnz_per_s / S / 1e6, 2),
        }
        print(f"S={S}: {ms:8.2f} ms (local-only {ms_local:8.2f})  "
              f"{nnz_per_s/S/1e6:7.1f} Mnnz/s/shard  "
              f"x_mode={part.x_mode} verified={ok}", flush=True)

    # fixed-total-work control (strong scaling): ONE constant matrix (the
    # S=8 weak-scaling size) partitioned over S shards.  Total bytes and
    # FLOPs are identical at every S, so on a serializing 1-core host
    # T_1/T_S has no working-set confound — what remains IS the framework
    # overhead (shard padding, halo ppermutes, carry psum_scatter,
    # shard_map dispatch), the quantity the >=85 % north star targets.
    fixed = {}
    n_f = rows_per_shard * 8
    rows_f = np.repeat(np.arange(n_f, dtype=np.int64), deg)
    cols_f = np.clip(rows_f + rs.randint(-2000, 2001, rows_f.size),
                     0, n_f - 1)
    csr_f = CsrMatrix.from_coo(CooMatrix(
        n_f, n_f, rows_f, cols_f, rs.uniform(0.1, 1.0, rows_f.size))
    ).astype(np.float32)
    x_f = rs.uniform(0.1, 1.0, n_f).astype(np.float32)
    gold_f = csr_f.spmv_gold(x_f)
    for S in (1, 2, 4, 8):
        if len(jax.devices()) < S:
            continue
        mesh = Mesh(np.array(jax.devices()[:S]), ("shards",))
        part = partition_csr(csr_f, S, dtype=np.float32)
        arrays = part.to_device_sharded(mesh)
        if part.x_mode == "halo":
            xr = jax.device_put(jnp.asarray(part.shard_x(x_f)),
                                NamedSharding(mesh, P("shards")))
        else:
            xr = jax.device_put(jnp.asarray(x_f), NamedSharding(mesh, P()))
        fn = distributed_csrmv_fn(mesh, part, local_backend="xla")
        y = materialize_y(fn(*arrays, xr), part)
        ok = compare_results(y, gold_f, verbose=False) is None
        ms = chained_ms(lambda *a: fn(*a), (*arrays, xr))
        fixed[S] = {"avg_ms": round(ms, 3), "verified": ok,
                    "x_mode": part.x_mode}
        print(f"fixed-total S={S}: {ms:8.2f} ms verified={ok}", flush=True)
    fixed_eff = {}
    if 1 in fixed:
        for S, r in fixed.items():
            fixed_eff[S] = round(fixed[1]["avg_ms"] / r["avg_ms"], 3)

    # prepared-vs-unprepared call path (VERDICT r3 item 8a).  On this CPU
    # sim mesh both paths run the same xla local compute (the pallas local
    # kernel is TPU-only; interpret mode would measure the interpreter),
    # so the measurable difference is exactly what prepare hoists out of
    # the per-call path: x shard/halo assembly on host + device_put.
    # prepared_step_ms = the pure device step (prebuilt fn, placed
    # arrays, placed x); unprepared_call_ms adds the per-call x handling
    # the unprepared path re-does; prepare_setup_s = partition +
    # placement + fn-build wall clock.
    prepared = {}
    for S in (2, 4, 8):
        if len(jax.devices()) < S:
            continue
        t0 = time.perf_counter()
        mesh = Mesh(np.array(jax.devices()[:S]), ("shards",))
        part = partition_csr(csr_f, S, dtype=np.float32)
        arrays = part.to_device_sharded(mesh)
        fn = distributed_csrmv_fn(mesh, part, local_backend="xla")
        if part.x_mode == "halo":
            xr = jax.device_put(jnp.asarray(part.shard_x(x_f)),
                                NamedSharding(mesh, P("shards")))
        else:
            xr = jax.device_put(jnp.asarray(x_f), NamedSharding(mesh, P()))
        y = materialize_y(fn(*arrays, xr), part)
        setup_s = time.perf_counter() - t0
        ok = compare_results(y, gold_f, verbose=False) is None
        ms_step = chained_ms(lambda *a: fn(*a), (*arrays, xr))

        def call_unprep():
            if part.x_mode == "halo":
                xi = jax.device_put(jnp.asarray(part.shard_x(x_f)),
                                    NamedSharding(mesh, P("shards")))
            else:
                xi = jax.device_put(jnp.asarray(x_f),
                                    NamedSharding(mesh, P()))
            return fn(*arrays, xi)

        jax.block_until_ready(call_unprep())
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(call_unprep())
            best = min(best, time.perf_counter() - t0)
        prepared[S] = {
            "prepared_step_ms": round(ms_step, 3),
            "unprepared_call_ms": round(best * 1e3, 3),
            "prepare_setup_s": round(setup_s, 2),
            "verified": ok,
        }
        print(f"prepared S={S}: step {ms_step:.2f} ms, unprepared call "
              f"{best*1e3:.2f} ms, setup {setup_s:.1f} s", flush=True)


    base = results.get(1, {}).get("nnz_per_s_per_shard")
    base_ms = results.get(1, {}).get("avg_ms")
    eff = {}
    eff_total = {}
    eff_coll = {}
    if base:
        for S, r in results.items():
            eff[S] = round(r["nnz_per_s_per_shard"] / base, 3)
            # on a host with fewer cores than shards, devices serialize;
            # (S x S=1 time) / measured time — but at S>1 the working set
            # is S x larger than S=1's, so this still conflates host
            # cache capacity with framework overhead (see module doc)
            eff_total[S] = round(S * base_ms / r["avg_ms"], 3)
            # the isolating control: identical mesh, arrays and local
            # compute with collectives stripped
            eff_coll[S] = round(min(r["local_only_ms"] / r["avg_ms"],
                                    1.0), 3)
    out = {
        "metric": "weak_scaling_nnz_per_s_per_shard",
        "rows_per_shard": rows_per_shard,
        "host_cpus": os.cpu_count(),
        "platform": jax.default_backend(),
        "results": results,
        "efficiency_vs_S1": eff,
        "serialized_total_work_efficiency": eff_total,
        "collective_overhead_efficiency": eff_coll,
        "fixed_total_work": fixed,
        "prepared_vs_unprepared": prepared,
        "fixed_total_work_efficiency": fixed_eff,
        "note": ("host_cpus < shards: virtual devices share the core AND "
                 "its caches, and S>1 runs an S-times-larger working set "
                 "than S=1 — both serialized metrics fold those host "
                 "effects in.  collective_overhead_efficiency is the "
                 "isolating control (same mesh/arrays, collectives "
                 "stripped): the fraction of a full step NOT spent on "
                 "halo exchange + carry reduce-scatter.  "
                 "fixed_total_work_efficiency is the confound-free "
                 "serialized metric: one constant matrix partitioned "
                 "over S shards, T_1/T_S"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "WEAKSCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1); f.write("\n")
    print(json.dumps({"weak_scaling_efficiency": eff}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
