"""(gather_group, tile_items) sweep on the grid3d100 headline (run on TPU).

Usage: python gt_sweep.py "G,T" "G,T" ...   (e.g. 1,131072 8,131072 8,196608)
"""
import sys, time, json, os
import numpy as np
sys.path.insert(0, "/root/repo")
from merge_spmv_tpu.utils.hostmem import enable_warm_heap
enable_warm_heap()
import jax, jax.numpy as jnp
from merge_spmv_tpu.formats.coo import CooMatrix
from merge_spmv_tpu.formats.csr import CsrMatrix
from merge_spmv_tpu.ops.operator import build_operator
from merge_spmv_tpu.utils.compare import compare_results
from merge_spmv_tpu.utils.timers import operator_step_fn, ingraph_rate_ms

t0 = time.time()
cache = "/tmp/grid3d100.npz"
if os.path.exists(cache):
    d = np.load(cache)
    csr = CsrMatrix(int(d["n"]), int(d["n"]), d["ro"], d["ci"], d["v"])
else:
    csr = CsrMatrix.from_coo(CooMatrix.grid3d(100)).astype(np.float32)
    np.savez(cache, n=csr.num_rows, ro=csr.row_offsets, ci=csr.col_indices,
             v=csr.values)
print(f"matrix ready {time.time()-t0:.0f}s", flush=True)
x = np.random.RandomState(1).uniform(0.1, 1.0, csr.num_cols).astype(np.float32)
gold = csr.spmv_gold(x)
xd = jnp.asarray(x)
total_bytes = csr.num_nonzeros * 12 + csr.num_rows * 8
out = {}
combos = []
argv = sys.argv[1:]
if os.path.exists("/tmp/gt_combos.txt"):
    argv = open("/tmp/gt_combos.txt").read().split() or argv
for a in argv:
    f = a.split(",")
    g = -1 if f[0] == "c" else int(f[0])   # "c" = cluster-gather mode
    combos.append((g, int(f[1]),
                   int(f[2]) if len(f) > 2 else None))
combos = combos or [(1, 131072, None), (8, 131072, None)]
for G, T, RE in combos:
    t0 = time.time()
    try:
        op = build_operator(csr, dtype="float32",
                            gather_group=1 if G < 0 else G,
                            gather_cluster=G < 0, runtime_skip=False,
                            tile_items=T)
        if RE is not None and bool(RE) != op.plan.rowends_vmem:
            import dataclasses
            from merge_spmv_tpu.ops.operator import SpmvOperator
            plan2 = dataclasses.replace(op.plan, rowends_vmem=bool(RE))
            op = SpmvOperator(plan2, *csr.to_device(dtype="float32"),
                              meta=op.meta)
        y = op(xd); jax.block_until_ready(y)
        ok = compare_results(np.asarray(y), gold) is None
        ms = ingraph_rate_ms(operator_step_fn(op), xd, steps=256)
        gbps = total_bytes / ms / 1e6
        print(f"G={G} T={T} (plan G={op.plan.gather_group} "
              f"K={op.plan.meta_k} cw={op.plan.cluster_widths}): "
              f"{ms:.3f} ms {gbps:.1f} GB/s "
              f"verify={'PASS' if ok else 'FAIL'} "
              f"(setup+compile {time.time()-t0:.0f}s)", flush=True)
        key = f"G{G}_T{T}" + ("" if RE is None else f"_RE{int(RE)}")
        out[key] = {"ms": round(ms, 4), "gbps": round(gbps, 1),
                    "ok": ok, "plan_G": op.plan.gather_group,
                    "K": op.plan.meta_k}
    except Exception as e:  # noqa: BLE001
        print(f"G={G} T={T} failed: {str(e)[:200]}", flush=True)
        key = f"G{G}_T{T}" + ("" if RE is None else f"_RE{int(RE)}")
        out[key] = {"error": str(e)[:200]}
print(json.dumps(out))
with open("/tmp/gt_sweep_result.json", "w") as f:
    json.dump(out, f)
