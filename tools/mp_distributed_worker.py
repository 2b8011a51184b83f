#!/usr/bin/env python
"""Worker process for the multi-process distributed CsrMV test.

SURVEY.md §5 names ``jax.distributed.initialize`` as the multi-host
capability the framework must provide (the reference has no distributed
backend at all; the north star adds one).  This worker is spawned N times
by tests/test_multiprocess.py — each process owns 4 virtual CPU devices,
``jax.distributed.initialize`` stitches them into one 4N-device global
mesh, and the full PreparedDistributedCsrmv path (per-shard merge
kernels + ppermute halo + psum_scatter carry fix-up) runs across the
process boundary exactly as it would across DCN on real hosts.

Each worker verifies the y windows of ITS OWN addressable shards against
the host gold and prints one PASS line; the parent asserts both.

Usage: mp_distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

    import merge_spmv_tpu as ms
    from jax.sharding import Mesh
    from merge_spmv_tpu.parallel.distributed import PreparedDistributedCsrmv
    from merge_spmv_tpu.parallel.partition import partition_csr
    from merge_spmv_tpu.utils.compare import compare_results

    devs = jax.devices()
    assert len(devs) == 4 * nproc, devs
    assert len(jax.local_devices()) == 4

    # identical matrix on every process (deterministic seed)
    rs = np.random.RandomState(0)
    coo = ms.CooMatrix.random_powerlaw(1200, 900, 12000, seed=3)
    csr = ms.CsrMatrix.from_coo(coo).astype(np.float32)
    csr.values = rs.uniform(0.1, 1.0, csr.num_nonzeros).astype(np.float32)
    x = rs.uniform(0.1, 1.0, csr.num_cols).astype(np.float32)
    gold = csr.spmv_gold(x)
    bound = csr.spmv_abs_bound(x)

    mesh = Mesh(np.array(devs), ("shards",))
    part = partition_csr(csr, len(devs), dtype=np.float32)
    op = PreparedDistributedCsrmv(mesh, part)
    yw = op(x)
    jax.block_until_ready(yw)

    # verify the exclusive y windows this process can address
    checked = 0
    for shard in yw.addressable_shards:
        s = shard.index[0].start or 0
        r0 = int(part.row_starts[s])
        r1 = int(part.row_starts[s + 1])
        if r1 <= r0:
            continue
        yl = np.asarray(shard.data)[0, :r1 - r0]
        err = compare_results(yl, gold[r0:r1], verbose=True,
                              abs_bound=bound[r0:r1])
        assert err is None, f"shard {s} mismatch at {err}"
        checked += 1
    print(f"PASS process={pid} shards_checked={checked}", flush=True)


if __name__ == "__main__":
    main()
