#!/bin/bash
# Self-driving TPU queue v3: waits for the relay, then runs round-3
# measurements STRICTLY SERIALLY, most valuable artifacts first.
# Status in /tmp/tpu_runner.status, log /tmp/tpu_queue.log. NEVER start
# other TPU work while status is running:*.
exec >> /tmp/tpu_queue.log 2>&1
echo "=== runner(v3) start $(date)"
echo "waiting" > /tmp/tpu_runner.status
export PYTHONPATH="/root/repo:$PYTHONPATH:/root/.axon_site"
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    break
  fi
  sleep 240
done
date > /tmp/relay_up.txt
echo "relay up $(date)"
# 1. round artifact: gold verify + headline + skew + circuit quarter + dia
echo "running:bench" > /tmp/tpu_runner.status
timeout 5400 python -u bench.py
echo "--- bench done $(date)"
# 2. headline knob sweep (cluster-gather, big tiles)
echo "running:gt_sweep" > /tmp/tpu_runner.status
timeout 10800 python -u tools/gt_sweep.py 4,131072 8,131072 8,196608 1,196608 8,98304 1,65536,0
echo "--- gt_sweep done $(date)"
# 3. stacked banded split sweep -> BENCH_LARGE.json (verdict item 2)
echo "running:band_sweep" > /tmp/tpu_runner.status
timeout 14400 python -u tools/band_sweep.py 8 16 32
echo "--- band_sweep done $(date)"
# 4. compiled csrmv tests (resident rowends + cluster + streaming)
echo "running:csrmv_tests" > /tmp/tpu_runner.status
MERGE_SPMV_TEST_TPU=1 timeout 5400 python -m pytest tests/test_csrmv_pallas.py -x -q
echo "--- csrmv tests done $(date)"
# 5. SpMM wide vs column loop vs dia (verdict item 4)
echo "running:spmm_bench" > /tmp/tpu_runner.status
timeout 7200 python -u tools/bench_spmm.py 60 32
echo "--- spmm bench done $(date)"
# 6. compiled SpMM wide tests (redesigned dynamic-major kernel)
echo "running:csrmm_tests" > /tmp/tpu_runner.status
MERGE_SPMV_TEST_TPU=1 timeout 10800 python -m pytest tests/test_csrmm_wide.py -x -q
echo "--- csrmm tests done $(date)"
# 7. phase attribution incl. dynfetch/cluster calibration (verdict item 1 proof)
echo "running:perf_probe" > /tmp/tpu_runner.status
timeout 10800 python -u tools/perf_probe.py 100 base,k1,dynfetch,cluster,span1,nocumsum,floor
echo "--- perf_probe done $(date)"
# 8. shape-faithful BASELINE.json config stand-ins (+ wb_edu hotcold A/B)
echo "running:baseline_configs" > /tmp/tpu_runner.status
timeout 21600 python -u tools/bench_baseline_configs.py
echo "--- baseline configs done $(date)"
# 9. hot/cold A/B on kron-class fp32 (powerlaw-column adversary)
echo "running:bench_hotcold" > /tmp/tpu_runner.status
timeout 10800 python -u tools/bench_hotcold.py 20 50000000
echo "--- bench_hotcold done $(date)"
# 10. 25-matrix corpus sweep (resumable, device-preflighted)
echo "running:corpus" > /tmp/tpu_runner.status
timeout 43200 python -u tools/eval_corpus.py /tmp/corpus_r3 --out merge_spmv_tpu/bench/results_corpus_tpu.csv
echo "--- corpus done $(date)"
echo "done" > /tmp/tpu_runner.status
echo "=== runner(v3) done $(date)"
