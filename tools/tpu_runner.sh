#!/bin/bash
# Round-4 serial TPU measurement queue: waits for the relay, then runs the
# round's artifact producers STRICTLY SERIALLY, most valuable first
# (VERDICT r3 "Next round" items 1-8).  Status in /tmp/tpu_runner.status,
# log /tmp/tpu_queue.log.  NEVER start other TPU work while status is
# running:*.
exec >> /tmp/tpu_queue.log 2>&1
echo "=== runner(r4) start $(date)"
echo "waiting" > /tmp/tpu_runner.status
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    break
  fi
  sleep 240
done
echo "relay up $(date)"
# 1. circuit-class: merge + banded-split sweep + hotcold -> BENCH_LARGE.json
echo "running:band_sweep" > /tmp/tpu_runner.status
timeout 14400 python -u tools/band_sweep.py 16 32
echo "--- band_sweep done $(date)"
# 2. the five north-star configs -> BASELINE_CONFIGS.json
echo "running:baseline_configs" > /tmp/tpu_runner.status
timeout 21600 python -u tools/bench_baseline_configs.py
echo "--- baseline_configs done $(date)"
# 3. corpus sweep -> CSV + CORPUS_STATS.json
echo "running:corpus" > /tmp/tpu_runner.status
timeout 3600 python -u tools/make_corpus.py /tmp/corpus
timeout 14400 python -u tools/eval_corpus.py /tmp/corpus \
  --out merge_spmv_tpu/bench/results_corpus_tpu.csv
echo "--- corpus done $(date)"
# 4. SpMM artifact (column loop + DIA; wide retired) -> BENCH_SPMM.json
echo "running:spmm" > /tmp/tpu_runner.status
timeout 7200 python -u tools/bench_spmm.py 60 32
echo "--- spmm done $(date)"
# 5. round artifact (headline + skew + circuit quarter + dia)
echo "running:bench" > /tmp/tpu_runner.status
timeout 7200 python -u bench.py
echo "--- bench done $(date)"
# 6. compiled kernel tests on real hardware
echo "running:tpu_tests" > /tmp/tpu_runner.status
MERGE_SPMV_TEST_TPU=1 timeout 7200 python -m pytest \
  tests/test_csrmv_pallas.py -x -q
echo "--- tpu tests done $(date)"
echo "idle" > /tmp/tpu_runner.status
echo "=== runner(r4) all done $(date)"
