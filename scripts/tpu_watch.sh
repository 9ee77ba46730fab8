#!/bin/bash
# Watch for axon TPU tunnel recovery; when a tiny matmul completes, run the
# round-4 validation pass (scripts/probe_round4.py) and then bench.py, each
# once, and stop.  Designed to survive the builder session (nohup).
#
# Logs: /tmp/tpu_watch.log (watcher), /tmp/probe_round4.log, /tmp/bench_r4.log
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=/tmp/tpu_watch.log
echo "watcher start $(date -u +%FT%TZ) pid $$" >> "$LOG"
while true; do
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() in ('tpu','axon')
x = jnp.ones((256,256)); assert float((x@x).sum()) > 0
print('TPU_UP')
" >> "$LOG" 2>&1
  rc=$?
  echo "probe rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "tunnel up - running probe_round4" >> "$LOG"
    timeout 5400 python scripts/probe_round4.py > /tmp/probe_round4.log 2>&1
    echo "probe_round4 rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    timeout 5400 python bench.py > /tmp/bench_r4.log 2>&1
    echo "bench rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    echo "watcher done $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  sleep 600
done
