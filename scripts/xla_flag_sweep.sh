#!/usr/bin/env bash
# A/B sweep of TPU XLA compiler flags over the bench headline (3-window
# medians, parity gates and product loop off — this measures the compiled
# step only). Each non-control config forces a fresh XLA compile (~5 min
# through the tunnel), so the full sweep is ~20-30 min; run it in the
# background and read /tmp/xla_sweep/results.jsonl.
#
# Channel: BENCH_XLA_OPTS -> jit compiler_options. XLA_FLAGS does NOT work
# here — the local axon PJRT client parses XLA_FLAGS itself and rejects
# TPU-backend flags before the compile request is sent; compiler_options
# rides inside the request and reaches the remote TPU compiler (verified:
# an invalid option errors from the REMOTE compile, a valid one compiles).
#
# Motivation (BASELINE.md round-3 trace): ~69% of the step is
# conv_general_dilated with the early groups HBM-bound at 600-720 GB/s vs
# 819 peak. The framework-level traffic attacks (S2D stem, bf16 early
# norms, mod2 remat) all measured flat/negative, pointing at DMA-side
# scheduling — which is exactly what these compiler knobs move:
#   * scoped_vmem_limit_kib: more VMEM scratch per op lets the conv
#     emitter pick deeper double-buffered tiles (default 16 MiB class);
#   * latency-hiding-scheduler: more aggressive cross-op DMA overlap.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/xla_sweep}
mkdir -p "$OUT"
: > "$OUT/results.jsonl"

run_one() {
  local name="$1"; shift
  local opts="$1"; shift
  echo "=== $name (BENCH_XLA_OPTS=$opts) ===" >&2
  local t0=$SECONDS
  local json
  json=$(BENCH_XLA_OPTS="$opts" BENCH_PARITY=0 BENCH_EXPERIMENT=0 \
         BENCH_INFER=0 BENCH_EVAL=0 BENCH_PREDICT=0 BENCH_ADE=0 \
         BENCH_TRACE=0 BENCH_WINDOWS=3 BENCH_WIN_STEPS=8 \
         python bench.py 2>"$OUT/$name.stderr")
  local rc=$?
  local dt=$((SECONDS - t0))
  if [ $rc -ne 0 ] || [ -z "$json" ]; then
    echo "{\"config\": \"$name\", \"error\": $rc, \"wall_s\": $dt}" \
      >> "$OUT/results.jsonl"
  else
    echo "$json" | python -c "
import json, sys
r = json.load(sys.stdin)
print(json.dumps({'config': '$name', 'value': r['value'],
                  'raw': r.get('raw_window_rates'), 'wall_s': $dt}))
" >> "$OUT/results.jsonl"
  fi
  tail -1 "$OUT/results.jsonl" >&2
}

run_one control ""
run_one vmem48m "xla_tpu_scoped_vmem_limit_kib=49152"
run_one vmem96m "xla_tpu_scoped_vmem_limit_kib=98304"
run_one lhs "xla_tpu_enable_latency_hiding_scheduler=true"
run_one vmem48m_lhs "xla_tpu_scoped_vmem_limit_kib=49152,xla_tpu_enable_latency_hiding_scheduler=true"
echo "SWEEP DONE" >&2
