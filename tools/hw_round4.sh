#!/usr/bin/env bash
# Round-4 hardware capture: ONE job at a time (concurrent claims deadlock
# the tunnel), logging into HW_r04/.  Resumable via marker files.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=HW_r04
mkdir -p "$OUT"

run_step() {  # name timeout_s command...
  local name="$1" tmo="$2"; shift 2
  if [ -f "$OUT/$name.done" ]; then echo "== $name: done, skip"; return 0; fi
  echo "== $name (timeout ${tmo}s)"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"
    echo "   OK"; tail -3 "$OUT/$name.log" | sed 's/^/   /'
  else
    echo "   FAILED/TIMEOUT (see $OUT/$name.log)"; tail -3 "$OUT/$name.log" | sed 's/^/   /'
  fi
}

# 0. chip sanity — bail early if the tunnel is down
if ! timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >"$OUT/sanity.log" 2>&1; then
  echo "chip unreachable (see $OUT/sanity.log)"; exit 1
fi
echo "chip alive"

# 1. persistent-compilation-cache efficacy: cold (writes cache) then warm
run_step cache_cold 3600 python tools/probe_compile_cache.py
run_step cache_warm 1800 env JAX_LOG_COMPILES=1 python tools/probe_compile_cache.py

# 2. fused generalized kernel: triangle parity + timing anatomy (the r3
#    275 ms/step artifact), then the per-step cost decomposition
run_step diag_gen_kernel 3600 python tools/diag_gen_kernel_hw.py 256 ant
run_step probe_gen_perf_ant 7200 python tools/probe_gen_perf.py ant 1024,4096
run_step probe_gen_perf_hum 7200 python tools/probe_gen_perf.py humanoid 1024

# 3. v2 generalized benches with the recompile-proof warm-up
run_step gen_bench_1024 7200 python tools/bench_v2_generalized.py 1024 50
run_step gen_bench_4096 7200 python tools/bench_v2_generalized.py 4096 50

# 4. PPO-ant wall-clock-to-solve: cold (compiles, writes cache) then warm
#    (BASELINE target <60 s; the warm number is the production cost).
#    RESULT reports device_ready_s separately: the tunnel can block the
#    first fetch for minutes while tearing down the previous tenant.
run_step time_to_solve_cold 5400 python tools/time_to_solve.py
run_step time_to_solve_warm 5400 python tools/time_to_solve.py

# 4b. SAC-humanoid cold start (longest trace) + v1 kernel sublane sweep
run_step sac_cold_start_cold 5400 python tools/sac_cold_start.py
run_step sac_cold_start_warm 2700 python tools/sac_cold_start.py
run_step v1_sub_sweep 2700 python tools/bench_v1_sub_sweep.py ant 4096 200

# 5. hardware-gated tests must pass on the chip
run_step hw_divergence_bound 3600 env BRAX_TPU_HW_TESTS=1 python -m pytest \
  tests/test_bitexact_bounds.py::test_tpu_short_horizon_divergence_bound -x -q
run_step hw_kernel_noise_floor 3600 env BRAX_TPU_HW_TESTS=1 python -m pytest \
  "tests/test_v2_generalized_kernel.py::test_tpu_kernel_within_platform_noise_floor" -x -q

# 6. headline bench (the driver also runs this at round end)
run_step bench_main 3600 python bench.py

echo "all steps attempted; artifacts in $OUT/"
