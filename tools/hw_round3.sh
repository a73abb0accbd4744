#!/usr/bin/env bash
# Round-3 hardware capture: every chip-dependent measurement in sequence
# (ONE job at a time — concurrent claims deadlock the tunnel), logging into
# HW_r03/.  Resumable: completed steps are skipped by marker files, so
# rerun the script after any tunnel outage.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=HW_r03
mkdir -p "$OUT" CURVES_r02

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

# 1. TPU noise floor (recasts the failed bit-exact claim honestly)
run_step tpu_noise 3600 python tools/measure_tpu_noise.py

# 2. v2 generalized throughput: XLA path + the fused Pallas kernel
run_step gen_bench_1024 7200 python tools/bench_v2_generalized.py 1024 50
run_step gen_bench_4096 7200 python tools/bench_v2_generalized.py 4096 50
run_step gen_bench_hc_1024 7200 python tools/bench_v2_generalized.py 1024 50 halfcheetah
run_step gen_bench_hum_1024 10800 python tools/bench_v2_generalized.py 1024 50 humanoid

# 3. composer contact-heavy scene @16384 (BASELINE config 5; scoped-vmem fix)
run_step composer_16384 3600 python tools/bench_composer.py 16384 50 4

# 4. learning-curve parity (BASELINE configs 2-4): complete the matrix
for seed in 0 1; do
  run_step "ppo_halfcheetah_ref_s$seed" 10800 python tools/run_curves.py \
    --impl ref --agent ppo --env halfcheetah --seed "$seed" --out CURVES_r02
  run_step "ppo_reacher_ref_s$seed" 10800 python tools/run_curves.py \
    --impl ref --agent ppo --env reacher --seed "$seed" --out CURVES_r02
done
run_step ppo_halfcheetah_ours_s2 5400 python tools/run_curves.py \
  --impl ours --agent ppo --env halfcheetah --seed 2 --out CURVES_r02
run_step ppo_reacher_ours_s2 5400 python tools/run_curves.py \
  --impl ours --agent ppo --env reacher --seed 2 --out CURVES_r02
for seed in 0 1; do
  run_step "sac_humanoid_ours_s$seed" 10800 python tools/run_curves.py \
    --impl ours --agent sac --env humanoid --seed "$seed" --out CURVES_r02
done
run_step sac_humanoid_ref_s0 14400 python tools/run_curves.py \
  --impl ref --agent sac --env humanoid --seed 0 --out CURVES_r02

# 5. render the parity evidence
run_step plot_curves 600 python tools/plot_curves.py CURVES_r02

echo "all steps attempted; artifacts in $OUT/ and CURVES_r02/"

# 6. PPO-ant wall-clock-to-solve (BASELINE target <60 s)
run_step time_to_solve 5400 python tools/time_to_solve.py

# 7. the recast hardware divergence-bound test must pass on the chip
run_step hw_divergence_bound 3600 env BRAX_TPU_HW_TESTS=1 python -m pytest \
  tests/test_bitexact_bounds.py::test_tpu_short_horizon_divergence_bound -x -q
