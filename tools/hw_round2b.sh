#!/usr/bin/env bash
# Round-2 hardware capture, pass B: re-runs that depend on this session's
# fixes (Mosaic-safe generalized kernel, VPU-peak calibration), then the
# learning-curve parity suite.  Same marker-file resume scheme as
# hw_round2.sh; ONE chip job at a time.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=HW_r02
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

if ! timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >"$OUT/sanity.log" 2>&1; then
  echo "chip unreachable (see $OUT/sanity.log)"; exit 1
fi
echo "chip alive"

# 1. fused generalized kernel (Mosaic fix) — the top VERDICT item
run_step gen_bench_fused_1024 7200 python tools/bench_v2_generalized.py 1024 50
run_step gen_bench_fused_hc 7200 python tools/bench_v2_generalized.py 1024 50 halfcheetah
run_step gen_bench_fused_hum 7200 python tools/bench_v2_generalized.py 1024 50 humanoid

# 2. headline bench with the fixed VPU-peak calibration
run_step bench_main_v2 3600 python bench.py

# 3. hardware bit-exactness (gated suite)
run_step hw_bitexact 3600 env BRAX_TPU_HW_TESTS=1 python -m pytest \
  tests/test_bitexact_bounds.py -x -q -k tpu

# 4. learning-curve parity (BASELINE configs 2-4)
for seed in 0 1 2; do
  run_step "ppo_halfcheetah_ours_s$seed" 5400 python tools/run_curves.py \
    --impl ours --agent ppo --env halfcheetah --seed "$seed" --out CURVES_r02
  run_step "ppo_reacher_ours_s$seed" 5400 python tools/run_curves.py \
    --impl ours --agent ppo --env reacher --seed "$seed" --out CURVES_r02
done
for seed in 0 1; do
  run_step "ppo_halfcheetah_ref_s$seed" 10800 python tools/run_curves.py \
    --impl ref --agent ppo --env halfcheetah --seed "$seed" --out CURVES_r02
  run_step "ppo_reacher_ref_s$seed" 10800 python tools/run_curves.py \
    --impl ref --agent ppo --env reacher --seed "$seed" --out CURVES_r02
done
for seed in 0 1; do
  run_step "sac_humanoid_ours_s$seed" 10800 python tools/run_curves.py \
    --impl ours --agent sac --env humanoid --seed "$seed" --out CURVES_r02
done
run_step "sac_humanoid_ref_s0" 14400 python tools/run_curves.py \
  --impl ref --agent sac --env humanoid --seed 0 --out CURVES_r02

run_step plot_curves 600 python tools/plot_curves.py CURVES_r02
echo "pass B complete"
