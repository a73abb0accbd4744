#!/usr/bin/env bash
# Probe the axon tunnel every 10 min; when the chip answers, run the
# round-2 capture orchestrator (resumable) and exit. ONE chip job at a time.
cd "$(dirname "$0")/.."
while true; do
  if timeout 300 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,128)).sum()))" >/tmp/hw_probe.log 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel up — launching hw_round2.sh"
    bash tools/hw_round2.sh
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down"
  sleep 600
done
