#!/bin/bash
# One-shot TPU measurement sweep (run when the axon tunnel is up).
# Usage: bash tools/tpu_measure.sh [outdir]   (default /tmp/tpu_measure)
# Each step is independently timeout-guarded; logs land in $OUT.
set -u
OUT=${1:-/tmp/tpu_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax; print(jax.devices())" \
    > "$OUT/probe.log" 2>&1
}

if ! probe; then
  echo "TPU tunnel DOWN (probe timed out) — aborting"; exit 1
fi
echo "TPU up: $(cat "$OUT/probe.log" | tail -1)"

echo "== 1/4 incoherent traversal kernels (packet/sub-packet/divergent/stream)"
timeout 3600 python tools/bench_incoherent.py \
  > "$OUT/incoherent.log" 2>&1
tail -8 "$OUT/incoherent.log"

echo "== 2/4 headline bench"
timeout 3600 python bench.py > "$OUT/bench.log" 2>&1
tail -2 "$OUT/bench.log"

echo "== 3/4 per-stage profile"
timeout 3600 python tools/profile_stage.py > "$OUT/profile.log" 2>&1 || true
tail -20 "$OUT/profile.log"

echo "== 4/4 full BASELINE legs (1024x1024 fwd, fwd+bwd, scaling curve)"
timeout 7200 python bench.py --full > "$OUT/bench_full.log" 2>&1
tail -6 "$OUT/bench_full.log"

echo "done — logs in $OUT"
