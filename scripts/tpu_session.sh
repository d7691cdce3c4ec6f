#!/bin/sh
# One healthy-TPU session: capture every piece of device perf evidence
# in priority order, each step logged and survivable (a tunnel drop
# mid-session keeps earlier results). Run on a QUIET machine.
#
# Usage: scripts/tpu_session.sh [outdir]
set -x
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_session_$(date +%m%d_%H%M)}"
mkdir -p "$OUT"

# 0. health probe (fresh process; do not wedge the session if down)
timeout 240 python -c "import jax; print(jax.devices())" \
    > "$OUT/probe.log" 2>&1 || { echo "TUNNEL DOWN" | tee "$OUT/DOWN"; exit 1; }

# 1. the headline bench first (64 MB, trained vocab cached under /tmp):
#    if the tunnel window closes early, this is the number that counts
timeout 5400 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"

# 2. stage-level profile at the production geometry (the ROADMAP table)
timeout 3600 python scripts/profile_v3.py > "$OUT/profile_v3.log" 2>&1

# 3. geometry sweep (compile-heavy; JSON lines survive a kill)
timeout 7200 python scripts/bench_geometry.py 16 176,256 8192,16384 \
    > "$OUT/geometry.jsonl" 2> "$OUT/geometry.log"

echo "session artifacts in $OUT"
