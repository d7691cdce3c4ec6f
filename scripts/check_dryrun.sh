#!/bin/sh
# The driver's multi-chip gate, verbatim: a FRESH process (no conftest
# env, no TIKTOKEN_TPU_* overrides) must print "dryrun ok" within the
# timeout. Run this after any change to the device pipelines or the
# parallel layer — the round-2 gate regressed red because nothing in the
# repo exercised this exact invocation.
set -e
cd "$(dirname "$0")/.."
exec timeout "${1:-300}" python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
