#!/usr/bin/env bash
# Evaluate a work_dir's config + latest checkpoint (reference `test.sh:1-3`),
# or run the test suite:
#   tools/test.sh quick   — CPU unit tests minus the slow/e2e tail (~5 min;
#                           use during iteration)
#   tools/test.sh full    — the whole suite incl. slow e2e tests (~20 min)
#   tools/test.sh <work_dir> [extra dist_test args...]  — eval a checkpoint
set -euo pipefail

ROOT="$(dirname "$0")/.."
if [[ "${1:-}" == "quick" ]]; then
    exec python -m pytest "$ROOT/tests" -m "not slow" -q
elif [[ "${1:-}" == "full" ]]; then
    exec python -m pytest "$ROOT/tests" -q
fi

WORK_DIR=$1
shift || true
CONFIG="$WORK_DIR/config.py"
LATEST="$WORK_DIR/$(cat "$WORK_DIR/latest")"

python "$(dirname "$0")/dist_test.py" "$CONFIG" \
    --checkpoint "$LATEST" --work_dir "$WORK_DIR" "$@"
