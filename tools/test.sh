#!/usr/bin/env bash
# Evaluate a work_dir's config + latest checkpoint (reference `test.sh:1-3`).
# usage: tools/test.sh <work_dir> [extra dist_test args...]
set -euo pipefail

WORK_DIR=$1
shift || true
CONFIG="$WORK_DIR/config.py"
LATEST="$WORK_DIR/$(cat "$WORK_DIR/latest")"

python "$(dirname "$0")/dist_test.py" "$CONFIG" \
    --checkpoint "$LATEST" --work_dir "$WORK_DIR" "$@"
