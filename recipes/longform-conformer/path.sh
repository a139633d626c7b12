#!/bin/bash
# Environment glue (role of reference path.sh:6-13), shared layout with the
# TIMIT recipe: local/ overrides first, then the repo package.
RECIPE_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(cd "$RECIPE_DIR/../.." && pwd)"
export PYTHONPATH="$RECIPE_DIR/local:$REPO_ROOT:$PYTHONPATH"
export PATH="$RECIPE_DIR/local:$PATH"
pka() { python3 -m "pytorch_kaldi_asr_tpu.$@"; }
export -f pka 2>/dev/null || true
