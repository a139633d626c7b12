#!/bin/bash
# Environment glue for the recipe (role of reference path.sh:6-13).
# REPO_ROOT is auto-detected relative to this file; local/ overrides first,
# preserving the reference's copy-a-file-to-shadow-the-library mechanism.
RECIPE_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(cd "$RECIPE_DIR/../.." && pwd)"
export PYTHONPATH="$RECIPE_DIR/local:$REPO_ROOT:$PYTHONPATH"
export PATH="$RECIPE_DIR/local:$PATH"
# convenience aliases for the framework CLI tools
pka() { python3 -m "pytorch_kaldi_asr_tpu.$@"; }
export -f pka 2>/dev/null || true
