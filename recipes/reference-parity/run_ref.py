#!/usr/bin/env python3
"""Run an UNMODIFIED reference entry-point script under modern torch.

Usage: python run_ref.py <script.py> [args...]

where <script.py> is resolved inside the reference checkout's
project/attention-transformer-timit/local/ directory (or given as an
absolute path).  Sets up the reference's import layout (its path.sh
PYTHONPATH contract, reference path.sh:6-13), the kaldi_io glue shim, and
the torch-0.4 compat patches, then executes the script with runpy so its
argparse CLI surface is exactly the published one.

This powers the empirical PER/WER baseline: the reference recipe's Python
stages run as-is on CPU, on the same corpus this framework trains on
(VERDICT.md "Next round" #1).
"""

import os
import runpy
import sys

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
LOCAL = os.path.join(REFERENCE_ROOT, "project/attention-transformer-timit/local")
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    script = sys.argv[1]
    if not os.path.isabs(script):
        script = os.path.join(LOCAL, script)

    sys.path.insert(0, REPO)  # pytorch_kaldi_asr_tpu (backs the kaldi_io shim)
    from pytorch_kaldi_asr_tpu.tools import torch04_compat

    torch04_compat.install()

    # the reference path.sh import layout, plus our kaldi_io shim
    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "pytorch"))
    sys.path.insert(0, os.path.join(LOCAL, "pytorch"))
    sys.path.insert(0, LOCAL)  # train.py imports from decode.py siblings

    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
