"""Import the ACTUAL reference code (mounted read-only at /root/reference)
under modern torch, for golden parity tests.

API-drift patches live in pytorch_kaldi_asr_tpu.tools.torch04_compat;
this module adds the sys.path plumbing for the reference's import layout
(reference path.sh:6-13).  Test-only scaffolding.
"""

from __future__ import annotations

import sys

REFERENCE_ROOT = "/root/reference"
_REF_PY = REFERENCE_ROOT + "/project/attention-transformer-timit/local/pytorch"
_REF_UTILS = REFERENCE_ROOT + "/pytorch"


def reference_available() -> bool:
    import os

    return os.path.isdir(_REF_PY)


def _install_shims():
    from pytorch_kaldi_asr_tpu.tools import torch04_compat

    torch04_compat.install()


def import_reference():
    """Return the reference modules (Models, Modules, Lattice, constants,
    instances_handler) imported from /root/reference with compat shims."""
    _install_shims()
    for p in (_REF_PY, _REF_UTILS):
        if p not in sys.path:
            sys.path.insert(0, p)
    from transformer import Models, Modules, Lattice  # noqa: F401
    from utils import constants, instances_handler  # noqa: F401

    return Models, Modules, Lattice, constants, instances_handler
