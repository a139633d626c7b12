"""Import the ACTUAL reference code (mounted read-only at /root/reference)
under modern torch, for golden parity tests.

The reference targets torch 0.4.1 (reference README.md:23-27); under
torch 2.x three API drifts break it, each patched here without touching
the reference tree:

- ``Tensor.view`` on non-contiguous results (Modules.py:25 Bottle reshape)
  now raises; fall back to ``reshape``;
- ``masked_fill`` requires bool masks, the reference passes uint8
  (Modules.py:85);
- ``nn.init.xavier_normal`` lost its non-underscore alias
  (Modules.py:12, SubLayers.py:27-29).

Nothing here is imported by the framework itself — test-only scaffolding.
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
    import torch

    if getattr(torch, "_pka_ref_compat", False):
        return
    torch._pka_ref_compat = True

    orig_view = torch.Tensor.view

    def _view(self, *shape):
        try:
            return orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = _view

    for name in ("masked_fill_", "masked_fill"):
        orig = getattr(torch.Tensor, name)

        def _mf(self, mask, value, _orig=orig):
            if mask.dtype == torch.uint8:
                mask = mask.bool()
            return _orig(self, mask, value)

        setattr(torch.Tensor, name, _mf)

    if not hasattr(torch.nn.init, "xavier_normal"):
        torch.nn.init.xavier_normal = torch.nn.init.xavier_normal_
    if not hasattr(torch.nn.init, "xavier_uniform"):
        torch.nn.init.xavier_uniform = torch.nn.init.xavier_uniform_


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
