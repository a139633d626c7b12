"""Run torch-0.4-era code (the reference implementation) under torch 2.x.

The reference targets PyTorch 0.4.1 (reference README.md:23-27).  Four API
drifts break it on a modern install; ``install()`` patches them process-wide
without touching the reference tree:

- ``Tensor.view`` on non-contiguous tensors now raises (reference
  Modules.py:25 reshapes attention outputs that are permuted views);
  fall back to ``reshape``;
- ``masked_fill(_)`` requires bool masks, the reference passes uint8
  (Modules.py:85);
- ``nn.init.xavier_normal``/``xavier_uniform`` lost their non-underscore
  aliases (Modules.py:12, SubLayers.py:27-29);
- ``torch.load`` defaults to ``weights_only=True`` and the reference
  checkpoints pickle the entire module object
  (reference initialize_model.py:90-95, train.py:253-260).

Used by tests/ref_compat.py (golden recording) and
recipes/reference-parity/ (the empirical PER/WER baseline run).
"""

from __future__ import annotations


def install():
    import torch

    if getattr(torch, "_pka_torch04_compat", False):
        return
    torch._pka_torch04_compat = True

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

    orig_load = torch.load

    def _load(*args, **kw):
        kw.setdefault("weights_only", False)
        return orig_load(*args, **kw)

    torch.load = _load
