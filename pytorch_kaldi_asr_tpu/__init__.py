"""pytorch_kaldi_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of the
boji123/pytorch-kaldi-asr hybrid Kaldi+PyTorch ASR framework.

The reference framework (see /root/reference, SURVEY.md) couples Kaldi C++
binaries (feature extraction, CMVN, WER scoring, LM tooling) to a pure-Python
PyTorch-0.4 attention-transformer acoustic model, glued by kaldi-io-for-python
and driven by staged run.sh recipes on an SGE grid.

This package provides the same capabilities, designed TPU-first:

- ``io``       Kaldi ark/scp binary format readers/writers (Python + C++ core).
- ``data``     vocab/text handling, bucketed static-shape batch loaders,
               device prefetch (replaces pytorch/utils/*).
- ``models``   JAX model zoo: LDA/TDNN frontend + windowed-attention
               transformer (replaces local/pytorch/transformer + TDNN.py),
               plus TDNN-F / BLSTM / Conformer / streaming configs.
- ``ops``      Pallas TPU kernels (banded attention, fused CMVN+splice).
- ``train``    jitted CE training step, hyperbolic LR schedule, checkpointing,
               checkpoint averaging ("combine").
- ``decode``   fixed-shape on-device batched beam search (replaces
               Lattice.py/decode.py) with host-side lattice parity mode.
- ``lm``       ARPA n-gram training/scoring (replaces SRILM ngram-count/ngram).
- ``score``    WER computation, LM rescoring, best-WER selection (replaces
               compute-wer / rescore.py / best_wer.sh).
- ``parallel`` device meshes, sharding rules, multi-host launch runner
               (replaces queue.pl-style job scheduling with jax.sharding).
- ``tools``    Kaldi data-dir utilities (validate/fix/split/subset), feature
               extraction (fbank), CMVN and LDA estimation.
- ``utils``    constants, logging, timers.
"""

__version__ = "0.1.0"


def _apply_platform_env():
    """Honor JAX_PLATFORMS / PKA_NUM_CPU_DEVICES even when the interpreter
    pre-imports jax (in that case jax has already parsed its env before user
    code could set it, and exported env vars are ignored).  No-ops if the
    backend is already initialized."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS")
    n_cpu = os.environ.get("PKA_NUM_CPU_DEVICES")
    if not platforms and not n_cpu:
        return
    try:
        import jax

        if platforms:
            jax.config.update("jax_platforms", platforms)
        if n_cpu:
            jax.config.update("jax_num_cpu_devices", int(n_cpu))
    except Exception:
        pass


_apply_platform_env()
