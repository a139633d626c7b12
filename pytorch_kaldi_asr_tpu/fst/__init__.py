"""Weighted finite-state transducer library (tropical semiring).

Fills the role of the OpenFst operations the reference recipe's vendored
Kaldi layer shells out to (reference kaldi/utils/mkgraph.sh:1-130 —
fstcompose / fstdeterminizestar / fstminimizeencoded / fstarcsort — and
the ``arpa2fst`` binary, reference run.sh:61), redesigned as a small
pure-Python core with a stable textual + binary serialization:

- core.Fst        mutable vector FST, text (AT&T) and binary round-trip
- ops             compose, determinize, minimize, rmepsilon, etc.
- graph.mkgraph   L o G (o H) decoding-graph compilation
"""

from pytorch_kaldi_asr_tpu.fst.core import Fst, Arc  # noqa: F401
from pytorch_kaldi_asr_tpu.fst import ops  # noqa: F401
