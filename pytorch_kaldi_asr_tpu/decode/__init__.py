from pytorch_kaldi_asr_tpu.decode.lattice import Lattice  # noqa: F401
from pytorch_kaldi_asr_tpu.decode.beam import (  # noqa: F401
    beam_search,
    BeamResult,
)
from pytorch_kaldi_asr_tpu.decode.runner import decode_dataset, write_nbest  # noqa: F401
