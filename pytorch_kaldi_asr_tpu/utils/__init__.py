from pytorch_kaldi_asr_tpu.utils import constants  # noqa: F401
from pytorch_kaldi_asr_tpu.utils.logging import info, warning, error, procedure  # noqa: F401
