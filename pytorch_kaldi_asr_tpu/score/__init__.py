from pytorch_kaldi_asr_tpu.score.wer import (  # noqa: F401
    levenshtein_alignment,
    compute_wer,
    format_wer_report,
)
from pytorch_kaldi_asr_tpu.score.rescore import rescore_nbest, read_nbest  # noqa: F401
from pytorch_kaldi_asr_tpu.score.best_wer import best_wer  # noqa: F401
