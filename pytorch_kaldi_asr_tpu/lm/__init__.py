from pytorch_kaldi_asr_tpu.lm.ngram import (  # noqa: F401
    count_ngrams,
    train_ngram_lm,
    NgramLM,
)
from pytorch_kaldi_asr_tpu.lm.arpa import read_arpa, write_arpa  # noqa: F401
