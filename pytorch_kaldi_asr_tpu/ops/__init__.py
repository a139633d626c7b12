from pytorch_kaldi_asr_tpu.ops.banded_attention import (  # noqa: F401
    banded_attention,
    banded_attention_reference,
    banded_attention_pallas,
)
