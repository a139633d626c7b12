from pytorch_kaldi_asr_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    init_transformer,
    transformer_forward,
    encode,
    decode_logits,
)
from pytorch_kaldi_asr_tpu.models.common import (  # noqa: F401
    position_encoding_table,
    padding_attn_mask,
    banded_attn_mask,
    fold_seq_and_mask,
)
