from pytorch_kaldi_asr_tpu.data.instances import (  # noqa: F401
    read_instances,
    build_vocab,
    save_vocab,
    read_vocab,
    add_control_words,
    apply_vocab,
    pad_to_longest,
)
from pytorch_kaldi_asr_tpu.data.loader import (  # noqa: F401
    BatchLoader,
    build_triples,
    make_batch_loader,
)
