from pytorch_kaldi_asr_tpu.train.loss import cross_entropy_loss, performance  # noqa: F401
from pytorch_kaldi_asr_tpu.train.optim import (  # noqa: F401
    hyperbolic_schedule,
    make_optimizer,
)
from pytorch_kaldi_asr_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from pytorch_kaldi_asr_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    average_params,
)
from pytorch_kaldi_asr_tpu.train.loop import train_model, combine_checkpoints  # noqa: F401
