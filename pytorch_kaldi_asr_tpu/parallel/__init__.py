from pytorch_kaldi_asr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
    shard_batch_arrays,
)
