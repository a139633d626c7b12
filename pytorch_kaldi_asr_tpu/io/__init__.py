from pytorch_kaldi_asr_tpu.io.kaldi_io import (  # noqa: F401
    read_mat,
    read_vec_flt,
    read_mat_ark,
    read_mat_scp,
    read_key_value_text,
    write_key_value_text,
    mat_num_rows,
    scp_entries,
    ArkWriter,
)
