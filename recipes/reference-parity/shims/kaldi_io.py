"""Drop-in for the external `kaldi-io-for-python` glue library the reference
depends on (reference README.md:2-5; imported at BatchLoader.py:1,
initialize_model.py:6, generate_archive.py:4), backed by this framework's
own Kaldi-format reader.  Placed on PYTHONPATH by run_ref.py so the
reference code runs unmodified."""

from pytorch_kaldi_asr_tpu.io.kaldi_io import (  # noqa: F401
    read_mat,
    read_mat_ark,
    read_mat_scp,
    read_vec_flt,
)
