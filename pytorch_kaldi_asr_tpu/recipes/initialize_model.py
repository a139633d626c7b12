"""Stage-3 entry point: build and save the initial model checkpoint.

Reference contract (local/initialize_model.py): input/output dims are derived
from data — ``src_dim`` sniffed from the first scp matrix (58-61),
``tgt_vocab_dim`` from the vocab file (63-65), the frozen LDA affine read
from ``lda.mat`` (69); hyperparameters come from CLI flags with the TIMIT
defaults; the result is a loadable checkpoint with epoch 0.

(The reference hardcodes encoder_sub_sequence=(-100,0) regardless of its CLI
flag, initialize_model.py:77 — here the flag is honored; the live encoder is
the TDNN stack, which doesn't consume it either way.)"""

import argparse

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.data import instances as instances_handler
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.models import TransformerConfig, init_transformer
from pytorch_kaldi_asr_tpu.train import save_checkpoint
from pytorch_kaldi_asr_tpu.utils.logging import info


def str2tuple(s):
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"invalid sub-sequence string {s!r}")
    arr = tuple(int(i) for i in s[1:-1].split(","))
    if len(arr) != 2:
        raise ValueError(f"invalid sub-sequence length in {s!r}")
    return arr


def build_config(opt):
    for _key, matrix in kaldi_io.read_mat_scp(opt.read_feats_scp_file):
        src_dim = matrix.shape[1]
        break
    info("get feature of dimension %d from %s.", src_dim,
         opt.read_feats_scp_file)
    word2idx = instances_handler.read_vocab(opt.read_vocab_file)
    vocab_dim = len(word2idx)
    info("get label of dimension %d from %s.", vocab_dim, opt.read_vocab_file)
    return TransformerConfig(
        src_dim=src_dim,
        vocab_size=vocab_dim,
        encoder_max_len=opt.encoder_max_len,
        decoder_max_len=opt.decoder_max_len,
        src_fold=opt.src_fold,
        encoder_sub_sequence=str2tuple(opt.encoder_sub_sequence),
        decoder_sub_sequence=str2tuple(opt.decoder_sub_sequence),
        en_layers=opt.en_layers,
        de_layers=opt.de_layers,
        n_head=opt.n_head,
        en_d_model=opt.en_d_model,
        de_d_model=opt.de_d_model,
        d_k=opt.d_k,
        d_v=opt.d_v,
        en_dropout=opt.en_dropout,
        de_dropout=opt.de_dropout,
        encoder_type=opt.encoder_type,
        conformer_stream_dtype=jnp.dtype(opt.conformer_stream_dtype),
        tdnn_contexts=tuple(
            tuple(c) for c in
            ([[-1, 0, 1], [-1, 0, 1], [-3, 0, 3], [-3, 0, 3], [-3, 0, 3],
              [-3, 0, 3]] if opt.tdnn_contexts is None else opt.tdnn_contexts)
        ),
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_feats_scp_file", required=True)
    parser.add_argument("-lda_mat_file", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-encoder_max_len", type=int, required=True)
    parser.add_argument("-decoder_max_len", type=int, required=True)
    parser.add_argument("-src_fold", type=int, default=1)
    parser.add_argument("-encoder_sub_sequence", default="(-100,0)")
    parser.add_argument("-decoder_sub_sequence", default="(-20,0)")
    parser.add_argument("-en_layers", type=int, default=2)
    parser.add_argument("-de_layers", type=int, default=2)
    parser.add_argument("-n_head", type=int, default=3)
    parser.add_argument("-en_d_model", type=int, default=256)
    parser.add_argument("-de_d_model", type=int, default=128)
    parser.add_argument("-d_k", type=int, default=64)
    parser.add_argument("-d_v", type=int, default=64)
    parser.add_argument("-en_dropout", type=float, default=0.2)
    parser.add_argument("-de_dropout", type=float, default=0.2)
    parser.add_argument("-encoder_type", default="tdnn",
                        choices=["tdnn", "banded", "blstm", "conformer",
                                 "tdnnf"],
                        help="encoder family (models/encoders.py)")
    parser.add_argument("-conformer_stream_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="Conformer residual-stream dtype; bfloat16 is "
                             "the fast path (+15%% step throughput, LN "
                             "statistics stay f32)")
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument("-init_compat", default="native",
                        choices=["native", "torch"],
                        help="'torch' reproduces the reference's exact init "
                             "distributions (torch-default FFN convs + "
                             "uniform biases) for training-dynamics studies")
    parser.add_argument("-save_model_file", required=True)
    opt = parser.parse_args(argv)
    opt.tdnn_contexts = None

    cfg = build_config(opt)
    info("model will initialized with arguments:\n\t%s.", cfg)

    if opt.lda_mat_file in ("", "none", "identity"):
        lda_mat = None
    else:
        lda_mat = kaldi_io.read_mat(opt.lda_mat_file)
    params = init_transformer(jax.random.PRNGKey(opt.seed), cfg, lda_mat,
                              init_compat=opt.init_compat)
    save_checkpoint(opt.save_model_file, params, cfg, epoch=0)
    info("initialized model is saved to %s.", opt.save_model_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
