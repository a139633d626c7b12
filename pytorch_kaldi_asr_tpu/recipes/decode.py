"""Stage-5 decode entry point (reference local/decode.py main): load the
combined checkpoint, beam-search the dataset, write n-best decode.txt."""

import argparse

from pytorch_kaldi_asr_tpu.data import read_vocab
from pytorch_kaldi_asr_tpu.data.loader import make_batch_loader
from pytorch_kaldi_asr_tpu.decode.runner import decode_dataset
from pytorch_kaldi_asr_tpu.train import load_checkpoint
from pytorch_kaldi_asr_tpu.utils.logging import info


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_data_dir", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-load_model_file", required=True)
    parser.add_argument("-save_result_file", required=True)
    parser.add_argument("-max_token_seq_len", type=int, required=True)
    parser.add_argument("-batch_size", type=int, default=64)
    parser.add_argument("-beam_size", type=int, default=20)
    parser.add_argument("-nbest", type=int, default=10)
    parser.add_argument("-num_buckets", type=int, default=4,
                        help="length buckets: short utterances decode in "
                             "short static shapes instead of padding "
                             "everything to the longest (identical WER, "
                             "less wasted beam work)")
    parser.add_argument("-use_gpu", action="store_true",
                        help="accepted for recipe compatibility")
    parser.add_argument("-quantize_weights", action="store_true",
                        help="weight-only int8 decoding (ops/quant.py)")
    parser.add_argument("-nlm_model_dir", default=None,
                        help="neural LM checkpoint for per-step shallow "
                             "fusion (decode/fusion.py); must share the "
                             "recipe vocabulary")
    parser.add_argument("-lm_weight", type=float, default=0.3,
                        help="shallow-fusion LM weight")
    opt = parser.parse_args(argv)

    if opt.nbest > opt.beam_size:
        parser.error("nbest should not be larger than beam_size")

    ckpt = load_checkpoint(opt.load_model_file)
    info("loading model with parameter: %s", ckpt["cfg"])
    vocab = read_vocab(opt.read_vocab_file)
    loader = make_batch_loader(opt.read_data_dir, vocab, opt.batch_size,
                               mode="all", shuffle=False,
                               num_buckets=opt.num_buckets)
    fusion = None
    if opt.nlm_model_dir:
        from pytorch_kaldi_asr_tpu.models.nlm import load_nlm

        lm_params, lm_cfg, _ = load_nlm(opt.nlm_model_dir)
        fusion = (lm_params, lm_cfg, opt.lm_weight)
        info("shallow fusion: %s at weight %.2f", opt.nlm_model_dir,
             opt.lm_weight)

    decode_dataset(
        ckpt["params"], ckpt["cfg"], loader, vocab,
        beam_size=opt.beam_size, nbest=opt.nbest,
        max_token_seq_len=opt.max_token_seq_len,
        save_result_file=opt.save_result_file,
        quantize_weights=opt.quantize_weights,
        fusion=fusion,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
