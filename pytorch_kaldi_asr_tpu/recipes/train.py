"""Stage-4 entry point: train the acoustic model (reference local/train.py
main, train.py:333-402): load model.init, build train/dev/test loaders, run
the epoch driver, then combine the final checkpoints."""

import argparse
import os

from pytorch_kaldi_asr_tpu.data import read_vocab
from pytorch_kaldi_asr_tpu.data.loader import make_batch_loader
from pytorch_kaldi_asr_tpu.train import (
    combine_checkpoints,
    load_checkpoint,
    train_model,
)
from pytorch_kaldi_asr_tpu.utils.logging import info, procedure


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_train_dir", required=True)
    parser.add_argument("-read_dev_dir", required=True)
    parser.add_argument("-read_test_dir", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-load_model_file", required=True)
    parser.add_argument("-save_model_dir", required=True)
    parser.add_argument("-seq_error_prob", type=float, default=0)  # parity knob
    parser.add_argument("-epoch", type=int, default=50)
    parser.add_argument("-optim_start_lr", type=float, default=0.001)
    parser.add_argument("-optim_soft_coefficient", type=float, default=1000)
    parser.add_argument("-batch_size", type=int, default=64)
    parser.add_argument("-num_buckets", type=int, default=1,
                        help="length buckets (>1 reduces padding waste at "
                             "the cost of one compiled shape per bucket)")
    parser.add_argument("-loader_workers", type=int, default=1,
                        help="host batch-assembly threads (ordered "
                             "handoff; the ark parse and numpy padding "
                             "release the GIL, so >1 scales the feeder "
                             "on multi-core hosts)")
    parser.add_argument("-train_archive_dir", default=None,
                        help="stream the training set from pre-packed "
                             ".npz batch archives (recipes/generate_archive) "
                             "instead of preloading read_train_dir — the "
                             "large-corpus path (reference "
                             "ArchiveBatchLoader.py:1-79 role)")
    parser.add_argument("-label_smoothing", action="store_true")
    parser.add_argument("-save_interval", type=int, default=10)
    parser.add_argument("-seed", type=int, default=0,
                        help="training seed (epoch shuffling + dropout); "
                             "pair with initialize_model -seed for a fully "
                             "independent draw (seed-variance studies)")
    parser.add_argument("-resume", action="store_true",
                        help="continue from the newest epoch.* checkpoint")
    parser.add_argument("-use_gpu", action="store_true",
                        help="accepted for recipe compatibility; device "
                             "choice is JAX's")
    parser.add_argument("-specaugment", action="store_true",
                        help="on-chip SpecAugment masking inside the jitted "
                             "train step (ops/specaugment.py defaults; OFF "
                             "by default — the reference has no feature "
                             "augmentation, so parity runs leave this off)")
    opt = parser.parse_args(argv)

    procedure("prepare trainning.")
    ckpt = load_checkpoint(opt.load_model_file)
    params, cfg = ckpt["params"], ckpt["cfg"]
    info("loading model with parameter:\n\t%s", cfg)

    vocab = read_vocab(opt.read_vocab_file)

    info("reading training data...")
    if opt.train_archive_dir:
        from pytorch_kaldi_asr_tpu.data.archive import ArchiveBatchLoader

        train_loader = ArchiveBatchLoader(opt.train_archive_dir,
                                          opt.batch_size, mode="drop")
    else:
        train_loader = make_batch_loader(opt.read_train_dir, vocab,
                                         opt.batch_size, mode="drop",
                                         num_buckets=opt.num_buckets,
                                         seed=opt.seed,
                                         num_workers=opt.loader_workers)
    info("reading dev data...")
    dev_loader = make_batch_loader(opt.read_dev_dir, vocab, opt.batch_size,
                                   mode="all")
    info("reading test data...")
    test_loader = make_batch_loader(opt.read_test_dir, vocab, opt.batch_size,
                                    mode="all")
    info("batch loader is initialized")

    procedure("trainning start...")
    result = train_model(
        params, cfg, train_loader, dev_loader, test_loader,
        opt.save_model_dir,
        epochs=opt.epoch,
        start_lr=opt.optim_start_lr,
        soft_coefficient=opt.optim_soft_coefficient,
        save_interval=opt.save_interval,
        smoothing=opt.label_smoothing,
        seed=opt.seed,
        resume=opt.resume,
        metrics_path=os.path.join(opt.save_model_dir, "metrics.jsonl"),
        specaugment=opt.specaugment,
    )
    if result.preempted:
        # checkpointed mid-run; ask the launcher to resubmit us (pair
        # with -resume so the rerun continues from the preempt snapshot)
        from pytorch_kaldi_asr_tpu.parallel.launch import PREEMPT_EXIT_CODE

        procedure("preempted: exiting %d for launcher resubmission"
                  % PREEMPT_EXIT_CODE)
        return PREEMPT_EXIT_CODE

    procedure("combining start on best epoch %d" % result.best_epoch)
    num_model = 30 if opt.epoch > 30 else opt.epoch
    combine_checkpoints(opt.save_model_dir, result.best_epoch, cfg,
                        dev_loader, num_model=num_model)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
