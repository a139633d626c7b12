"""Dump per-utterance log-posteriors from a trained hybrid AM to a Kaldi
ark/scp pair (the artifact external WFST latgen decoding consumes — the
BASELINE north-star output contract)."""

import argparse
import os

import numpy as np

from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.models import am
from pytorch_kaldi_asr_tpu.train.checkpoint import load_checkpoint
from pytorch_kaldi_asr_tpu.utils.logging import info


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_data_dir", required=True)
    parser.add_argument("-load_model_file", required=True)
    parser.add_argument("-wspecifier", required=True,
                        help="e.g. ark,scp:post.ark,post.scp")
    parser.add_argument("-batch_size", type=int, default=16)
    parser.add_argument("-priors_file", default=None,
                        help="optional text file of class priors to divide "
                             "out (hybrid likelihood scaling)")
    opt = parser.parse_args(argv)

    from pytorch_kaldi_asr_tpu.train.checkpoint import read_checkpoint_config

    cfg, meta = read_checkpoint_config(opt.load_model_file)
    n_targets = meta.get("n_targets")
    # AM checkpoints hold an encoder+head tree, not encoder+decoder
    import jax

    template = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    ckpt = load_checkpoint(opt.load_model_file, template_params=template)
    params = ckpt["params"]

    feats = dict(kaldi_io.scp_entries(
        os.path.join(opt.read_data_dir, "feats.scp")))
    triples = [(k, rx, np.zeros(1, np.int32)) for k, rx in feats.items()]
    loader = BatchLoader(triples, opt.batch_size, mode="all", shuffle=False)

    log_priors = None
    if opt.priors_file:
        import jax.numpy as jnp

        priors = np.atleast_1d(np.loadtxt(opt.priors_file))
        if priors.shape != (n_targets,):
            raise ValueError(
                f"priors file has {priors.size} entries but the model "
                f"has {n_targets} targets — pass -n_targets to "
                f"compute_priors"
            )
        log_priors = jnp.log(jnp.asarray(priors / priors.sum()))

    n = am.write_posteriors(params, cfg, loader, opt.wspecifier,
                            log_priors=log_priors)
    info("wrote posteriors for %d utterances", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
