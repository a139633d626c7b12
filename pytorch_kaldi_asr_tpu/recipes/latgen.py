"""Graph decoding of dumped posteriors: HLG.fst + posterior ark -> text.

The latgen-faster role over recipes/dump_posteriors.py output, finishing
the hybrid-AM pipeline (posterior dump -> graph decode -> WER).  Reads the
graph dir written by recipes/mkgraph.py; posteriors are LOG posteriors as
dumped by the AM (use -priors_file to convert to pseudo-likelihoods,
matching the hybrid convention in decode/latgen.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pytorch_kaldi_asr_tpu.decode.latgen import decode_posterior_ark
from pytorch_kaldi_asr_tpu.io.kaldi_io import read_mat_ark, read_mat_scp
from pytorch_kaldi_asr_tpu.recipes.mkgraph import read_symbol_table
from pytorch_kaldi_asr_tpu.utils.logging import info


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-graph_dir", required=True)
    parser.add_argument("-rspecifier", required=True,
                        help="posterior input, ark:file or scp:file")
    parser.add_argument("-save_result_file", required=True)
    parser.add_argument("-acoustic_scale", type=float, default=1.0)
    parser.add_argument("-beam", type=float, default=16.0)
    parser.add_argument("-max_active", type=int, default=2000)
    parser.add_argument("-priors_file", default=None,
                        help="numpy .npy log-priors to subtract")
    parser.add_argument("-lattice_beam", type=float, default=8.0)
    parser.add_argument("-save_lattice_file", default=None,
                        help="also emit pruned word lattices (kaldi text)")
    parser.add_argument("-save_lattice_ark", default=None,
                        help="also emit Kaldi BINARY CompactLattice ark "
                             "(+ .scp next to it)")
    parser.add_argument("-save_slf", default=None,
                        help="also emit HTK SLF lattices (file or dir)")
    parser.add_argument("-device_search", action="store_true",
                        help="run the graph search ON the accelerator "
                             "(batched XLA Viterbi, decode/device_latgen) "
                             "instead of the host token-passing decoder; "
                             "best-path output only (no lattice emit)")
    parser.add_argument("-device_batch", type=int, default=8,
                        help="utterances per device dispatch with "
                             "-device_search")
    parser.add_argument("-device_mode", default="auto",
                        choices=["auto", "dense", "frontier"],
                        help="device decoder flavor with -device_search: "
                             "dense full-state-table Viterbi, top-K "
                             "frontier search, or size-based auto pick")
    opt = parser.parse_args(argv)

    if opt.device_search and (opt.save_lattice_file or opt.save_slf
                              or opt.save_lattice_ark):
        parser.error("-device_search emits best paths only; drop the "
                     "lattice outputs or use the host decoder")

    from pytorch_kaldi_asr_tpu.fst.openfst_io import read_fst

    # read_fst accepts both VectorFst and ConstFst HLG graphs
    graph = read_fst(os.path.join(opt.graph_dir, "HLG.fst"))
    word_syms = read_symbol_table(os.path.join(opt.graph_dir, "words.txt"))
    log_priors = np.load(opt.priors_file) if opt.priors_file else None

    kind, path = opt.rspecifier.split(":", 1)
    reader = read_mat_scp(path) if kind == "scp" else read_mat_ark(path)

    n = 0
    if opt.save_lattice_file or opt.save_slf or opt.save_lattice_ark:
        from pytorch_kaldi_asr_tpu.decode.latgen import latgen_lattice
        from pytorch_kaldi_asr_tpu.decode.lattice_io import write_slf_file

        id2word = {v: k for k, v in word_syms.items()}
        lats = []
        with open(opt.save_result_file, "w", encoding="utf-8") as f:
            for key, mat in reader:
                lat = latgen_lattice(
                    graph, mat, acoustic_scale=opt.acoustic_scale,
                    beam=opt.beam, lattice_beam=opt.lattice_beam,
                    max_active=opt.max_active, log_priors=log_priors,
                    id2word=id2word, utt=key,
                )
                if lat is None:
                    f.write(f"{key} \n")
                    continue
                words, _ = lat.best_path()
                f.write(f"{key} {' '.join(words)}\n")
                lats.append(lat)
                n += 1
        if opt.save_lattice_file:
            with open(opt.save_lattice_file, "w", encoding="utf-8") as f:
                for lat in lats:
                    f.write(f"{lat.utt}\n")
                    lat.write_kaldi_text(f)
                    f.write("\n")
        if opt.save_lattice_ark:
            from pytorch_kaldi_asr_tpu.fst.openfst_io import write_lattice_ark

            write_lattice_ark(lats, opt.save_lattice_ark, word_syms,
                              scp_path=opt.save_lattice_ark + ".scp")
        if opt.save_slf:
            write_slf_file(lats, opt.save_slf)
    else:
        if opt.device_search:
            from pytorch_kaldi_asr_tpu.decode.device_latgen import (
                decode_posterior_stream,
            )

            results = decode_posterior_stream(
                graph, reader, word_syms, batch_size=opt.device_batch,
                acoustic_scale=opt.acoustic_scale, beam=opt.beam,
                max_active=opt.max_active, log_priors=log_priors,
                mode=opt.device_mode,
            )
        else:
            results = decode_posterior_ark(
                graph, reader, word_syms,
                acoustic_scale=opt.acoustic_scale, beam=opt.beam,
                max_active=opt.max_active, log_priors=log_priors,
            )
        with open(opt.save_result_file, "w", encoding="utf-8") as f:
            for key, text, cost in results:
                f.write(f"{key} {text}\n")
                n += 1
    info("decoded %d utterances -> %s", n, opt.save_result_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
