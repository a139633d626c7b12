"""Lattice LM rescoring (tools/lattice_rescore.py — the Kaldi
steps/lmrescore role) and the component-carrying lattice n-best."""

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice
from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest
from pytorch_kaldi_asr_tpu.tools.lattice_rescore import rescore_hyps


def _two_way_lattice():
    """start -> {aa bb | cc dd} -> final (disjoint middle nodes, so
    exactly two paths); 'cc dd' is acoustically cheaper but (by
    construction in the tests) LM-dispreferred."""
    lat = WordLattice(node_times=[0, 1, 1, 2], links=[], finals={},
                      utt="u1")
    lat.add_link(0, 1, "aa", acoustic=2.0, graph=0.5)
    lat.add_link(1, 3, "bb", acoustic=2.0, graph=0.5)
    lat.add_link(0, 2, "cc", acoustic=1.0, graph=1.0)
    lat.add_link(2, 3, "dd", acoustic=1.0, graph=1.0)
    lat.finals[3] = 0.25
    return lat


def test_nbest_components_sum_to_total():
    lat = _two_way_lattice()
    hyps = nbest(lat, 4, with_components=True)
    assert [h[0] for h in hyps] == [["cc", "dd"], ["aa", "bb"]]
    for words, total, am, gr in hyps:
        assert total == pytest.approx(am + gr)  # unit scales
    # unscaled splits are exact
    assert hyps[0][2] == pytest.approx(2.0)    # cc+dd acoustic
    assert hyps[0][3] == pytest.approx(2.25)   # graph + final
    assert hyps[1][2] == pytest.approx(4.0)
    assert hyps[1][3] == pytest.approx(1.25)

    # acoustic_scale changes totals but NOT the reported raw components
    scaled = nbest(lat, 4, acoustic_scale=0.5, with_components=True)
    by_words = {tuple(w): (am, gr) for w, _t, am, gr in scaled}
    assert by_words[("aa", "bb")] == (pytest.approx(4.0),
                                      pytest.approx(1.25))


def test_rescore_hyps_flips_to_lm_preference():
    lat = _two_way_lattice()
    hyps = nbest(lat, 4, with_components=True)
    # the new LM strongly prefers 'aa bb' (low cost)
    lm_costs = [8.0 if h[0] == ["cc", "dd"] else 1.0 for h in hyps]
    best, cost = rescore_hyps(hyps, lm_costs, acoustic_scale=1.0,
                              graph_scale=0.0, lm_scale=1.0)[0]
    assert best == ["aa", "bb"]
    assert cost == pytest.approx(4.0 + 1.0)
    # with lm_scale 0 (and the old graph cost back) the acoustic winner
    # stays on top
    best0, _ = rescore_hyps(hyps, lm_costs, acoustic_scale=1.0,
                            graph_scale=1.0, lm_scale=0.0)[0]
    assert best0 == ["cc", "dd"]


def test_lattice_rescore_cli_with_nlm(tmp_path):
    """End to end: lattice ark -> NLM rescoring -> best transcripts."""
    from pytorch_kaldi_asr_tpu.fst.openfst_io import write_lattice_ark
    from pytorch_kaldi_asr_tpu.recipes.train_nlm import train_nlm
    from pytorch_kaldi_asr_tpu.tools import lattice_rescore

    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "aa": 4,
             "bb": 5, "cc": 6, "dd": 7}
    with open(tmp_path / "vocab.txt", "w") as f:
        for w, i in vocab.items():
            f.write(f"{w} {i}\n")
    with open(tmp_path / "words.txt", "w") as f:
        f.write("<eps> 0\n")
        for w in ("aa", "bb", "cc", "dd"):
            f.write(f"{w} {vocab[w] - 3}\n")
    with open(tmp_path / "text.lm", "w") as f:
        for i in range(60):
            f.write(f"utt{i} aa bb\n")
    train_nlm(str(tmp_path / "text.lm"), str(tmp_path / "vocab.txt"),
              str(tmp_path / "nlm"), epochs=6, batch_size=16, d_model=16,
              layers=1, n_head=2, max_len=8, dropout=0.0, lr=0.02)

    word2id = {"<eps>": 0, "aa": 1, "bb": 2, "cc": 3, "dd": 4}
    write_lattice_ark([_two_way_lattice()], str(tmp_path / "lat.ark"),
                      word2id)

    out = tmp_path / "best.txt"
    rc = lattice_rescore.main([
        "-words", str(tmp_path / "words.txt"),
        "-nlm_model_dir", str(tmp_path / "nlm"),
        "-read_vocab_file", str(tmp_path / "vocab.txt"),
        "-acoustic_scale", "0.1", "-lm_scale", "1.0",
        f"ark:{tmp_path / 'lat.ark'}", str(out),
    ])
    assert rc == 0
    # the NLM was trained on 'aa bb' only: rescoring must flip the
    # acoustically-cheaper 'cc dd' to the LM-preferred hypothesis
    assert out.read_text().strip() == "u1 aa bb"

    # graph-only re-rank (lm_scale 0, old graph restored): acoustic winner
    rc = lattice_rescore.main([
        "-words", str(tmp_path / "words.txt"),
        "-nlm_model_dir", str(tmp_path / "nlm"),
        "-read_vocab_file", str(tmp_path / "vocab.txt"),
        "-acoustic_scale", "1.0", "-graph_scale", "1.0",
        "-lm_scale", "0.0",
        f"ark:{tmp_path / 'lat.ark'}", str(out),
    ])
    assert rc == 0
    assert out.read_text().strip() == "u1 cc dd"
