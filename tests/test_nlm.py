"""Neural LM rescoring (models/nlm.py + recipes/train_nlm.py +
recipes/score_lm.py -nlm_model_dir): the rnnlm_compute_scores.sh role."""

import os

import numpy as np
import pytest

VOCAB = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3,
         "the": 4, "cat": 5, "sat": 6, "dog": 7, "ran": 8}


def _corpus(n=200, seed=0):
    """Deterministic bigram-ish corpus: 'the cat sat' / 'the dog ran'."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(["the", "cat", "sat"] if rng.random() < 0.5
                   else ["the", "dog", "ran"])
    return out


def _write_vocab(path):
    with open(path, "w", encoding="utf-8") as f:
        for w, i in VOCAB.items():
            f.write(f"{w} {i}\n")


def _write_text(path, sentences):
    with open(path, "w", encoding="utf-8") as f:
        for i, s in enumerate(sentences):
            f.write(f"utt{i:04d} {' '.join(s)}\n")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from pytorch_kaldi_asr_tpu.recipes.train_nlm import train_nlm

    tmp = tmp_path_factory.mktemp("nlm")
    _write_vocab(tmp / "vocab.txt")
    _write_text(tmp / "text", _corpus())
    params, cfg, ppl = train_nlm(
        str(tmp / "text"), str(tmp / "vocab.txt"), str(tmp / "nlm"),
        epochs=8, batch_size=32, d_model=32, layers=1, n_head=2,
        max_len=8, dropout=0.0, lr=0.01)
    return tmp, params, cfg, ppl


def test_nlm_learns_the_corpus(trained):
    _tmp, _params, _cfg, ppl = trained
    # the corpus is near-deterministic (one binary choice per sentence):
    # a trained LM should be far below the uniform-9-vocab ppl of 9
    assert ppl < 3.5, ppl


def test_nlm_scores_prefer_in_domain(trained):
    from pytorch_kaldi_asr_tpu.models.nlm import score_sentences

    _tmp, params, cfg, _ppl = trained
    scores = score_sentences(
        params, cfg,
        [["the", "cat", "sat"], ["sat", "the", "cat"],
         ["the", "dog", "ran"], ["ran", "dog", "the"]],
        VOCAB, batch_size=4)
    assert all(np.isfinite(s) and s < 0 for s in scores)
    assert scores[0] > scores[1] + 1.0  # in-domain wins by >= 1 log10
    assert scores[2] > scores[3] + 1.0


def test_nlm_scoring_batches_are_order_preserving(trained):
    from pytorch_kaldi_asr_tpu.models.nlm import score_sentences

    _tmp, params, cfg, _ppl = trained
    sents = _corpus(7, seed=3)  # ragged tail vs batch_size=4
    one = score_sentences(params, cfg, sents, VOCAB, batch_size=4)
    alls = score_sentences(params, cfg, sents, VOCAB, batch_size=7)
    np.testing.assert_allclose(one, alls, rtol=1e-5)


def test_nlm_scoring_never_truncates_long_hypotheses(trained):
    """A hypothesis longer than the LM's trained max_len must score ALL
    its words (positions extrapolate): with the old prefix truncation the
    long sentence scored the same as its truncated prefix, silently
    biasing rescoring toward long hypotheses."""
    from pytorch_kaldi_asr_tpu.models.nlm import score_sentences

    _tmp, params, cfg, _ppl = trained
    assert cfg.decoder_max_len == 8
    prefix = ["the", "cat", "sat"]
    long = prefix + ["the", "dog", "ran"] * 12  # 39 words >> max_len-2
    s_prefix, s_long = score_sentences(params, cfg, [prefix, long], VOCAB)
    assert s_long < s_prefix - 5.0  # every extra word scored, not dropped


def test_score_lm_nlm_cli_line_aligned_and_rescorable(trained, tmp_path):
    # CLIs invoked in-process through their argparse main()s — the same
    # surface a shell gets, without two fresh-interpreter jax imports
    # (this was a 45 s subprocess test in the round-4 budget audit)
    from pytorch_kaldi_asr_tpu.recipes import rescore, score_lm

    tmp, _params, _cfg, _ppl = trained
    decode = tmp_path / "decode.txt"
    with open(decode, "w", encoding="utf-8") as f:
        f.write("utt1\t-1.0\tthe cat sat\n")
        f.write("utt1\t-0.9\tsat the cat\n")
        f.write("utt2\t-1.2\tthe dog ran\n")
    rc = score_lm.main(
        ["-decode_file", str(decode),
         "-nlm_model_dir", str(tmp / "nlm"),
         "-read_vocab_file", str(tmp / "vocab.txt"),
         "-save_score_file", str(tmp_path / "nlm.score.txt")])
    assert not rc
    scores = (tmp_path / "nlm.score.txt").read_text().splitlines()
    assert len(scores) == 3  # line-aligned with the n-best input
    vals = [float(s) for s in scores]
    assert all(np.isfinite(v) for v in vals)
    assert vals[0] > vals[1]  # the LM prefers the grammatical hypothesis

    # the standard rescorer consumes the neural scores unchanged
    rc = rescore.main(
        ["-decode_file", str(decode),
         "-lm_score", str(tmp_path / "nlm.score.txt"),
         "-inv_weight_list", "1",
         "-save_dir", str(tmp_path)])
    assert not rc
    rescored = [p for p in os.listdir(tmp_path) if p.startswith("rescore")]
    assert rescored
    body = (tmp_path / rescored[0]).read_text()
    assert "the cat sat" in body  # NLM flipped the near-tie to grammatical


def test_score_lm_rejects_ambiguous_flags(tmp_path):
    from pytorch_kaldi_asr_tpu.recipes import score_lm

    with pytest.raises(SystemExit):
        score_lm.main(["-decode_file", "x", "-save_score_file", "y"])
    with pytest.raises(SystemExit):
        score_lm.main(["-decode_file", "x", "-save_score_file", "y",
                       "-lm", "a", "-nlm_model_dir", "b"])
