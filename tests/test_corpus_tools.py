"""Unit tests for the synthetic corpus generators (fast path; the full
recipes exercise them end-to-end in the slow suite)."""

import numpy as np

from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.tools.make_librispeech_shaped import (
    WordModel,
    write_split,
)


def test_render_word_boundaries_consistent():
    m = WordModel(vocab_size=50, feat_dim=8, seed=1)
    rng = np.random.default_rng(0)
    words = m.sample_sentence(rng, 500)
    feats, ends = m.render(words, np.zeros(8, np.float32), rng)
    assert len(ends) == len(words)
    assert ends == sorted(ends)
    assert 0 < ends[-1] <= feats.shape[0]


def test_write_split_truncates_features_and_text_in_sync(tmp_path):
    """Utterances longer than max_frames are cut at a word boundary and the
    transcript is cut with them (features and text must stay in sync for
    the corpus to be decodable)."""
    m = WordModel(vocab_size=50, feat_dim=8, seed=1)
    d = str(tmp_path / "split")
    write_split(d, m, 12, spk_seed=3, utt_seed=4, max_frames=120)
    text = dict(
        line.split(None, 1)
        for line in open(f"{d}/text")
    )
    n_long = 0
    for key, mat in kaldi_io.read_mat_scp(f"{d}/feats.scp"):
        assert mat.shape[0] <= 120
        n_words = len(text[key].split())
        # rough decodability bound: ~2 phones minimum per word at >=2
        # frames per phone, plus leading silence — the transcript cannot
        # name more words than the features could possibly contain
        assert n_words * 4 <= mat.shape[0]
        if mat.shape[0] >= 115:
            n_long += 1
    assert n_long > 0, "fixture never hit the truncation path"
