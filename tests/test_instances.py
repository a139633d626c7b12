"""Tests for vocab/text/pad handling (reference instances_handler semantics)."""

import numpy as np

from pytorch_kaldi_asr_tpu.data import instances as ih
from pytorch_kaldi_asr_tpu.utils import constants


def test_build_vocab_deterministic_sorted():
    instances = {"u1": ["the", "cat", "sat"], "u2": ["the", "dog"]}
    vocab = ih.build_vocab(instances)
    # reserved ids
    assert vocab[constants.PAD_WORD] == 0
    assert vocab[constants.UNK_WORD] == 1
    assert vocab[constants.BOS_WORD] == 2
    assert vocab[constants.EOS_WORD] == 3
    # sorted unique words get ids 4.. in sorted order
    assert vocab["cat"] == 4
    assert vocab["dog"] == 5
    assert vocab["sat"] == 6
    assert vocab["the"] == 7


def test_build_vocab_min_word_count():
    instances = {"u1": ["a", "a", "b"]}
    vocab = ih.build_vocab(instances, min_word_count=1)
    assert "a" in vocab and "b" not in vocab


def test_vocab_roundtrip(tmp_path):
    vocab = ih.build_vocab({"u": ["x", "y"]})
    path = tmp_path / "vocab.txt"
    ih.save_vocab(vocab, str(path))
    assert ih.read_vocab(str(path)) == vocab


def test_apply_vocab_unk_fallback():
    vocab = ih.build_vocab({"u": ["x"]})
    out = ih.apply_vocab({"u": ["x", "zzz"]}, vocab, "word2idx")
    assert out["u"][0] == vocab["x"]
    assert out["u"][1] == constants.UNK


def test_add_control_words():
    out = ih.add_control_words({"u": ["w"]})
    assert out["u"][0] == constants.BOS_WORD
    assert out["u"][-1] == constants.EOS_WORD


def test_pad_to_longest_labels():
    data, mask = ih.pad_to_longest(
        [np.array([2, 5, 3]), np.array([2, 3])]
    )
    np.testing.assert_array_equal(data, [[2, 5, 3], [2, 3, 0]])
    np.testing.assert_array_equal(mask, [[1, 1, 1], [1, 1, 0]])


def test_pad_to_longest_features_static_len():
    f1 = np.ones((3, 2), dtype=np.float32)
    f2 = np.ones((1, 2), dtype=np.float32)
    data, mask = ih.pad_to_longest([f1, f2], max_len=8)
    assert data.shape == (2, 8, 2)
    assert mask.shape == (2, 8)
    assert mask[0].sum() == 3 and mask[1].sum() == 1
    assert (data[0, 3:] == 0).all()
