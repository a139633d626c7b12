"""Tests for the static-shape BatchLoader."""

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.data.loader import BatchLoader, build_triples
from pytorch_kaldi_asr_tpu.io import kaldi_io


def _make_triples(n, dim=5, seed=0):
    rng = np.random.default_rng(seed)
    triples = []
    for i in range(n):
        feat = rng.normal(size=(int(rng.integers(3, 12)), dim)).astype(np.float32)
        label = np.array([2] + list(rng.integers(4, 10, size=rng.integers(1, 5))) + [3])
        triples.append((f"utt{i:03d}", feat, label))
    return triples


def test_static_shapes_across_batches():
    loader = BatchLoader(_make_triples(10), batch_size=3, mode="drop")
    shapes = {(b.src.shape, b.tgt.shape) for b in loader}
    assert len(shapes) == 1  # single compiled shape per epoch
    assert len(list(loader)) == 3  # 10 // 3, tail dropped


def test_all_mode_pads_tail_with_valid_mask():
    loader = BatchLoader(_make_triples(10), batch_size=3, mode="all", shuffle=False)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[-1].valid.sum() == 1  # one real utterance in the tail
    assert all(b.src.shape == batches[0].src.shape for b in batches)


def test_epoch_shuffling_changes_order_deterministically():
    loader = BatchLoader(_make_triples(9), batch_size=3, seed=42)
    first = [b.keys for b in loader]
    second = [b.keys for b in loader]
    assert first != second  # new epoch, new permutation
    loader2 = BatchLoader(_make_triples(9), batch_size=3, seed=42)
    assert [b.keys for b in loader2] == first  # same seed, same epoch → same


def test_masks_match_lengths():
    triples = _make_triples(4)
    loader = BatchLoader(triples, batch_size=4, mode="all", shuffle=False)
    batch = next(iter(loader))
    lens = {t[0]: len(t[1]) for t in triples}
    for i, key in enumerate(batch.keys):
        assert batch.src_mask[i].sum() == lens[key]


def test_build_triples_joins_and_drops_unmatched(tmp_path):
    mats = {"a": np.ones((3, 2), np.float32), "b": np.ones((2, 2), np.float32)}
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    (tmp_path / "text").write_text("a hello world\nc orphan\n")
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "hello": 4, "world": 5}
    triples = build_triples(str(scp), str(tmp_path / "text"), vocab)
    assert len(triples) == 1  # 'b' has no text, 'c' has no feats
    key, rx, label = triples[0]
    assert key == "a"
    np.testing.assert_array_equal(label, [2, 4, 5, 3])  # BOS hello world EOS


def test_lazy_loading(tmp_path):
    mats = {f"u{i}": np.full((i + 2, 3), i, np.float32) for i in range(5)}
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    triples = [
        (k, rx, np.array([2, 4, 3])) for k, rx in kaldi_io.scp_entries(str(scp))
    ]
    loader = BatchLoader(triples, batch_size=2, pre_load=False, shuffle=False)
    batch = next(iter(loader))
    assert batch.src.shape[0] == 2
    np.testing.assert_array_equal(
        batch.src[0][: mats[batch.keys[0]].shape[0]], mats[batch.keys[0]]
    )


def test_bucketed_loader_shapes_and_coverage():
    triples = _make_triples(24, seed=5)
    loader = BatchLoader(triples, batch_size=4, mode="all", shuffle=False,
                         num_buckets=3)
    batches = list(loader)
    pads = {b.src.shape[1] for b in batches}
    assert len(pads) > 1  # different buckets, different static lengths
    assert max(pads) == loader.src_pad
    # every utterance appears exactly once among valid rows
    keys = [k for b in batches for k, v in zip(b.keys, b.valid) if v]
    assert sorted(keys) == sorted(t[0] for t in triples)
    # shapes are stable across epochs
    pads2 = {b.src.shape[1] for b in loader}
    assert pads2 == pads


def test_bucketed_loader_reduces_padding():
    rng = np.random.default_rng(7)
    triples = []
    for i in range(16):
        n = 8 if i < 8 else 64  # bimodal lengths
        triples.append((f"u{i:02d}", rng.normal(size=(n, 3)).astype(np.float32),
                        np.array([2, 4, 3])))
    flat = BatchLoader(triples, batch_size=4, shuffle=False)
    bucketed = BatchLoader(triples, batch_size=4, shuffle=False,
                           num_buckets=2)
    flat_cells = sum(b.src.shape[1] for b in flat)
    buck_cells = sum(b.src.shape[1] for b in bucketed)
    assert buck_cells < flat_cells * 0.7


def _batches_equal(a, b):
    assert a.keys == b.keys
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.src_mask, b.src_mask)
    np.testing.assert_array_equal(a.tgt, b.tgt)
    np.testing.assert_array_equal(a.tgt_mask, b.tgt_mask)
    np.testing.assert_array_equal(a.valid, b.valid)


@pytest.mark.parametrize("mode", ["drop", "all"])
def test_parallel_workers_identical_content_and_order(mode):
    """num_workers > 1 must change ONLY wall-clock: content and order are
    pinned equal to the single-worker path, both epochs."""
    solo = BatchLoader(_make_triples(23), batch_size=4, mode=mode,
                       seed=9, num_buckets=2)
    par = BatchLoader(_make_triples(23), batch_size=4, mode=mode,
                      seed=9, num_buckets=2, num_workers=4)
    for _ in range(2):  # two epochs: fresh permutation each
        for a, b in zip(list(solo), list(par), strict=True):
            _batches_equal(a, b)


def test_parallel_workers_lazy_ark_reads(tmp_path):
    """The lazy (pre_load=False) path parses arks INSIDE the worker
    threads — each read opens its own handle, so results stay identical."""
    rng = np.random.default_rng(3)
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.open_writer(f"ark,scp:{ark},{scp}") as w:
        for i in range(12):
            w.write(f"u{i:02d}",
                    rng.normal(size=(3 + i, 4)).astype(np.float32))
    refs = dict(kaldi_io.scp_entries(str(scp)))
    triples = [(k, refs[k], np.array([2, 5, 3])) for k in sorted(refs)]
    solo = BatchLoader(triples, batch_size=4, mode="all", seed=1,
                       pre_load=False)
    par = BatchLoader(triples, batch_size=4, mode="all", seed=1,
                      pre_load=False, num_workers=3)
    for a, b in zip(list(solo), list(par), strict=True):
        _batches_equal(a, b)


def test_parallel_workers_early_consumer_exit():
    """Abandoning the iterator mid-epoch must not wedge the pool."""
    par = BatchLoader(_make_triples(40), batch_size=4, num_workers=4)
    it = iter(par)
    next(it)
    it.close()  # GeneratorExit path shuts the executor down cleanly


def test_parallel_workers_propagate_errors(tmp_path):
    """A worker failing to parse its ark must surface the exception to
    the consumer (ordered .result() re-raises), not hang or drop data."""
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.open_writer(f"ark,scp:{ark},{scp}") as w:
        w.write("good", np.zeros((4, 3), np.float32))
        w.write("bad", np.ones((6, 3), np.float32))
    refs = dict(kaldi_io.scp_entries(str(scp)))
    triples = [("good", refs["good"], np.array([2, 3])),
               ("bad", refs["bad"], np.array([2, 3]))]
    # truncate the SECOND matrix's body: header (what init reads for
    # lengths) stays intact, the worker's full read fails
    data = ark.read_bytes()
    ark.write_bytes(data[:-20])
    par = BatchLoader(triples, batch_size=1, mode="all", shuffle=False,
                      pre_load=False, num_workers=2)
    with pytest.raises(Exception):
        list(par)
