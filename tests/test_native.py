"""Native C++ core tests: build, parity with the Python implementations, and
the CLI binary clones."""

import os
import subprocess

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu import native
from pytorch_kaldi_asr_tpu.io import kaldi_io

NATIVE_DIR = os.path.dirname(os.path.abspath(native.__file__))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        native.build()
    assert native.available()


def _python_read_mat(rx):
    """Force the pure-Python path (bypasses the native dispatch)."""
    f = kaldi_io.open_rx(rx)
    try:
        is_binary, peeked = kaldi_io._expect_binary(f)
        assert is_binary
        return kaldi_io._read_matrix_binary(f)
    finally:
        f.close()


def test_native_read_mat_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    mats = {f"u{i}": rng.normal(size=(int(rng.integers(3, 30)), 13)
                                ).astype(np.float32) for i in range(5)}
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    for key, rx in kaldi_io.scp_entries(str(scp)):
        np.testing.assert_array_equal(native.read_mat(rx), mats[key])
        np.testing.assert_array_equal(_python_read_mat(rx), mats[key])
        assert native.mat_shape(rx) == mats[key].shape


def test_native_edit_distance_matches_python():
    from pytorch_kaldi_asr_tpu.score import wer

    rng = np.random.default_rng(1)
    for _ in range(30):
        ref = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        hyp = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        got = native.edit_distance(np.array(ref, np.int32),
                                   np.array(hyp, np.int32))
        # naive O(nm) oracle
        import itertools

        n, m = len(ref), len(hyp)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            dp[i][0] = i
        for j in range(m + 1):
            dp[0][j] = j
        for i, j in itertools.product(range(1, n + 1), range(1, m + 1)):
            dp[i][j] = min(
                dp[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]),
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
            )
        assert got[0] == dp[n][m], (ref, hyp, got)
        # breakdown consistency: err = ins+del+sub
        assert got[0] == got[1] + got[2] + got[3]


def test_native_cmvn_matches_python():
    from pytorch_kaldi_asr_tpu.tools.cmvn import (
        accumulate_cmvn_stats,
        apply_cmvn_matrix,
    )

    rng = np.random.default_rng(2)
    mat = rng.normal(3.0, 2.0, size=(40, 6)).astype(np.float32)
    stats = np.zeros((2, 7), np.float64)
    native.cmvn_accumulate(mat, stats)
    py_stats = accumulate_cmvn_stats([("u", mat)])["u"]
    np.testing.assert_allclose(stats, py_stats, rtol=1e-10)
    np.testing.assert_allclose(
        native.cmvn_apply(mat, stats, norm_vars=True),
        apply_cmvn_matrix(mat, py_stats, norm_vars=True),
        atol=1e-5,
    )


def test_cli_feat_to_len(tmp_path):
    mats = {"a": np.zeros((7, 3), np.float32), "b": np.zeros((9, 3), np.float32)}
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    out = tmp_path / "feats.length"
    binary = os.path.join(NATIVE_DIR, "build", "pka-feat-to-len")
    subprocess.run([binary, f"scp:{scp}", f"ark,t:{out}"], check=True)
    assert out.read_text() == "a 7\nb 9\n"


def test_cli_compute_wer(tmp_path):
    (tmp_path / "ref").write_text("u1 a b c d\nu2 x y\n")
    (tmp_path / "hyp").write_text("u1 a b z d\n")
    binary = os.path.join(NATIVE_DIR, "build", "pka-compute-wer")
    proc = subprocess.run(
        [binary, "--mode=present", f"ark:{tmp_path}/ref",
         f"ark:{tmp_path}/hyp"],
        capture_output=True, text=True, check=True,
    )
    assert "%WER 25.00 [ 1 / 4, 0 ins, 0 del, 1 sub ]" in proc.stdout
    assert "1 sentences failed to be scored" in proc.stdout


def test_scan_ark_bulk(tmp_path):
    rng = np.random.default_rng(3)
    mats = {f"utt{i:03d}": rng.normal(size=(int(rng.integers(2, 9)), 4)
                                      ).astype(np.float32)
            for i in range(7)}
    ark = tmp_path / "s.ark"
    with kaldi_io.ArkWriter(str(ark)) as w:
        for k, m in mats.items():
            w.write(k, m)
    entries = native.scan_ark(str(ark))
    assert [k for k, _, _ in entries] == list(mats)
    for k, rows, cols in entries:
        assert (rows, cols) == mats[k].shape
    # buffer-growth path: force a tiny initial max_entries
    entries2 = native.scan_ark(str(ark), max_entries=2)
    assert entries2 == entries


def test_cli_feat_to_len_bad_output_path(tmp_path):
    mats = {"a": np.zeros((2, 2), np.float32)}
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    binary = os.path.join(NATIVE_DIR, "build", "pka-feat-to-len")
    proc = subprocess.run(
        [binary, f"scp:{scp}", f"ark,t:{tmp_path}/no_dir/out.length"],
        capture_output=True, text=True,
    )
    assert proc.returncode != 0
    assert "cannot open output" in proc.stderr
