"""Golden-file and round-trip tests for the Kaldi ark/scp layer.

The binary fixtures are constructed byte-by-byte from the Kaldi wire format
specification (token + size-tagged int32 dims + row-major data), so these
tests pin our reader to the real on-disk format rather than to our own
writer."""

import struct

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.io import kaldi_io


def _kaldi_fm_bytes(key, mat):
    rows, cols = mat.shape
    return (
        key.encode() + b" \x00BFM "
        + b"\x04" + struct.pack("<i", rows)
        + b"\x04" + struct.pack("<i", cols)
        + mat.astype("<f4").tobytes()
    )


def test_read_mat_binary_golden(tmp_path):
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    ark = tmp_path / "x.ark"
    ark.write_bytes(_kaldi_fm_bytes("utt1", mat))
    # offset points at the \0B marker: len("utt1 ") = 5
    got = kaldi_io.read_mat(f"{ark}:5")
    np.testing.assert_array_equal(got, mat)


def test_read_mat_ark_multiple(tmp_path):
    m1 = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    m2 = np.random.default_rng(1).normal(size=(2, 3)).astype(np.float32)
    ark = tmp_path / "x.ark"
    ark.write_bytes(_kaldi_fm_bytes("a", m1) + _kaldi_fm_bytes("b", m2))
    got = dict(kaldi_io.read_mat_ark(str(ark)))
    assert set(got) == {"a", "b"}
    np.testing.assert_array_equal(got["a"], m1)
    np.testing.assert_array_equal(got["b"], m2)


def test_ark_writer_scp_roundtrip(tmp_path):
    mats = {
        "u1": np.random.default_rng(2).normal(size=(7, 13)).astype(np.float32),
        "u2": np.random.default_rng(3).normal(size=(4, 13)).astype(np.float32),
    }
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    got = dict(kaldi_io.read_mat_scp(str(scp)))
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])


def test_mat_num_rows_header_only(tmp_path):
    mat = np.zeros((123, 40), dtype=np.float32)
    ark, scp = tmp_path / "f.ark", tmp_path / "f.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp)) as w:
        w.write("u1", mat)
    (key, rx), = kaldi_io.scp_entries(str(scp))
    assert key == "u1"
    assert kaldi_io.mat_num_rows(rx) == 123


def test_double_matrix(tmp_path):
    mat = np.random.default_rng(4).normal(size=(3, 5))
    ark = tmp_path / "d.ark"
    with kaldi_io.ArkWriter(str(ark)) as w:
        w.write("u", mat)
    got = dict(kaldi_io.read_mat_ark(str(ark)))["u"]
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, mat)


def test_vector_roundtrip(tmp_path):
    vec = np.random.default_rng(5).normal(size=17).astype(np.float32)
    path = tmp_path / "v.ark"
    with kaldi_io.ArkWriter(str(path)) as w:
        w.write("v1", vec)
    f = open(path, "rb")
    f.read(3)  # "v1 "
    got = kaldi_io.read_vec_flt(f"{path}:3")
    np.testing.assert_array_equal(got, vec)


def test_compressed_matrix_cm2(tmp_path):
    """CM2: uint16 codes with global min/range."""
    rng = np.random.default_rng(6)
    mat = rng.normal(size=(6, 4)).astype(np.float32)
    mn, mx = float(mat.min()), float(mat.max())
    rg = mx - mn
    codes = np.round((mat - mn) / rg * 65535).astype("<u2")
    blob = (
        b"u \x00BCM2 "
        + struct.pack("<ff", mn, rg)
        + struct.pack("<ii", 6, 4)
        + codes.tobytes()
    )
    ark = tmp_path / "c.ark"
    ark.write_bytes(blob)
    got = dict(kaldi_io.read_mat_ark(str(ark)))["u"]
    assert np.abs(got - mat).max() < rg / 65535 + 1e-6


def test_compressed_matrix_cm1(tmp_path):
    """CM format 1: per-column percentile headers + uint8 codes."""
    num_rows, num_cols = 8, 2
    rng = np.random.default_rng(7)
    mat = rng.uniform(0, 10, size=(num_rows, num_cols)).astype(np.float32)
    mn, rg = 0.0, 10.0

    def to_u16(v):
        return int(np.clip(round((v - mn) / rg * 65535), 0, 65535))

    headers = []
    codes = []
    for c in range(num_cols):
        col = np.sort(mat[:, c])
        p0, p25, p75, p100 = col[0], col[2], col[5], col[-1]
        headers.append(
            struct.pack("<HHHH", to_u16(p0), to_u16(p25), to_u16(p75), to_u16(p100))
        )
        # encode each element against the [p0,p25,p75,p100] piecewise ranges
        u = lambda x: mn + rg * x / 65535.0
        q0, q25, q75, q100 = (u(to_u16(v)) for v in (p0, p25, p75, p100))
        col_codes = []
        for v in mat[:, c]:
            if v <= q25:
                c8 = round((v - q0) / max(q25 - q0, 1e-9) * 64)
                c8 = min(max(c8, 0), 64)
            elif v <= q75:
                c8 = 64 + round((v - q25) / max(q75 - q25, 1e-9) * 128)
                c8 = min(max(c8, 65), 192)
            else:
                c8 = 192 + round((v - q75) / max(q100 - q75, 1e-9) * 63)
                c8 = min(max(c8, 193), 255)
            col_codes.append(c8)
        codes.append(bytes(col_codes))
    blob = (
        b"u \x00BCM "
        + struct.pack("<ff", mn, rg)
        + struct.pack("<ii", num_rows, num_cols)
        + b"".join(headers)
        + b"".join(codes)
    )
    ark = tmp_path / "c1.ark"
    ark.write_bytes(blob)
    got = dict(kaldi_io.read_mat_ark(str(ark)))["u"]
    assert got.shape == (num_rows, num_cols)
    # one-byte codes over a 10-unit range: tolerance ~ range/64 per segment
    assert np.abs(got - mat).max() < 0.5


def test_text_matrix(tmp_path):
    path = tmp_path / "t.mat"
    path.write_text(" [\n  1 2 3\n  4 5 6 ]\n")
    got = kaldi_io.read_mat(str(path))
    np.testing.assert_array_equal(got, [[1, 2, 3], [4, 5, 6]])


def test_pipe_rxfilename(tmp_path):
    mat = np.ones((2, 2), dtype=np.float32)
    ark = tmp_path / "p.ark"
    with kaldi_io.ArkWriter(str(ark)) as w:
        w.write("u", mat)
    got = dict(kaldi_io.read_mat_ark(f"cat {ark} |"))["u"]
    np.testing.assert_array_equal(got, mat)


def test_compressed_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    mat = rng.normal(scale=5.0, size=(20, 13)).astype(np.float32)
    ark, scp = tmp_path / "c.ark", tmp_path / "c.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp), compress=True) as w:
        w.write("u1", mat)
    got = dict(kaldi_io.read_mat_scp(str(scp)))["u1"]
    rg = mat.max() - mat.min()
    assert np.abs(got - mat).max() <= rg / 65535 + 1e-6
    # compressed ark is roughly half the float32 size
    raw_size = mat.size * 4
    assert ark.stat().st_size < raw_size * 0.6
    # native reader decodes it identically
    from pytorch_kaldi_asr_tpu import native

    if native.available():
        (key, rx), = kaldi_io.scp_entries(str(scp))
        np.testing.assert_allclose(native.read_mat(rx), got, atol=1e-6)


def test_compressed_writer_cm1_roundtrip(tmp_path):
    """CM (default Kaldi method): per-column percentile headers.  The
    writer-encoded stream must decode within one piecewise-segment step
    per band, by both the Python and the native reader."""
    rng = np.random.default_rng(10)
    mat = rng.normal(scale=5.0, size=(40, 13)).astype(np.float32)
    ark, scp = tmp_path / "cm1.ark", tmp_path / "cm1.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp), compress="CM") as w:
        w.write("u1", mat)
    got = dict(kaldi_io.read_mat_scp(str(scp)))["u1"]
    assert got.shape == mat.shape
    # worst-case step: a tail band spanning (p25-p0) in 64 codes, plus the
    # uint16 percentile quantization itself
    rg = float(mat.max() - mat.min())
    per_col_err = np.abs(got - mat).max(axis=0)
    assert per_col_err.max() < rg / 60
    # column-header format stores codes column-major: ~1 byte/elem + headers
    assert ark.stat().st_size < mat.size * 1.5 + 13 * 8 + 64
    from pytorch_kaldi_asr_tpu import native

    if native.available():
        (key, rx), = kaldi_io.scp_entries(str(scp))
        np.testing.assert_allclose(native.read_mat(rx), got, atol=1e-6)


def test_compressed_writer_cm1_short_and_constant_columns(tmp_path):
    """CM edge cases: fewer than 5 rows (degenerate percentiles) and a
    constant column (forced one-step header separation)."""
    mat = np.array(
        [[1.0, 7.0], [1.0, 3.0], [1.0, 5.0]], dtype=np.float32
    )
    ark = tmp_path / "edge.ark"
    with kaldi_io.ArkWriter(str(ark), compress="CM") as w:
        w.write("u", mat)
    got = dict(kaldi_io.read_mat_ark(str(ark)))["u"]
    assert np.abs(got - mat).max() < 0.1


def test_compressed_writer_cm3_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    mat = rng.normal(scale=2.0, size=(25, 9)).astype(np.float32)
    ark, scp = tmp_path / "cm3.ark", tmp_path / "cm3.scp"
    with kaldi_io.ArkWriter(str(ark), str(scp), compress="CM3") as w:
        w.write("u1", mat)
    got = dict(kaldi_io.read_mat_scp(str(scp)))["u1"]
    rg = float(mat.max() - mat.min())
    assert np.abs(got - mat).max() <= rg / 255 + 1e-6
    assert ark.stat().st_size < mat.size * 1.2 + 64
    from pytorch_kaldi_asr_tpu import native

    if native.available():
        (key, rx), = kaldi_io.scp_entries(str(scp))
        np.testing.assert_allclose(native.read_mat(rx), got, atol=1e-6)


def test_compressed_writer_rejects_unknown_method(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        kaldi_io.ArkWriter(str(tmp_path / "x.ark"), compress="CM4")


def test_compressed_writer_cm1_empty_matrix(tmp_path):
    """0-row matrices must encode/decode without crashing (headers only)."""
    mat = np.zeros((0, 5), np.float32)
    ark = tmp_path / "e.ark"
    with kaldi_io.ArkWriter(str(ark), compress="CM") as w:
        w.write("u", mat)
    got = dict(kaldi_io.read_mat_ark(str(ark)))["u"]
    assert got.shape == (0, 5)


def test_ark_writer_stdout(tmp_path, capfdbinary):
    """wxfilename '-' writes the binary stream to stdout (and refuses an
    scp pair, which needs a seekable file)."""
    import pytest

    mat = np.ones((2, 3), np.float32)
    with kaldi_io.ArkWriter("-") as w:
        w.write("u", mat)
    out, _ = capfdbinary.readouterr()
    assert out.startswith(b"u \x00BFM ")
    with pytest.raises(ValueError):
        kaldi_io.ArkWriter("-", str(tmp_path / "x.scp"))
