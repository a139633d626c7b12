"""ctypes bindings to the native C++ core (libpka_native.so).

The C++ core accelerates the host-side hot paths — ark parsing, edit
distance, CMVN float work — mirroring where the reference leaned on external
Kaldi C++ binaries (SURVEY.md §2c).  Everything here has a pure-Python
equivalent elsewhere in the package; callers use :func:`available` and fall
back gracefully so the framework works without a compiler.

Build once with::

    make -C pytorch_kaldi_asr_tpu/native
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "build", "libpka_native.so")
_lib = None


def build(quiet=True):
    """Compile the native library and CLIs (requires g++/make)."""
    subprocess.run(
        ["make", "-C", _DIR],
        check=True,
        capture_output=quiet,
    )
    return _load()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pka_mat_shape.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pka_read_mat.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pka_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pka_cmvn_accumulate.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.pka_cmvn_apply.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    lib.pka_scan_ark.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pka_graph_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
        i32p, i32p, f64p, i32p, f64p,
    ]
    lib.pka_graph_create.restype = ctypes.c_void_p
    lib.pka_graph_destroy.argtypes = [ctypes.c_void_p]
    lib.pka_latgen_create.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        f64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
    ]
    lib.pka_latgen_create.restype = ctypes.c_void_p
    lib.pka_latgen_destroy.argtypes = [ctypes.c_void_p]
    lib.pka_latgen_reset.argtypes = [ctypes.c_void_p]
    lib.pka_latgen_push.argtypes = [ctypes.c_void_p, f64p, ctypes.c_int64,
                                    ctypes.c_int32]
    lib.pka_latgen_dead.argtypes = [ctypes.c_void_p]
    lib.pka_latgen_frames.argtypes = [ctypes.c_void_p]
    lib.pka_latgen_frames.restype = ctypes.c_int64
    lib.pka_latgen_partial.argtypes = [ctypes.c_void_p, i32p,
                                       ctypes.c_int64, f64p]
    lib.pka_latgen_partial.restype = ctypes.c_int64
    lib.pka_latgen_finish.argtypes = [ctypes.c_void_p, i32p, i32p,
                                      ctypes.c_int64, f64p]
    lib.pka_latgen_finish.restype = ctypes.c_int64
    lib.pka_latlat_create.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, f64p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pka_latlat_create.restype = ctypes.c_void_p
    lib.pka_latlat_destroy.argtypes = [ctypes.c_void_p]
    lib.pka_latlat_run.argtypes = [ctypes.c_void_p, f64p, ctypes.c_int64,
                                   ctypes.c_int32]
    lib.pka_latlat_n_nodes.argtypes = [ctypes.c_void_p]
    lib.pka_latlat_n_nodes.restype = ctypes.c_int64
    lib.pka_latlat_node_times.argtypes = [ctypes.c_void_p, i32p]
    lib.pka_latlat_n_links.argtypes = [ctypes.c_void_p]
    lib.pka_latlat_n_links.restype = ctypes.c_int64
    lib.pka_latlat_links.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                     f64p, f64p]
    lib.pka_latlat_n_finals.argtypes = [ctypes.c_void_p]
    lib.pka_latlat_n_finals.restype = ctypes.c_int64
    lib.pka_latlat_finals.argtypes = [ctypes.c_void_p, i32p, f64p]
    _lib = lib
    return lib


def available():
    return _load() is not None


def _require():
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native library not built — run `make -C "
            "pytorch_kaldi_asr_tpu/native` (callers should check "
            "native.available() and fall back to the Python path)"
        )
    return lib


def _split_offset(rxfilename):
    path, _, off = rxfilename.rpartition(":")
    if off.isdigit() and path:
        return path, int(off)
    return rxfilename, 0


def mat_shape(rxfilename):
    """(rows, cols) of a matrix at an rxfilename; header-only."""
    lib = _require()
    path, offset = _split_offset(rxfilename)
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.pka_mat_shape(path.encode(), offset, ctypes.byref(rows),
                           ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"native mat_shape failed for {rxfilename}")
    return rows.value, cols.value


def read_mat(rxfilename):
    """Matrix at an rxfilename as float32 numpy (all kinds incl CM*)."""
    lib = _require()
    rows, cols = mat_shape(rxfilename)
    out = np.empty((rows, cols), dtype=np.float32)
    path, offset = _split_offset(rxfilename)
    rc = lib.pka_read_mat(
        path.encode(), offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
    )
    if rc != 0:
        raise IOError(f"native read_mat failed for {rxfilename}")
    return out


def edit_distance(ref_ids, hyp_ids):
    """(errors, ins, dels, subs) over int32 token-id arrays."""
    lib = _require()
    ref = np.ascontiguousarray(ref_ids, dtype=np.int32)
    hyp = np.ascontiguousarray(hyp_ids, dtype=np.int32)
    err = ctypes.c_int32()
    ins = ctypes.c_int32()
    dels = ctypes.c_int32()
    subs = ctypes.c_int32()
    lib.pka_edit_distance(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
        hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp),
        ctypes.byref(err), ctypes.byref(ins), ctypes.byref(dels),
        ctypes.byref(subs),
    )
    return err.value, ins.value, dels.value, subs.value


def cmvn_accumulate(mat, stats):
    """Accumulate a float32 [rows, cols] matrix into stats [2, cols+1]
    float64 (in place)."""
    lib = _require()
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    assert stats.shape == (2, mat.shape[1] + 1) and stats.dtype == np.float64
    lib.pka_cmvn_accumulate(
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mat.shape[0], mat.shape[1],
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return stats


def scan_ark(path, max_entries=4096):
    """Header-only scan of a whole binary archive: [(key, rows, cols), ...]
    in file order — the bulk feat-to-len path with one file open instead of
    one per scp entry.  Grows the buffers and rescans if the archive holds
    more than ``max_entries`` (the C call cannot distinguish a full buffer
    from completion)."""
    lib = _require()
    while True:
        keys_buf = ctypes.create_string_buffer(max_entries * 64)
        rows = np.empty(max_entries, np.int32)
        cols = np.empty(max_entries, np.int32)
        count = lib.pka_scan_ark(
            path.encode(), keys_buf, len(keys_buf),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_entries,
        )
        if count < 0:
            raise IOError(f"native scan_ark failed for {path}")
        if count < max_entries:
            break
        max_entries *= 4  # buffer may have been exactly full — rescan
    keys = keys_buf.value.decode("utf-8").splitlines()
    return [(k, int(rows[i]), int(cols[i])) for i, k in enumerate(keys[:count])]


def cmvn_apply(mat, stats, norm_vars=False):
    """Normalized copy of a float32 matrix."""
    lib = _require()
    out = np.ascontiguousarray(mat, dtype=np.float32).copy()
    stats = np.ascontiguousarray(stats, dtype=np.float64)
    rc = lib.pka_cmvn_apply(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[0], out.shape[1],
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if norm_vars else 0,
    )
    if rc != 0:
        raise ValueError("cmvn_apply failed (zero frame count?)")
    return out
