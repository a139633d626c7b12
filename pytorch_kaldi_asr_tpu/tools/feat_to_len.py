"""feat-to-len clone: emit per-utterance frame counts.

Usage (same CLI contract as the Kaldi binary at reference run.sh:33)::

    python3 -m pytorch_kaldi_asr_tpu.tools.feat_to_len \
        scp:data/train/feats.scp ark,t:data/train/feats.length

Only matrix headers are decoded (no feature data is read); the C++ core in
pytorch_kaldi_asr_tpu/native provides the same scan for huge archives."""

import sys

from pytorch_kaldi_asr_tpu.io import kaldi_io


def feat_to_len(rspecifier, wspecifier=None):
    kind, _, path = kaldi_io.parse_specifier(rspecifier)
    if kind == "scp":
        lengths = {
            key: kaldi_io.mat_num_rows(rx)
            for key, rx in kaldi_io.scp_entries(path)
        }
    else:
        lengths = None
        try:  # bulk header-only C++ scan: one open, no matrix decode
            from pytorch_kaldi_asr_tpu import native

            if native.available() and not path.endswith("|") and path != "-":
                lengths = {
                    key: rows for key, rows, _cols in native.scan_ark(path)
                }
        except Exception:
            lengths = None
        if lengths is None:
            lengths = {
                key: mat.shape[0]
                for key, mat in kaldi_io.read_mat_ark(path)
            }
    if wspecifier is None:
        return lengths
    _, opts, out_path = kaldi_io.parse_specifier(wspecifier)
    kaldi_io.write_key_value_text(out_path, lengths)
    return lengths


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2:
        print("usage: feat_to_len <rspecifier> <wspecifier>", file=sys.stderr)
        return 1
    feat_to_len(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
