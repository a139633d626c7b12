"""Pre-packed batch archives for corpora too large to preload in RAM.

Role of the reference's ``generate_archive.py`` + ``ArchiveBatchLoader``
(pytorch/utils/ArchiveBatchLoader.py:1-79, generate_archive.py:10-56): pack
padded (features, masks, labels) chunks to disk once, then stream them per
epoch.  Differences, TPU-first:

- archives are ``.npz`` arrays (portable, mmap-friendly) rather than torch
  pickles;
- every archive is padded to the same static shapes (recorded in a manifest)
  so iteration never changes the compiled train step;
- within-archive shuffling per epoch, like the reference (ArchiveBatchLoader
  .py:25-35), plus optional archive-order shuffling."""

from __future__ import annotations

import json
import os

import numpy as np

from pytorch_kaldi_asr_tpu.data import instances as instances_handler
from pytorch_kaldi_asr_tpu.data.loader import Batch, _round_up
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.utils.logging import info


def generate_archives(triples, out_dir, *, size_archive=512, src_pad=None,
                      tgt_pad=None, prefix="data"):
    """Pack (key, rxfilename_or_matrix, label_ids) triples into
    ``<out_dir>/<prefix><N>.archive.npz`` chunks + ``<prefix>.manifest.json``.
    Returns the manifest dict."""
    os.makedirs(out_dir, exist_ok=True)

    def load(ref):
        return ref if isinstance(ref, np.ndarray) else kaldi_io.read_mat(ref)

    if src_pad is None or tgt_pad is None:
        max_src = max_tgt = 0
        for _key, ref, label in triples:
            if src_pad is None:
                max_src = max(
                    max_src,
                    load(ref).shape[0] if isinstance(ref, np.ndarray)
                    else kaldi_io.mat_num_rows(ref),
                )
            max_tgt = max(max_tgt, len(label))
        src_pad = src_pad or _round_up(max_src, 8)
        tgt_pad = tgt_pad or _round_up(max_tgt, 8)

    paths = []
    for i in range(0, len(triples), size_archive):
        chunk = triples[i : i + size_archive]
        feats = [load(t[1]) for t in chunk]
        labels = [np.asarray(t[2], np.int32) for t in chunk]
        src, src_mask = instances_handler.pad_to_longest(feats, src_pad)
        tgt, tgt_mask = instances_handler.pad_to_longest(labels, tgt_pad)
        path = os.path.join(out_dir,
                            f"{prefix}{i // size_archive}.archive.npz")
        np.savez(
            path,
            keys=np.array([t[0] for t in chunk]),
            src=src.astype(np.float32),
            src_mask=src_mask,
            tgt=tgt.astype(np.int32),
            tgt_mask=tgt_mask,
        )
        paths.append(os.path.basename(path))
        info("archive %s saved (%d utterances)", path, len(chunk))

    manifest = {
        "archives": paths,
        "src_pad": int(src_pad),
        "tgt_pad": int(tgt_pad),
        "total": len(triples),
    }
    with open(os.path.join(out_dir, f"{prefix}.manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ArchiveBatchLoader:
    """Iterate fixed-shape batches from archives written by
    :func:`generate_archives`.  drop/all modes as in BatchLoader."""

    def __init__(self, archive_dir, batch_size, *, prefix="data",
                 mode="drop", seed=0, shuffle=True):
        if mode not in ("drop", "all"):
            raise ValueError("mode must be drop or all")
        with open(os.path.join(archive_dir, f"{prefix}.manifest.json")) as f:
            self.manifest = json.load(f)
        self.archive_dir = archive_dir
        self.batch_size = batch_size
        self.mode = mode
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0

    def __iter__(self):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch])
        )
        self.epoch += 1
        archives = list(self.manifest["archives"])
        if self.shuffle:
            rng.shuffle(archives)
        carry = None  # ragged remainder across archives ('all' mode tail)
        for name in archives:
            data = np.load(os.path.join(self.archive_dir, name),
                           allow_pickle=False)
            keys = data["keys"]
            order = np.arange(len(keys))
            if self.shuffle:
                rng.shuffle(order)
            arrays = (
                [str(k) for k in keys[order]],
                data["src"][order],
                data["src_mask"][order],
                data["tgt"][order],
                data["tgt_mask"][order],
            )
            if carry is not None:
                arrays = tuple(
                    c + a if isinstance(a, list)
                    else np.concatenate([c, a])
                    for c, a in zip(carry, arrays)
                )
                carry = None
            n = len(arrays[0])
            n_full = n // self.batch_size
            for b in range(n_full):
                s = b * self.batch_size
                yield self._batch(arrays, s, s + self.batch_size,
                                  self.batch_size)
            tail = n - n_full * self.batch_size
            if tail:
                carry = tuple(a[n_full * self.batch_size :] for a in arrays)
        if carry is not None and self.mode == "all":
            n = len(carry[0])
            reps = -(-self.batch_size // n)
            padded = tuple(
                (a * reps)[: self.batch_size] if isinstance(a, list)
                else np.concatenate([a] * reps)[: self.batch_size]
                for a in carry
            )
            yield self._batch(padded, 0, self.batch_size, n)

    @staticmethod
    def _batch(arrays, start, end, n_valid):
        keys, src, src_mask, tgt, tgt_mask = arrays
        valid = np.zeros(end - start, np.uint8)
        valid[:n_valid] = 1
        return Batch(
            keys=tuple(keys[start:end]),
            src=src[start:end],
            src_mask=src_mask[start:end],
            tgt=tgt[start:end],
            tgt_mask=tgt_mask[start:end],
            valid=valid,
        )
