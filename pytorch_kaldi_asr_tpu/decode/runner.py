"""Dataset-level decoding: batches → beam search → n-best text file.

Output contract matches the reference exactly (decode.py:151-161): one line
``key\\tscore\\thyp words`` per n-best entry, where the hypothesis strips the
leading BOS and the final token (EOS when the hypothesis finished), and keys
repeat for n-best > 1 (the rescorer groups by key, rescore.py:36-43)."""

from __future__ import annotations

import numpy as np

from pytorch_kaldi_asr_tpu.decode.beam import beam_search
from pytorch_kaldi_asr_tpu.utils import constants
from pytorch_kaldi_asr_tpu.utils.logging import info


def _pick_search(cfg, use_cache):
    """KV-cached search when the decoder band is causal (it is in the
    recipe: (-10, 0)); the fixed-buffer search is the general fallback."""
    if use_cache and cfg.decoder_sub_sequence[1] == 0:
        from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search

        return fast_beam_search
    return beam_search


def nbest_from_result(result, nbest):
    """Extract per-utterance n-best (token_lists, scores) from a BeamResult.
    Lanes are already sorted by score."""
    tokens = np.asarray(result.tokens)
    scores = np.asarray(result.scores)
    lengths = np.asarray(result.lengths)
    out = []
    for b in range(tokens.shape[0]):
        hyps = []
        for lane in range(min(nbest, tokens.shape[1])):
            length = int(lengths[b, lane])
            seq = tokens[b, lane, :length].tolist()
            hyps.append((seq, float(scores[b, lane])))
        out.append(hyps)
    return out


def ids_to_words(ids, idx2word):
    return [idx2word.get(int(i), constants.UNK_WORD) for i in ids]


def decode_dataset(params, cfg, loader, word2idx, *, beam_size, nbest,
                   max_token_seq_len, save_result_file, use_cache=True,
                   quantize_weights=False, fusion=None):
    """Decode every batch of ``loader`` (mode='all') and write the n-best
    file.  Returns the number of lines written.  ``quantize_weights``
    serves weight-only int8 (ops/quant.py): the stored tree is int8 +
    per-channel scales, dequantized inside the jitted search.  ``fusion``
    = (lm_params, lm_cfg, lm_weight) decodes with per-step shallow fusion
    instead (decode/fusion.py)."""
    if nbest > beam_size:
        raise ValueError("nbest should not be larger than beam_size")
    if fusion is not None:
        from pytorch_kaldi_asr_tpu.decode.fusion import make_fused_search

        lm_params, lm_cfg, lm_weight = fusion
        search = make_fused_search(lm_params, lm_cfg, lm_weight,
                                   quantize=quantize_weights)
    else:
        search = _pick_search(cfg, use_cache)
    if quantize_weights:
        from pytorch_kaldi_asr_tpu.ops.quant import (
            quantize_tree,
            quantized_search_fn,
        )

        params, nq = quantize_tree(params)
        if fusion is None:
            # make_fused_search already owns the dequantizing jit
            search = quantized_search_fn(search)
        info("decoding with int8 weights (%d tensors quantized)", nq)
    idx2word = {index: word for word, index in word2idx.items()}
    lines = 0
    with open(save_result_file, "w", encoding="utf-8") as f:
        for batch in loader:
            result = search(
                params, cfg, batch.src, batch.src_mask,
                beam_size=beam_size, max_len=max_token_seq_len,
            )
            batch_nbest = nbest_from_result(result, nbest)
            lines += write_nbest(f, batch.keys, batch_nbest, idx2word,
                                 valid=batch.valid)
    info("decode results saved to %s (%d lines)", save_result_file, lines)
    return lines


def write_nbest(f, keys, batch_nbest, idx2word, valid=None):
    """Write n-best lines for one batch; skips loader-padded tail rows."""
    written = 0
    for i, (key, hyps) in enumerate(zip(keys, batch_nbest)):
        if valid is not None and not valid[i]:
            continue
        for seq, score in hyps:
            # strip BOS and the final token (EOS for finished hypotheses),
            # as the reference does (decode.py:157)
            words = ids_to_words(seq[1:-1], idx2word)
            f.write(f"{key}\t{score}\t{' '.join(words)}\n")
            written += 1
    return written
