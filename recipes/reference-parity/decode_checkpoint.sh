#!/usr/bin/env bash
# Decode ONE saved checkpoint of either parity leg through the identical
# stage-5 pipeline (decode -> shared-LM rescore sweep -> compute_wer).
#
# This powers the MATCHED-EPOCH parity protocol: when full-length training
# of both legs is infeasible (e.g. CPU-only sessions), pick the highest
# epoch BOTH legs have checkpointed, decode both with this script, and
# compare WER at identical step counts on the identical corpus.
#
# Usage:
#   DATA=<corpus>/data WORK=<leg workdir (has vocab.txt + lm.3k.gz)> \
#   MODEL=<checkpoint path> OUT=<decode output dir> SET=dev \
#   REF=0|1 bash decode_checkpoint.sh
#
# REF=1 runs the UNMODIFIED reference decode.py/rescore.py via run_ref.py
# (torch checkpoints); REF=0 runs this framework's recipes. LM scoring and
# WER always use the shared clones so both legs meet the same scorer.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:?corpus data/ dir}
WORK=${WORK:?leg workdir with vocab.txt + lm.3k.gz}
MODEL=${MODEL:?checkpoint path}
OUT=${OUT:?decode output dir}
SET=${SET:-dev}
REF=${REF:-0}
BEAM=${BEAM:-25}
NBEST=${NBEST:-10}
DEC_BATCH=${DEC_BATCH:-8}

if [ "$REF" = "1" ]; then
    DEC="python3 -u $HERE/run_ref.py decode.py"
    RES="python3 -u $HERE/run_ref.py rescore.py"
else
    DEC="python3 -u -m pytorch_kaldi_asr_tpu.recipes.decode"
    RES="python3 -u -m pytorch_kaldi_asr_tpu.recipes.rescore"
fi
PY="python3 -u -m"

mkdir -p "$OUT/scoring"
$DEC \
    -read_data_dir "$DATA/$SET" -read_vocab_file "$WORK/vocab.txt" \
    -load_model_file "$MODEL" \
    -max_token_seq_len 100 -batch_size "$DEC_BATCH" \
    -beam_size "$BEAM" -nbest "$NBEST" \
    -save_result_file "$OUT/decode.txt" > "$OUT/decode.log" 2>&1

$PY pytorch_kaldi_asr_tpu.recipes.score_lm \
    -decode_file "$OUT/decode.txt" -lm "$WORK/lm.3k.gz" \
    -save_score_file "$OUT/lm.score.txt"

$RES \
    -decode_file "$OUT/decode.txt" \
    -lm_score "$OUT/lm.score.txt" \
    -inv_weight_list 10,11,12,13,13.5,14,14.5,15,15.5,16,16.5,17,18,19,20,1000 \
    -save_dir "$OUT/scoring" > "$OUT/scoring/scoring.log" 2>&1

for f in "$OUT"/scoring/rescore_*; do
    case "$f" in *_wer) continue;; esac
    $PY pytorch_kaldi_asr_tpu.tools.compute_wer --mode=present \
        "ark:$DATA/$SET/text" "ark:$f" > "${f}_wer"
done
grep WER "$OUT"/scoring/*_wer | $PY pytorch_kaldi_asr_tpu.tools.best_wer \
    > "$OUT/result.txt"
echo "[$SET $(basename "$MODEL")] $(cat "$OUT/result.txt")"
