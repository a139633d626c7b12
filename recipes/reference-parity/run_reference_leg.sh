#!/usr/bin/env bash
# Reference leg of the empirical PER/WER parity run (VERDICT.md "Next round" #1).
#
# Runs the UNMODIFIED reference recipe stages (prepare_vocab ->
# initialize_model -> train -> decode -> rescore -> WER) on CPU via
# run_ref.py, with the same hyperparameters as the reference run.sh GPU path
# (run.sh:67-112, 155-164) except the epoch count, which is scaled with the
# corpus (env EPOCHS).  LM training/scoring and WER use this framework's
# SRILM/compute-wer clones so BOTH legs share the exact same LM and scorer.
#
# Usage: DATA=<corpus>/data WORK=<workdir> EPOCHS=150 bash run_reference_leg.sh
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:?set DATA to the corpus data/ dir}
WORK=${WORK:?set WORK to the reference-leg work dir}
EPOCHS=${EPOCHS:-150}
BATCH=${BATCH:-100}
BEAM=${BEAM:-25}
NBEST=${NBEST:-10}
DEC_BATCH=${DEC_BATCH:-8}
RUNREF="python3 -u $HERE/run_ref.py"

mkdir -p "$WORK"
cd "$WORK"

echo "[stage 1] vocab"
$RUNREF prepare_vocab.py -read_instances_file "$DATA/train/text" \
    -save_vocab_file vocab.txt -min_word_count 1

echo "[stage 2] 3-gram LM (shared clone of SRILM ngram-count)"
python3 -u -m pytorch_kaldi_asr_tpu.recipes.train_lm \
    -text "$DATA/train/text" -order 3 -lm lm.3k.gz

echo "[stage 3] initialize_model (reference run.sh:71-91 hyperparameters)"
$RUNREF initialize_model.py \
    -read_feats_scp_file "$DATA/train/feats.scp" \
    -lda_mat_file "$DATA/lda.mat" \
    -read_vocab_file vocab.txt \
    -encoder_max_len 500 -decoder_max_len 100 -src_fold 1 \
    -encoder_sub_sequence '(-100,0)' -decoder_sub_sequence '(-10,0)' \
    -en_layers 3 -de_layers 3 -n_head 2 \
    -en_d_model 256 -de_d_model 128 -d_k 64 -d_v 64 \
    -en_dropout 0.35 -de_dropout 0.35 \
    -save_model_file model.init

echo "[stage 4] train ($EPOCHS epochs, batch $BATCH)"
$RUNREF train.py \
    -read_train_dir "$DATA/train" -read_dev_dir "$DATA/dev" \
    -read_test_dir "$DATA/test" -read_vocab_file vocab.txt \
    -load_model_file model.init -save_model_dir . \
    -seq_error_prob 0 -optim_start_lr 0.001 -optim_soft_coefficient 25000 \
    -epoch "$EPOCHS" -batch_size "$BATCH" -save_interval 1 > train.log 2>&1
tail -3 train.log

model_file=$(ls -dt combined.accu*.torch | head -1)
echo "[stage 5] decode with $model_file (beam $BEAM, nbest $NBEST)"
for dir in dev test; do
    decode_dir=decode_${dir}
    mkdir -p "$decode_dir/scoring"
    $RUNREF decode.py \
        -read_data_dir "$DATA/$dir" -read_vocab_file vocab.txt \
        -load_model_file "$model_file" \
        -max_token_seq_len 100 -batch_size "$DEC_BATCH" \
        -beam_size "$BEAM" -nbest "$NBEST" \
        -save_result_file "$decode_dir/decode.txt" > "$decode_dir/decode.log" 2>&1

    python3 -u -m pytorch_kaldi_asr_tpu.recipes.score_lm \
        -decode_file "$decode_dir/decode.txt" -lm lm.3k.gz \
        -save_score_file "$decode_dir/lm.3k.score.txt"

    $RUNREF rescore.py \
        -decode_file "$decode_dir/decode.txt" \
        -lm_score "$decode_dir/lm.3k.score.txt" \
        -inv_weight_list 10,11,12,13,13.5,14,14.5,15,15.5,16,16.5,17,18,19,20,1000 \
        -save_dir "$decode_dir/scoring" > "$decode_dir/scoring/scoring.log"

    for f in "$decode_dir"/scoring/rescore_*; do
        case "$f" in *_wer) continue;; esac
        python3 -m pytorch_kaldi_asr_tpu.tools.compute_wer --mode=present \
            "ark:$DATA/$dir/text" "ark:$f" > "${f}_wer"
    done
    grep WER "$decode_dir"/scoring/*_wer | \
        python3 -m pytorch_kaldi_asr_tpu.tools.best_wer > "$decode_dir/result.txt"
    echo "[$dir] $(cat "$decode_dir/result.txt")"
done
echo "[done] reference leg complete"
