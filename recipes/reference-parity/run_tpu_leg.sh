#!/usr/bin/env bash
# TPU-framework leg of the empirical PER/WER parity run.
#
# Identical corpus, identical hyperparameters, identical shared LM and
# scorer as run_reference_leg.sh — only the framework differs.
#
# Usage: DATA=<corpus>/data WORK=<workdir> EPOCHS=150 bash run_tpu_leg.sh
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:?set DATA to the corpus data/ dir}
WORK=${WORK:?set WORK to the tpu-leg work dir}
EPOCHS=${EPOCHS:-150}
BATCH=${BATCH:-100}
BEAM=${BEAM:-25}
NBEST=${NBEST:-10}
DEC_BATCH=${DEC_BATCH:-8}
SEED=${SEED:-0}   # init + train seed (seed-variance studies)
INIT_COMPAT=${INIT_COMPAT:-native}  # 'torch' = reference's exact init dists
PY="python3 -u -m"

mkdir -p "$WORK"
cd "$WORK"

# RESUME=1: stages are skipped when their artifact exists and train
# continues from the newest epoch checkpoint — lets a supervisor restart
# a leg across TPU-tunnel flaps losing at most one epoch.
RESUME=${RESUME:-0}

echo "[stage 1] vocab"
[ "$RESUME" = 1 ] && [ -s vocab.txt ] || \
$PY pytorch_kaldi_asr_tpu.recipes.prepare_vocab \
    -read_instances_file "$DATA/train/text" \
    -save_vocab_file vocab.txt -min_word_count 1

echo "[stage 2] 3-gram LM"
[ "$RESUME" = 1 ] && [ -s lm.3k.gz ] || \
$PY pytorch_kaldi_asr_tpu.recipes.train_lm \
    -text "$DATA/train/text" -order 3 -lm lm.3k.gz

echo "[stage 3] initialize_model"
[ "$RESUME" = 1 ] && [ -s model.init/params.msgpack ] || \
$PY pytorch_kaldi_asr_tpu.recipes.initialize_model \
    -read_feats_scp_file "$DATA/train/feats.scp" \
    -lda_mat_file "$DATA/lda.mat" \
    -read_vocab_file vocab.txt \
    -encoder_max_len 500 -decoder_max_len 100 -src_fold 1 \
    -encoder_sub_sequence '(-100,0)' -decoder_sub_sequence '(-10,0)' \
    -en_layers 3 -de_layers 3 -n_head 2 \
    -en_d_model 256 -de_d_model 128 -d_k 64 -d_v 64 \
    -en_dropout 0.35 -de_dropout 0.35 \
    -seed "$SEED" -init_compat "$INIT_COMPAT" \
    -save_model_file model.init

echo "[stage 4] train ($EPOCHS epochs, batch $BATCH, seed $SEED)"
RESUME_FLAG=""
[ "$RESUME" = 1 ] && RESUME_FLAG="-resume"
# a combined.accu* checkpoint only exists once train+combine completed —
# skip the whole stage then (zero-epoch fast-forward still re-runs the
# 25-model combine sweep, minutes of chip time per flap retry)
[ "$RESUME" = 1 ] && ls combined.accu* >/dev/null 2>&1 || \
$PY pytorch_kaldi_asr_tpu.recipes.train \
    -read_train_dir "$DATA/train" -read_dev_dir "$DATA/dev" \
    -read_test_dir "$DATA/test" -read_vocab_file vocab.txt \
    -load_model_file model.init -save_model_dir . \
    -seq_error_prob 0 -optim_start_lr 0.001 -optim_soft_coefficient 25000 \
    -seed "$SEED" $RESUME_FLAG \
    -epoch "$EPOCHS" -batch_size "$BATCH" -save_interval 1 >> train.log 2>&1
tail -3 train.log

# newest combined checkpoint (robust to leftovers from an earlier run
# in the same work dir — `ls -d` with two matches mangles the path)
model_file=$(ls -dt combined.accu* | head -1)
echo "[stage 5] decode with $model_file (beam $BEAM, nbest $NBEST)"
for dir in dev test; do
    decode_dir=decode_${dir}
    # result.txt is the split's terminal artifact; skip the split on a
    # RESUME retry (flap tolerance: don't redo an 8-minute decode)
    if [ "$RESUME" = 1 ] && [ -s "$decode_dir/result.txt" ]; then
        echo "[$dir] (resume) $(cat "$decode_dir/result.txt")"
        continue
    fi
    mkdir -p "$decode_dir/scoring"
    $PY pytorch_kaldi_asr_tpu.recipes.decode \
        -read_data_dir "$DATA/$dir" -read_vocab_file vocab.txt \
        -load_model_file "$model_file" \
        -max_token_seq_len 100 -batch_size "$DEC_BATCH" \
        -beam_size "$BEAM" -nbest "$NBEST" \
        -save_result_file "$decode_dir/decode.txt" > "$decode_dir/decode.log" 2>&1

    $PY pytorch_kaldi_asr_tpu.recipes.score_lm \
        -decode_file "$decode_dir/decode.txt" -lm lm.3k.gz \
        -save_score_file "$decode_dir/lm.3k.score.txt"

    $PY pytorch_kaldi_asr_tpu.recipes.rescore \
        -decode_file "$decode_dir/decode.txt" \
        -lm_score "$decode_dir/lm.3k.score.txt" \
        -inv_weight_list 10,11,12,13,13.5,14,14.5,15,15.5,16,16.5,17,18,19,20,1000 \
        -save_dir "$decode_dir/scoring" > "$decode_dir/scoring/scoring.log"

    for f in "$decode_dir"/scoring/rescore_*; do
        case "$f" in *_wer) continue;; esac
        $PY pytorch_kaldi_asr_tpu.tools.compute_wer --mode=present \
            "ark:$DATA/$dir/text" "ark:$f" > "${f}_wer"
    done
    grep WER "$decode_dir"/scoring/*_wer | \
        $PY pytorch_kaldi_asr_tpu.tools.best_wer > "$decode_dir/result.txt"
    echo "[$dir] $(cat "$decode_dir/result.txt")"
done
echo "[done] tpu leg complete"
