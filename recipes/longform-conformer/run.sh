#!/bin/bash
#------------------------------------------------------------
# Long-form hybrid recipe: SEQUENCE-PARALLEL Conformer AM training.
#
# The reference caps utterances at 500 frames and drops the rest
# (reference run.sh:30-35, trim_instance_length.py:37-59) because a single
# GPU must hold the whole utterance.  This recipe is the TPU-native answer
# for minutes-long audio: the TIME axis is sharded over the device mesh
# (parallel/sequence.py — per-layer ppermute halo exchange bounded by the
# attention band and the conv kernel), so activation memory per chip is
# S/num_shards and nothing is ever trimmed.
#
# Pipeline (hybrid-AM flow, not attention decoding — long-form audio is
# where frame-synchronous WFST decoding shines):
#   0  synthesize a long-form corpus (~minute-scale utterances) with
#      frame alignments; write phones.txt
#   1  3-gram LM on the training text
#   2  train the Conformer AM with -seq_shards over the visible devices
#   3  dump test posteriors, compile HLG (identity lexicon), latgen
#      decode, WER
#   4  forced-alignment CTM on the test set (word time boundaries)
#
# Scale knobs are env-overridable; the CI test runs
#   seq_shards=8 n_train=12 epochs=3 ... bash run.sh
# on the 8-device virtual CPU mesh.
#------------------------------------------------------------
. "$(dirname "$0")/path.sh"
set -e
#------------------------------------------------------------
stage=${stage:-0}
seq_shards=${seq_shards:-8}       # time shards (<= visible devices)
n_train=${n_train:-64}
n_dev=${n_dev:-8}
n_test=${n_test:-8}
feat_dim=${feat_dim:-40}
min_words=${min_words:-80}        # ~80-140 words x ~25 frames: 2-3.5k
max_words=${max_words:-140}       #   frames per utterance (20-35 s)
frames_per_word=${frames_per_word:-25}
epochs=${epochs:-10}
batch_size=${batch_size:-4}
en_d_model=${en_d_model:-144}
en_dropout=${en_dropout:-0.1}
# attention band: ~1 s back, ~0.5 s ahead; the halo reach per shard is
# max(|start|, end) frames, which must fit in S/seq_shards local frames
encoder_sub_sequence=${encoder_sub_sequence:-'(-100,50)'}
lr=${lr:-0.003}
acoustic_scale=${acoustic_scale:-1.0}
beam=${beam:-14}
max_active=${max_active:-2000}

mkdir -p data exp

if [ $stage -le 0 ]; then
    if [ ! -f data/train/feats.scp ]; then
        echo '[PROCEDURE] synthesizing long-form corpus.'
        python3 -m pytorch_kaldi_asr_tpu.tools.make_synthetic_data \
            -out_dir . -n_train $n_train -n_dev $n_dev -n_test $n_test \
            -feat_dim $feat_dim -min_words $min_words -max_words $max_words \
            -frames_per_word $frames_per_word
    fi
    for dataset in train dev test; do
        python3 -m pytorch_kaldi_asr_tpu.tools.feat_to_len \
            scp:data/$dataset/feats.scp ark,t:data/$dataset/feats.length
    done
fi

if [ $stage -le 1 ]; then
    echo '[PROCEDURE] training language model.'
    python3 -m pytorch_kaldi_asr_tpu.recipes.train_lm \
        -text data/train/text -order 3 -lm data/lm.gz
fi

if [ $stage -le 2 ]; then
    echo '[PROCEDURE] sequence-parallel AM training.'
    python3 -m pytorch_kaldi_asr_tpu.recipes.train_am \
        -read_train_dir data/train -read_dev_dir data/dev \
        -save_model_dir exp/am \
        -encoder_type conformer -seq_shards $seq_shards \
        -encoder_sub_sequence "$encoder_sub_sequence" \
        -en_d_model $en_d_model -en_dropout $en_dropout \
        -epoch $epochs -batch_size $batch_size -optim_start_lr $lr || exit 1
fi

if [ $stage -le 3 ]; then
    echo '[PROCEDURE] posterior dump + graph decode.'
    python3 -m pytorch_kaldi_asr_tpu.recipes.dump_posteriors \
        -read_data_dir data/test -load_model_file exp/am \
        -wspecifier ark,scp:exp/post.ark,exp/post.scp || exit 1
    python3 -m pytorch_kaldi_asr_tpu.recipes.mkgraph \
        -phones data/phones.txt -self_lexicon -lm data/lm.gz \
        -graph_dir exp/graph || exit 1
    python3 -m pytorch_kaldi_asr_tpu.recipes.latgen \
        -graph_dir exp/graph -rspecifier scp:exp/post.scp \
        -acoustic_scale $acoustic_scale -beam $beam \
        -max_active $max_active \
        -save_result_file exp/decode.txt || exit 1
    python3 -m pytorch_kaldi_asr_tpu.tools.compute_wer --mode=present \
        ark:data/test/text ark:exp/decode.txt > exp/wer
    cat exp/wer
fi

if [ $stage -le 4 ]; then
    echo '[PROCEDURE] forced-alignment CTM (word time boundaries).'
    # identity lexicon matching mkgraph -self_lexicon
    awk '$1 !~ /^#/ && $1 != "<eps>" {print $1, $1}' data/phones.txt \
        > exp/lexicon.txt
    python3 -m pytorch_kaldi_asr_tpu.tools.align_ctm \
        -lexicon exp/lexicon.txt -phones data/phones.txt \
        -text data/test/text -acoustic_scale $acoustic_scale \
        scp:exp/post.scp exp/test.ctm || exit 1
    head -5 exp/test.ctm
fi
