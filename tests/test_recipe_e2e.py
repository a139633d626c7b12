"""End-to-end recipe test: stages 0-5 of the TIMIT recipe on a synthetic
corpus, on CPU (the reference's whole public surface, run.sh:28-204, driven
through our run.sh)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_SH = os.path.join(REPO, "recipes", "attention-transformer-timit",
                      "run.sh")


@pytest.mark.slow
def test_run_sh_stages_0_to_5(tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # scaled-down knobs
        epochs="3",
        batch_size="8",
        beam_size="4",
        nbest="2",
        decode_batch="4",
        max_token_seq_len="12",
        en_layers="1",
        de_layers="1",
        en_d_model="32",
        de_d_model="32",
        encoder_max_len="64",
        decoder_max_len="16",
        model_dir="exp/model_test",
        clean_dir="false",
        nlm_rescore="true",  # stage-2 neural LM + stage-5 second pass
        nlm_epochs="3",
    )
    # stage -1: synthesize the corpus
    subprocess.run(
        [sys.executable, "-m",
         "pytorch_kaldi_asr_tpu.tools.make_synthetic_data",
         "-out_dir", str(tmp_path), "-n_train", "24", "-n_dev", "8",
         "-n_test", "8", "-feat_dim", "13"],
        check=True, env=env, cwd=REPO,
    )
    proc = subprocess.run(
        ["bash", RUN_SH], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=1200,
    )
    sys.stdout.write(proc.stdout[-3000:])
    sys.stderr.write(proc.stderr[-3000:])
    assert proc.returncode == 0

    # artifacts of every stage exist
    assert (tmp_path / "data" / "train_filtered" / "feats.scp").exists()
    assert (tmp_path / "data" / "language" / "vocab.txt").exists()
    assert (tmp_path / "data" / "language" / "lm.3k.gz").exists()
    model_dir = tmp_path / "exp" / "model_test"
    assert (model_dir / "model.init" / "params.msgpack").exists()
    combined = list(model_dir.glob("combined*"))
    assert combined, list(model_dir.iterdir())
    assert (tmp_path / "data" / "language" / "nlm" /
            "params.msgpack").exists()
    for split in ("dev", "test"):
        decode_dir = model_dir / f"decode_{split}"
        assert (decode_dir / "decode.txt").exists()
        result = (decode_dir / "result.txt").read_text()
        assert "%WER" in result, result
        # neural-LM second scoring pass is line-aligned and WER-scored
        nlm_scores = (decode_dir / "nlm.score.txt").read_text().splitlines()
        nbest_lines = [ln for ln in (decode_dir / "decode.txt")
                       .read_text().splitlines() if ln.strip()]
        assert len(nlm_scores) == len(nbest_lines)
        assert list((decode_dir / "scoring_nlm").glob("*_wer"))
    # vocab got the #0 disambig appended
    vocab = (tmp_path / "data" / "language" / "vocab.txt").read_text()
    assert "#0" in vocab.split()[-2]
