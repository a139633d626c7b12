"""End-to-end hybrid AM flow: synthetic alignments → frame-CE training →
posterior ark dump → frame accuracy against the true alignments."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_am_train_and_dump(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    subprocess.run(
        [sys.executable, "-m",
         "pytorch_kaldi_asr_tpu.tools.make_synthetic_data",
         "-out_dir", str(tmp_path), "-n_train", "30", "-n_dev", "8",
         "-n_test", "8", "-feat_dim", "10"],
        check=True, env=env, cwd=REPO,
    )
    subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.recipes.train_am",
         "-read_train_dir", f"{tmp_path}/data/train",
         "-read_dev_dir", f"{tmp_path}/data/dev",
         "-save_model_dir", f"{tmp_path}/exp/am",
         "-encoder_type", "tdnnf", "-epoch", "10", "-batch_size", "8",
         "-en_d_model", "48", "-optim_start_lr", "0.003"],
        check=True, env=env, cwd=REPO,
    )
    subprocess.run(
        [sys.executable, "-m",
         "pytorch_kaldi_asr_tpu.recipes.dump_posteriors",
         "-read_data_dir", f"{tmp_path}/data/test",
         "-load_model_file", f"{tmp_path}/exp/am",
         "-wspecifier",
         f"ark,scp:{tmp_path}/post.ark,{tmp_path}/post.scp"],
        check=True, env=env, cwd=REPO,
    )
    sys.path.insert(0, REPO)
    from pytorch_kaldi_asr_tpu.io import kaldi_io

    mats = dict(kaldi_io.read_mat_scp(f"{tmp_path}/post.scp"))
    assert len(mats) == 8
    ali = kaldi_io.read_key_value_text(f"{tmp_path}/data/test/ali.txt")
    correct = total = 0
    for k, m in mats.items():
        ids = np.array([int(a) for a in ali[k].split()])
        assert m.shape[0] == len(ids)  # one posterior row per frame
        np.testing.assert_allclose(np.exp(m).sum(1), 1.0, atol=1e-4)
        correct += (m[: len(ids)].argmax(1) == ids).sum()
        total += len(ids)
    assert correct / total > 0.5  # word-conditioned synthetic task learned
