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


def test_streaming_am_to_streaming_latgen_equals_offline():
    """End-to-end ONLINE hybrid recognition: chunked AM posteriors
    (models.streaming.StreamingTDNN) pushed into the carried-state graph
    decoder (decode.latgen.StreamingLatgen) must reproduce the offline
    posterior-dump -> latgen result exactly."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.latgen import StreamingLatgen, latgen
    from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
    from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
    from pytorch_kaldi_asr_tpu.models import TransformerConfig
    from pytorch_kaldi_asr_tpu.models.am import am_log_posteriors, init_am
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingTDNN

    phones = {p: i + 1 for i, p in enumerate("abkt")}
    lexicon = {"bat": list("bat"), "at": list("at"), "tab": list("tab")}
    lm = train_ngram_lm([s.split() for s in
                         ["bat at", "at tab", "tab bat at"]], order=2)
    word_syms = {w: i + 1 for i, w in enumerate(sorted(lexicon))}
    graph, _ = mkgraph(lexicon, lm, word_syms, phones, sil_phone=None,
                       hmm_loops=True)

    cfg = TransformerConfig(
        src_dim=6, vocab_size=8, en_layers=1, de_layers=1, n_head=1,
        en_d_model=16, de_d_model=16, d_k=8, d_v=8, encoder_max_len=64,
        tdnn_contexts=((-1, 0, 1),), en_dropout=0.0, de_dropout=0.0,
    )
    params = init_am(jax.random.PRNGKey(0), cfg, n_targets=len(phones))
    rng = np.random.default_rng(3)
    src = rng.normal(size=(1, 24, cfg.src_dim)).astype(np.float32)
    mask = jnp.ones((1, 24), jnp.uint8)

    # offline leg
    logp_off, _ = am_log_posteriors(params, cfg, jnp.asarray(src), mask)
    ref = latgen(graph, np.asarray(logp_off[0]), beam=1e9)
    assert ref is not None

    # streaming leg: chunked posteriors -> carried-state decoder
    def apply_fn(p, c, buf, m, pos_offset=0):
        return am_log_posteriors(p, c, buf, m, pos_offset=pos_offset)

    stream = StreamingTDNN(params, cfg, apply_fn)
    dec = StreamingLatgen(graph, beam=1e9)
    for start in range(0, 24, 5):
        emit = stream.push(src[:, start:start + 5])
        if emit is not None:
            assert dec.push(emit[0])
    tail = stream.flush()
    if tail is not None:
        assert dec.push(tail[0])
    got = dec.finish()
    assert got is not None
    # words and total cost must agree; the frame-level alignment may flip
    # on near-ties because chunked XLA executions round differently at
    # ~1e-5 (StreamingTDNN pins posterior agreement at atol=1e-4)
    assert got[0] == ref[0]
    assert len(got[1]) == len(ref[1]) == 24
    assert abs(got[2] - ref[2]) < 1e-3 * max(1.0, abs(ref[2]))
