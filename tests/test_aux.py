"""Tests for FST construction, WER detail reports, metrics, and training
resume."""

import json
import math
import os

import numpy as np
import jax
import pytest

from pytorch_kaldi_asr_tpu.lm import train_ngram_lm
from pytorch_kaldi_asr_tpu.lm.fst import arpa_to_fst_text, make_lexicon_fst_text
from pytorch_kaldi_asr_tpu.score.details import (
    align,
    format_per_utt_report,
    ops_details,
    per_spk_details,
    per_utt_details,
)
from pytorch_kaldi_asr_tpu.utils.metrics import MetricsLogger, StageTimer
from tests.test_score_lm import CORPUS


def test_arpa_to_fst_text(tmp_path):
    lm = train_ngram_lm(CORPUS, order=2)
    vocab = {"<blank>": 0}
    words = sorted({w for s in CORPUS for w in s})
    for w in words:
        vocab[w] = len(vocab)
    vocab["#0"] = len(vocab)
    path = arpa_to_fst_text(lm, vocab, str(tmp_path / "lm.fst.txt"))
    lines = open(path).read().strip().split("\n")
    arcs = [l.split("\t") for l in lines if len(l.split("\t")) == 5]
    finals = [l.split("\t") for l in lines if len(l.split("\t")) == 2]
    assert arcs and finals
    # every word with an observed <s> context gets an arc out of state 0
    start_arcs = [a for a in arcs if a[0] == "0"]
    assert start_arcs
    # weights are -ln(prob): all positive for probs < 1
    assert all(float(a[4]) > 0 or abs(float(a[4])) < 1e-6 for a in arcs)
    # backoff arcs use the #0 input symbol
    backoffs = [a for a in arcs if a[2] == str(vocab["#0"])]
    assert backoffs


def test_lexicon_fst(tmp_path):
    lexicon = {"cat": ["k", "ae", "t"], "at": ["ae", "t"]}
    wsym = {"cat": 1, "at": 2}
    psym = {"k": 1, "ae": 2, "t": 3, "sil": 4}
    path = make_lexicon_fst_text(
        lexicon, wsym, psym, str(tmp_path / "L.fst.txt"), sil_phone="sil"
    )
    lines = open(path).read().strip().split("\n")
    arcs = [l.split("\t") for l in lines if len(l.split("\t")) == 5]
    # word-initial arcs emit the word label
    first_arcs = [a for a in arcs if a[3] == "1"]
    assert len(first_arcs) == 1  # 'cat' once
    # silence loop exists
    sil_arcs = [a for a in arcs if a[2] == "4"]
    assert sil_arcs


def test_align_and_details():
    ref = {"u1": "a b c d", "u2": "x y"}
    hyp = {"u1": "a z c", "u2": "x y"}
    details = per_utt_details(ref, hyp)
    d = details["u1"]
    assert (d["cor"], d["sub"], d["ins"], d["del"]) == (2, 1, 0, 1)
    assert details["u2"]["cor"] == 2
    spk = per_spk_details(details, {"u1": "s1", "u2": "s1"})
    assert spk["s1"]["sub"] == 1 and spk["s1"]["utts"] == 2
    ops = ops_details(details)
    assert ("sub", "b", "z") in ops or ("sub", "d", "z") in ops or any(
        k[0] == "sub" for k in ops
    )
    report = format_per_utt_report(details)
    assert "#csid 2 1 0 1" in report


def test_metrics_logger_and_timer(tmp_path):
    path = tmp_path / "m.jsonl"
    with MetricsLogger(str(path)) as m:
        m.log(epoch=1, loss=2.5)
        m.log(epoch=2, loss=1.5)
    records = [json.loads(l) for l in path.read_text().splitlines()]
    assert records[0]["epoch"] == 1 and "ts" in records[0]

    timer = StageTimer()
    with timer.stage("io"):
        pass
    with timer.stage("io"):
        pass
    s = timer.summary()
    assert s["io"]["calls"] == 2


def test_train_resume_continues_from_checkpoint(tmp_path):
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train import train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(8)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    eval_loader = BatchLoader(triples, batch_size=4, mode="all")
    out = str(tmp_path / "exp")
    train_model(params, cfg, loader, eval_loader, eval_loader, out,
                epochs=2, save_interval=1, start_lr=0.01)
    # resume to epoch 4: must pick up from epoch 2 (steps continue)
    from pytorch_kaldi_asr_tpu.train.loop import latest_epoch_checkpoint

    _, last = latest_epoch_checkpoint(out)
    assert last == 2
    train_model(params, cfg, loader, eval_loader, eval_loader, out,
                epochs=4, save_interval=1, start_lr=0.01, resume=True,
                metrics_path=str(tmp_path / "metrics.jsonl"))
    _, last = latest_epoch_checkpoint(out)
    assert last == 4
    from pytorch_kaldi_asr_tpu.train import load_checkpoint

    ck = load_checkpoint(os.path.join(out, "epoch.4"))
    # 2 batches/epoch × 4 epochs = 8 optimizer steps carried through resume
    assert ck["step"] == 8
    records = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert [r["epoch"] for r in records] == [3, 4]


def test_prepare_lang(tmp_path):
    from pytorch_kaldi_asr_tpu.tools.prepare_lang import prepare_lang

    d = tmp_path / "dict"
    d.mkdir()
    (d / "lexicon.txt").write_text(
        "cat k ae t\ncat k a t\nat ae t\n<unk> spn\n"
    )
    (d / "silence_phones.txt").write_text("sil\nspn\n")
    (d / "optional_silence.txt").write_text("sil\n")
    lang = prepare_lang(str(d), str(tmp_path / "lang"))
    words = dict(
        l.split() for l in open(os.path.join(lang, "words.txt"))
    )
    phones = dict(
        l.split() for l in open(os.path.join(lang, "phones.txt"))
    )
    assert words["<eps>"] == "0" and "#0" in words and "cat" in words
    assert "sil" in phones and "#0" in phones
    fst = open(os.path.join(lang, "L.fst.txt")).read()
    assert len(fst.strip().split("\n")) > 5
    # both pronunciations of 'cat' present: two arcs emit the word label
    cat_arcs = [l for l in fst.split("\n")
                if len(l.split("\t")) == 5 and
                l.split("\t")[3] == words["cat"]]
    assert len(cat_arcs) == 2


def test_prepare_lang_rejects_bad_dict(tmp_path):
    from pytorch_kaldi_asr_tpu.tools.prepare_lang import prepare_lang

    d = tmp_path / "dict"
    d.mkdir()
    (d / "lexicon.txt").write_text("")
    with pytest.raises((ValueError, FileNotFoundError)):
        prepare_lang(str(d), str(tmp_path / "lang"))


def test_resume_past_final_epoch_uses_resumed_checkpoint(tmp_path):
    """Re-running a finished training with -resume must not crash or save
    the untrained init params as best."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train import load_checkpoint, train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(4)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    ev = BatchLoader(triples, batch_size=4, mode="all")
    out = str(tmp_path / "exp")
    train_model(params, cfg, loader, ev, ev, out, epochs=2, save_interval=1,
                start_lr=0.01)
    trained = load_checkpoint(os.path.join(out, "epoch.2"))["params"]
    best_params, best_epoch, _, _ = train_model(
        params, cfg, loader, ev, ev, out, epochs=2, save_interval=1,
        start_lr=0.01, resume=True,
    )
    assert best_epoch == 2
    np.testing.assert_array_equal(
        np.asarray(best_params["decoder"]["embed"]),
        np.asarray(trained["decoder"]["embed"]),
    )


def test_launcher_accepts_queue_pl_resource_flags(tmp_path):
    import subprocess, sys

    log = tmp_path / "log.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "-q", "all.q", "-l", "gpu=1", str(log), "bash", "-c", "echo hi"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0
    assert "hi" in log.read_text()


def test_lm_fst_order1_has_start_state_zero(tmp_path):
    lm = train_ngram_lm(CORPUS, order=1)
    vocab = {"<blank>": 0}
    for w in sorted({w for s in CORPUS for w in s}):
        vocab[w] = len(vocab)
    vocab["#0"] = len(vocab)
    path = arpa_to_fst_text(lm, vocab, str(tmp_path / "g1.fst.txt"))
    first = open(path).readline().split("\t")
    assert first[0] == "0"  # start state anchored


def test_resume_restores_precrash_best(tmp_path):
    """The pre-crash best epoch (recorded as dev_accu in each epoch
    checkpoint's meta) must survive a resume — the first post-resume epoch
    must not silently become 'best' when a better earlier epoch exists."""
    import json as _json

    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train import train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(8)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    eval_loader = BatchLoader(triples, batch_size=4, mode="all")
    out = str(tmp_path / "exp")
    train_model(params, cfg, loader, eval_loader, eval_loader, out,
                epochs=2, save_interval=1, start_lr=0.01)
    # forge a pre-crash best: pretend epoch 1 had a dev accuracy no later
    # epoch will reach
    meta_path = os.path.join(out, "epoch.1", "meta.json")
    meta = _json.loads(open(meta_path).read())
    meta["dev_accu"] = 2.0  # unbeatable (accuracy <= 1)
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    _best, best_epoch, best_accu, _ = train_model(
        params, cfg, loader, eval_loader, eval_loader, out,
        epochs=3, save_interval=1, start_lr=0.01, resume=True)
    assert best_epoch == 1
    assert best_accu == pytest.approx(2.0)


def test_combine_includes_best_checkpoint_with_sparse_saves(tmp_path):
    """With save_interval > 1 the best epoch often has no epoch.N dir; the
    combine average must lead with the saved best.* checkpoint instead of
    silently averaging without the best model."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train import train_model
    from pytorch_kaldi_asr_tpu.train.loop import combine_checkpoints
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(8)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    eval_loader = BatchLoader(triples, batch_size=4, mode="all")
    out = str(tmp_path / "exp")
    _best, best_epoch, _accu, _ = train_model(
        params, cfg, loader, eval_loader, eval_loader, out,
        epochs=9, save_interval=4, start_lr=0.01)
    # epoch dirs: 4 and 5 (final window).  Force a best epoch with no dir:
    sparse_best = 2
    assert not os.path.isdir(os.path.join(out, f"epoch.{sparse_best}"))
    from pytorch_kaldi_asr_tpu.train import save_checkpoint

    # fresh arrays: the jitted train step donated (deleted) `params`
    best_params = init_transformer(jax.random.PRNGKey(1), cfg)
    save_checkpoint(os.path.join(out, f"best.epoch{sparse_best}.accu50.00"),
                    best_params, cfg, epoch=sparse_best,
                    extra={"dev_accu": 0.5})
    p, accu, path = combine_checkpoints(out, sparse_best, cfg, eval_loader,
                                        num_model=3)
    assert os.path.isdir(path)


def test_profile_trace_and_summary(tmp_path):
    """profile_trace captures a perfetto trace that trace_summary can
    aggregate (the SURVEY §5.1 tracing path behind bench.py BENCH_TRACE)."""
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.tools.trace_summary import (
        find_trace_files,
        format_md,
        summarize,
    )
    from pytorch_kaldi_asr_tpu.utils.metrics import profile_trace

    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    x = jnp.ones((64, 64))
    f(x).block_until_ready()
    with profile_trace(str(tmp_path)):
        f(x).block_until_ready()
    assert find_trace_files(str(tmp_path))
    summary = summarize(str(tmp_path), top=5)
    assert summary
    md = format_md(summary)
    assert "| op |" in md and "total" in md


def test_trace_source_attribution(tmp_path):
    """summarize_by_source aggregates HLO events by their jaxpr source
    line, summing bytes_accessed/model_flops (the HBM-attribution view
    used for docs/TRACE_r4.md)."""
    import gzip
    import json

    from pytorch_kaldi_asr_tpu.tools.trace_summary import (
        format_source_md,
        summarize_by_source,
    )

    def ev(name, dur, src, cat, nbytes, flops):
        return {"ph": "X", "pid": 3, "tid": 3, "ts": 0.0, "dur": dur,
                "name": name,
                "args": {"hlo_category": cat, "source": src,
                         "bytes_accessed": str(nbytes),
                         "model_flops": str(flops)}}

    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        ev("fusion.1", 10.0, "/root/repo/m.py:5", "loop fusion", 100, 7),
        ev("fusion.2", 30.0, "/root/repo/m.py:5", "loop fusion", 200, 3),
        ev("conv.1", 60.0, "m.py:9", "convolution fusion", 400, 90),
        # host-side python frame (no hlo_category): must be ignored
        {"ph": "X", "pid": 3, "ts": 0.0, "dur": 999.0, "name": "host",
         "args": {}},
    ]
    p = tmp_path / "plugins" / "profile" / "r" / "vm.trace.json.gz"
    p.parent.mkdir(parents=True)
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    s = summarize_by_source(str(tmp_path), top=5)
    track = s["/device:TPU:0"]
    assert track["total_us"] == 100.0  # host frame excluded
    rows = {r[0]: r[1:] for r in track["rows"]}
    assert rows["m.py:9"] == (60.0, 400, 90, 1)
    assert rows["m.py:5"] == (40.0, 300, 10, 2)  # merged + prefix-stripped
    cats = {r[0]: r[1:] for r in track["category_rows"]}
    assert cats["convolution fusion"][0] == 60.0
    md = format_source_md(s)
    assert "GB moved" in md and "m.py:9" in md


def test_record_foreign_goldens_self_test(tmp_path):
    """The foreign-bytes guard harness (tools/record_foreign_goldens):
    record+check must round-trip with the self producer, so the day a
    real Kaldi/kaldi-io install is reachable the check is one command
    (docs/PARITY.md known-gaps; reference BatchLoader.py:47)."""
    from pytorch_kaldi_asr_tpu.tools import record_foreign_goldens as rfg

    manifest = rfg.record(str(tmp_path), self_test=True)
    assert [p["kind"] for p in manifest["producers"]] == ["self"]
    assert len(manifest["arks"]) == 4  # FM + CM2 + CM1 + CM3
    assert rfg.check(str(tmp_path)) == 4
    # corrupting a recorded byte must fail the pin
    ark = tmp_path / "selftest_fm.ark"
    data = bytearray(ark.read_bytes())
    data[len(data) // 2] ^= 0xFF
    ark.write_bytes(bytes(data))
    with pytest.raises(AssertionError):
        rfg.check(str(tmp_path))
