"""Tests for data-dir utilities, archives, CMVN, speed perturb, and the
launcher."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.data.archive import (
    ArchiveBatchLoader,
    generate_archives,
)
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.tools import data_dir as dd
from pytorch_kaldi_asr_tpu.tools.cmvn import (
    accumulate_cmvn_stats,
    apply_cmvn_matrix,
)
from pytorch_kaldi_asr_tpu.tools.perturb_speed import (
    perturb_data_dir_speed,
    resample_time,
)


def _make_dir(path, keys, spk_of=None):
    os.makedirs(path, exist_ok=True)
    dd.write_table(os.path.join(path, "feats.scp"),
                   {k: f"/x/{k}.ark:0" for k in keys})
    dd.write_table(os.path.join(path, "text"),
                   {k: f"hello {k}" for k in keys})
    u2s = {k: (spk_of(k) if spk_of else "spk1") for k in keys}
    dd.write_table(os.path.join(path, "utt2spk"), u2s)
    dd.write_table(os.path.join(path, "spk2utt"),
                   dd.utt2spk_to_spk2utt(u2s))


def test_validate_and_fix(tmp_path):
    d = str(tmp_path / "data")
    _make_dir(d, ["u1", "u2", "u3"])
    assert dd.validate_data_dir(d) == []
    # break it: remove u2 from text only
    text = dd.read_table(os.path.join(d, "text"))
    del text["u2"]
    dd.write_table(os.path.join(d, "text"), text)
    problems = dd.validate_data_dir(d)
    assert any("text" in p for p in problems)
    assert dd.fix_data_dir(d) == 2
    assert dd.validate_data_dir(d) == []


def test_subset_split_combine(tmp_path):
    d = str(tmp_path / "data")
    _make_dir(d, [f"u{i:02d}" for i in range(10)],
              spk_of=lambda k: f"s{int(k[1:]) % 2}")
    sub = dd.subset_data_dir(d, str(tmp_path / "sub"), n=4, first=True)
    assert len(dd.read_table(os.path.join(sub, "feats.scp"))) == 4

    # only 2 speakers here, so per-speaker (the default) can't make 3
    # shards; --per-utt ignores speakers (utils/split_data.sh --per-utt)
    splits = dd.split_data_dir(d, 3, per_utt=True)
    sizes = [len(dd.read_table(os.path.join(s, "feats.scp")))
             for s in splits]
    assert sum(sizes) == 10 and max(sizes) - min(sizes) <= 1

    out = dd.combine_data_dirs(splits, str(tmp_path / "comb"))
    assert len(dd.read_table(os.path.join(out, "feats.scp"))) == 10
    assert dd.validate_data_dir(out) == []


def test_tr_cv_split_is_speaker_disjoint(tmp_path):
    d = str(tmp_path / "data")
    _make_dir(d, [f"u{i:02d}" for i in range(20)],
              spk_of=lambda k: f"s{int(k[1:]) % 5}")
    tr, cv = dd.subset_data_dir_tr_cv(d, str(tmp_path / "tr"),
                                      str(tmp_path / "cv"),
                                      cv_spk_fraction=0.2)
    tr_spk = set(dd.read_table(os.path.join(tr, "utt2spk")).values())
    cv_spk = set(dd.read_table(os.path.join(cv, "utt2spk")).values())
    assert tr_spk and cv_spk and not (tr_spk & cv_spk)


def test_filter_apply_map_sym2int():
    table = {"u1": "a b c", "u2": "b d"}
    assert dd.filter_scp(["u2"], table) == {"u2": "b d"}
    mapping = {"a": 1, "b": 2, "c": 3, "d": 4}
    out = dd.apply_map(table, mapping)
    assert out == {"u1": "1 2 3", "u2": "2 4"}
    with pytest.raises(KeyError):
        dd.apply_map({"u": "zz"}, mapping)
    assert dd.apply_map({"u": "zz a"}, mapping, permissive=True) == {
        "u": "zz 1"
    }


def test_archives_roundtrip_and_loader(tmp_path):
    rng = np.random.default_rng(0)
    triples = [
        (f"u{i:02d}", rng.normal(size=(int(rng.integers(4, 10)), 5)
                                 ).astype(np.float32),
         np.array([2] + [4] * int(rng.integers(1, 4)) + [3]))
        for i in range(11)
    ]
    manifest = generate_archives(triples, str(tmp_path), size_archive=4)
    assert len(manifest["archives"]) == 3

    loader = ArchiveBatchLoader(str(tmp_path), batch_size=3, mode="all",
                                shuffle=False)
    batches = list(loader)
    total_valid = sum(int(b.valid.sum()) for b in batches)
    assert total_valid == 11
    shapes = {b.src.shape for b in batches}
    assert len(shapes) == 1  # static shapes across archives
    # all keys come through exactly once among valid rows
    keys = [k for b in batches for k, v in zip(b.keys, b.valid) if v]
    assert sorted(keys) == sorted(t[0] for t in triples)

    drop_loader = ArchiveBatchLoader(str(tmp_path), batch_size=3,
                                     mode="drop", shuffle=False)
    assert sum(1 for _ in drop_loader) == 3  # 11 // 3


def test_cmvn_normalizes_per_speaker():
    rng = np.random.default_rng(1)
    feats = {
        "u1": rng.normal(5.0, 2.0, size=(50, 4)).astype(np.float32),
        "u2": rng.normal(5.0, 2.0, size=(60, 4)).astype(np.float32),
    }
    stats = accumulate_cmvn_stats(feats.items(), {"u1": "s", "u2": "s"})
    normed = np.concatenate([
        apply_cmvn_matrix(feats["u1"], stats["s"], norm_vars=True),
        apply_cmvn_matrix(feats["u2"], stats["s"], norm_vars=True),
    ])
    np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(0), 1.0, atol=1e-2)


def test_speed_perturb_feats(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    mat = np.arange(40, dtype=np.float32).reshape(10, 4)
    with kaldi_io.ArkWriter(str(src / "feats.ark"), str(src / "feats.scp")) as w:
        w.write("u1", mat)
    dd.write_table(str(src / "text"), {"u1": "hi"})
    dd.write_table(str(src / "utt2spk"), {"u1": "s"})
    dst = perturb_data_dir_speed(str(src), str(tmp_path / "sp"), 0.9)
    out = dict(kaldi_io.read_mat_scp(os.path.join(dst, "feats.scp")))
    assert "sp0.9-u1" in out
    assert out["sp0.9-u1"].shape[0] == round(10 / 0.9)
    # resample preserves endpoints
    np.testing.assert_allclose(out["sp0.9-u1"][0], mat[0])
    np.testing.assert_allclose(out["sp0.9-u1"][-1], mat[-1])


def test_launcher_array_jobs(tmp_path):
    log = tmp_path / "log.JOB.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "JOB=1:3", str(log), "bash", "-c", "echo out-JOB"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0
    for j in (1, 2, 3):
        content = (tmp_path / f"log.{j}.txt").read_text()
        assert f"out-{j}" in content
        assert "# Ended (code 0)" in content


def test_launcher_propagates_failure(tmp_path):
    log = tmp_path / "fail.JOB.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "JOB=1:2", str(log), "bash", "-c", "exit JOB"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "2 / 2 failed" in proc.stderr


def test_compute_wer_cli(tmp_path):
    (tmp_path / "ref").write_text("u1 a b c d\nu2 x y\n")
    (tmp_path / "hyp").write_text("u1 a b z d\n")
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.compute_wer",
         "--mode=present", f"ark:{tmp_path}/ref", f"ark:{tmp_path}/hyp"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0
    assert "%WER 25.00 [ 1 / 4, 0 ins, 0 del, 1 sub ]" in proc.stdout


def test_best_wer_cli(tmp_path):
    (tmp_path / "a_wer").write_text("%WER 12.00 [ 12 / 100 ]\n")
    (tmp_path / "b_wer").write_text("%WER 9.50 [ 9 / 100 ]\n")
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.best_wer",
         str(tmp_path / "*_wer")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0
    assert "b_wer" in proc.stdout and "9.50" in proc.stdout


def test_summarize_logs_cli(tmp_path):
    (tmp_path / "x.log").write_text(
        "# cmd\n[WARNING] something odd\n[ERROR] boom\n# Ended (code 1) at\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.summarize_logs",
         str(tmp_path / "*.log")],
        capture_output=True, text=True,
    )
    assert "1 ERROR lines" in proc.stdout
    assert "1 WARNING lines" in proc.stdout
    assert "1 failed jobs" in proc.stdout


def test_compute_priors(tmp_path):
    from pytorch_kaldi_asr_tpu.tools.compute_priors import compute_priors

    (tmp_path / "ali.txt").write_text("u1 0 0 1 2\nu2 1 1 1\n")
    priors = compute_priors([str(tmp_path / "ali.txt")], n_targets=4)
    assert priors.shape == (4,)
    assert abs(priors.sum() - 1.0) < 1e-9
    assert priors[1] > priors[0] > priors[3]  # counts 4 > 2 > 0


def test_ark_writer_text_mode(tmp_path):
    mat = np.array([[1.5, 2.0], [3.0, 4.25]], np.float32)
    path = tmp_path / "t.ark"
    with kaldi_io.ArkWriter(str(path), text=True) as w:
        w.write("u1", mat)
    got = dict(kaldi_io.read_mat_ark(str(path)))["u1"]
    np.testing.assert_allclose(got, mat)


def test_copy_feats_roundtrip(tmp_path):
    from pytorch_kaldi_asr_tpu.tools.copy_feats import copy_feats

    rng = np.random.default_rng(11)
    mats = {f"u{i}": rng.normal(size=(4, 3)).astype(np.float32)
            for i in range(3)}
    with kaldi_io.ArkWriter(str(tmp_path / "a.ark"),
                            str(tmp_path / "a.scp")) as w:
        for k, m in mats.items():
            w.write(k, m)
    n = copy_feats(f"scp:{tmp_path}/a.scp",
                   f"ark,scp:{tmp_path}/b.ark,{tmp_path}/b.scp")
    assert n == 3
    got = dict(kaldi_io.read_mat_scp(f"{tmp_path}/b.scp"))
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])
    # binary -> text -> read back
    copy_feats(f"ark:{tmp_path}/b.ark", f"ark,t:{tmp_path}/t.ark")
    got_t = dict(kaldi_io.read_mat_ark(f"{tmp_path}/t.ark"))
    for k in mats:
        np.testing.assert_allclose(got_t[k], mats[k], rtol=1e-5)


def test_copy_feats_compress_flag(tmp_path):
    """--compress / --compression-method surface (kaldi copy-feats flags)."""
    from pytorch_kaldi_asr_tpu.tools import copy_feats as cf

    rng = np.random.default_rng(12)
    mat = rng.normal(size=(30, 8)).astype(np.float32)
    with kaldi_io.ArkWriter(str(tmp_path / "a.ark"),
                            str(tmp_path / "a.scp")) as w:
        w.write("u0", mat)
    rc = cf.main([
        "--compress=true", "--compression-method=3",
        f"scp:{tmp_path}/a.scp", f"ark:{tmp_path}/c.ark",
    ])
    assert rc == 0
    blob = (tmp_path / "c.ark").read_bytes()
    assert b"CM2 " in blob[:16]
    got = dict(kaldi_io.read_mat_ark(f"{tmp_path}/c.ark"))["u0"]
    rg = float(mat.max() - mat.min())
    assert np.abs(got - mat).max() <= rg / 65535 + 1e-6
    # automatic method (1) -> column-header CM format
    rc = cf.main(["--compress", f"scp:{tmp_path}/a.scp",
                  f"ark:{tmp_path}/c1.ark"])
    assert rc == 0
    assert b"\x00BCM " in (tmp_path / "c1.ark").read_bytes()[:16]


def test_transforms_generators():
    from pytorch_kaldi_asr_tpu.tools.transforms import (
        dct_matrix,
        hamming_window,
        splice_indices,
    )

    dct = dct_matrix(13, 23)
    assert dct.shape == (13, 23)
    # orthonormal rows
    np.testing.assert_allclose(dct @ dct.T, np.eye(13), atol=1e-5)
    win = hamming_window(400)
    assert win.shape == (400,) and abs(win[0] - 0.08) < 1e-6
    assert splice_indices(2, 2) == [-2, -1, 0, 1, 2]
    assert splice_indices(3, 3, 3) == [-3, 0, 3]


def test_filter_text_by_vocab():
    table = {"u1": "the cat zzz sat"}
    out = dd.filter_text_by_vocab(table, {"the", "cat", "sat"})
    assert out["u1"] == "the cat sat"
    out2 = dd.filter_text_by_vocab(table, {"the", "cat", "sat"},
                                   oov_word="<unk>")
    assert out2["u1"] == "the cat <unk> sat"


def test_copy_feats_method_numbering_matches_kaldi(tmp_path):
    """Kaldi enum: 3/4 are the two-byte methods (CM2), 5-7 one-byte (CM3);
    unknown methods error instead of silently picking a format."""
    from pytorch_kaldi_asr_tpu.tools import copy_feats as cf

    rng = np.random.default_rng(13)
    mat = rng.normal(size=(12, 4)).astype(np.float32)
    with kaldi_io.ArkWriter(str(tmp_path / "a.ark"),
                            str(tmp_path / "a.scp")) as w:
        w.write("u0", mat)
    for method, token in [(4, b"CM2 "), (5, b"CM3 "), (7, b"CM3 ")]:
        rc = cf.main([f"--compress=true", f"--compression-method={method}",
                      f"scp:{tmp_path}/a.scp", f"ark:{tmp_path}/m.ark"])
        assert rc == 0
        assert token in (tmp_path / "m.ark").read_bytes()[:16], method
    assert cf.main(["--compress=true", "--compression-method=8",
                    f"scp:{tmp_path}/a.scp", f"ark:{tmp_path}/m.ark"]) == 1


def test_divide_train_valid(tmp_path):
    from pytorch_kaldi_asr_tpu.tools.divide_train_valid import (
        divide_train_valid,
    )

    src = tmp_path / "src.txt"
    tgt = tmp_path / "tgt.txt"
    src.write_text("".join(f"source line {i}\n" for i in range(20)))
    tgt.write_text("".join(f"target line {i}\n" for i in range(20)))
    divide_train_valid(str(src), str(tgt), 0.25, str(tmp_path / "out"))
    tr_s = open(tmp_path / "out.train.src").read().splitlines()
    tr_t = open(tmp_path / "out.train.tgt").read().splitlines()
    va_s = open(tmp_path / "out.valid.src").read().splitlines()
    va_t = open(tmp_path / "out.valid.tgt").read().splitlines()
    assert len(va_s) == 5 and len(tr_s) == 15
    # pairing preserved: line i of src matches line i of tgt by index
    for s, t in zip(tr_s + va_s, tr_t + va_t):
        assert s.split()[-1] == t.split()[-1]
    # no overlap, full coverage
    assert sorted(tr_s + va_s) == sorted(f"source line {i}" for i in range(20))


def test_tokenize_text_char_fallback(tmp_path):
    """Without jieba the CJK path falls back to per-character splitting;
    ASCII words stay whole."""
    from pytorch_kaldi_asr_tpu.tools.tokenize_text import segment_file

    src = tmp_path / "in.txt"
    src.write_text("hello world\n")
    out = tmp_path / "out.txt"
    segment_file(str(src), str(out), language="chinese")
    assert open(out).read().split() == ["hello", "world"]


def test_compute_cmvn_stats_cli(tmp_path):
    """The stage-0 CMVN pipeline as CLIs: compute stats per speaker, then
    apply them; normalized speaker stats land at ~N(0,1)."""
    from pytorch_kaldi_asr_tpu.tools import cmvn as cmvn_mod
    from pytorch_kaldi_asr_tpu.tools import compute_cmvn_stats as ccs

    rng = np.random.default_rng(21)
    with kaldi_io.ArkWriter(str(tmp_path / "f.ark"),
                            str(tmp_path / "f.scp")) as w:
        for i in range(4):
            w.write(f"u{i}", rng.normal(3.0, 2.0,
                                        size=(50, 5)).astype(np.float32))
    dd.write_table(str(tmp_path / "utt2spk"),
                   {f"u{i}": f"s{i % 2}" for i in range(4)})
    rc = ccs.main([
        f"--utt2spk=ark:{tmp_path}/utt2spk",
        f"scp:{tmp_path}/f.scp",
        f"ark,scp:{tmp_path}/cmvn.ark,{tmp_path}/cmvn.scp",
    ])
    assert rc == 0
    rc = cmvn_mod.main([
        "--norm-vars=true", f"--utt2spk=ark:{tmp_path}/utt2spk",
        f"scp:{tmp_path}/cmvn.scp", f"scp:{tmp_path}/f.scp",
        f"ark,scp:{tmp_path}/n.ark,{tmp_path}/n.scp",
    ])
    assert rc == 0
    normed = np.concatenate(
        [m for _, m in kaldi_io.read_mat_scp(f"{tmp_path}/n.scp")])
    np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(normed.std(0), 1.0, atol=2e-2)


def test_make_timit_shaped_structure(tmp_path):
    """The synthetic corpus generator emits valid data dirs at TIMIT-like
    scale ratios with parseable arks and aligned transcripts."""
    from pytorch_kaldi_asr_tpu.tools import make_timit_shaped as mts

    rc = mts.main(["-out_dir", str(tmp_path), "-scale", "0.02",
                   "-feat_dim", "8"])
    assert rc in (0, None)
    base = tmp_path / "data"
    for split, ref_n in (("train", 3696), ("dev", 384), ("test", 192)):
        d = base / split
        feats = dict(kaldi_io.read_mat_scp(str(d / "feats.scp")))
        text = dd.read_table(str(d / "text"))
        assert set(feats) == set(text)
        assert abs(len(feats) - ref_n * 0.02) <= max(2, ref_n * 0.005)
        m = next(iter(feats.values()))
        assert m.shape[1] == 8 and m.shape[0] > 10
        assert dd.validate_data_dir(str(d)) == []


def test_launcher_resubmits_on_preempt_code(tmp_path):
    """A job exiting PREEMPT_EXIT_CODE (checkpointed + asked to continue)
    is re-run up to --resubmit times; each run sees the state left by the
    previous one (the -resume contract)."""
    from pytorch_kaldi_asr_tpu.parallel.launch import PREEMPT_EXIT_CODE

    counter = tmp_path / "runs"
    # exit 75 on the first two runs, 0 on the third
    script = (f"echo x >> {counter}; "
              f"if [ $(wc -l < {counter}) -lt 3 ]; "
              f"then exit {PREEMPT_EXIT_CODE}; fi")
    log = tmp_path / "log.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "--resubmit", "2", str(log), "bash", "-c", script],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert counter.read_text().count("x") == 3

    # without --resubmit the preempt code propagates as-is (single job)
    counter.unlink()
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         str(log), "bash", "-c", script],
        capture_output=True, text=True,
    )
    assert proc.returncode == PREEMPT_EXIT_CODE
    assert counter.read_text().count("x") == 1


def test_launcher_resubmit_budget_separate_from_retries(tmp_path):
    """Plain failures consume --retries, not the --resubmit budget, and a
    run that keeps getting preempted past the budget fails."""
    from pytorch_kaldi_asr_tpu.parallel.launch import run_job_with_retries

    counter = tmp_path / "n"
    log = str(tmp_path / "l.txt")
    # always plain-fails: resubmits must not rescue it
    code = run_job_with_retries(
        log, ["bash", "-c", f"echo x >> {counter}; exit 3"],
        retries=0, resubmits=5)
    assert code == 3
    assert counter.read_text().count("x") == 1

    # always preempted: stops after the resubmit budget
    counter.unlink()
    from pytorch_kaldi_asr_tpu.parallel.launch import PREEMPT_EXIT_CODE

    code = run_job_with_retries(
        log, ["bash", "-c", f"echo x >> {counter}; exit {PREEMPT_EXIT_CODE}"],
        retries=9, resubmits=2)
    assert code == PREEMPT_EXIT_CODE
    assert counter.read_text().count("x") == 3  # 1 + 2 resubmits


def test_split_data_dir_per_speaker(tmp_path):
    """Default split keeps each speaker in exactly one shard and balances
    utterance counts (utils/split_data.sh + split_scp.pl --utt2spk)."""
    d = str(tmp_path / "data")
    # 5 speakers with lopsided utterance counts: 6+1+1+3+3 = 14 utts
    sizes = {"a": 6, "b": 1, "c": 1, "d": 3, "e": 3}
    keys = [f"{s}-u{i}" for s in sizes for i in range(sizes[s])]
    _make_dir(d, sorted(keys), spk_of=lambda k: k.split("-")[0])
    dirs = dd.split_data_dir(d, 3)
    seen = {}
    counts = []
    for i, sub in enumerate(dirs):
        u2s = dd.read_table(os.path.join(sub, "utt2spk"))
        counts.append(len(u2s))
        for spk in u2s.values():
            assert seen.setdefault(spk, i) == i, "speaker crosses shards"
    assert sum(counts) == len(keys)
    assert set(seen) == set(sizes)
    assert max(counts) - min(counts) <= max(sizes.values())
    # per_utt mode ignores speakers and splits contiguously
    dirs = dd.split_data_dir(d, 3, str(tmp_path / "per_utt"), per_utt=True)
    ns = [len(dd.read_table(os.path.join(s, "feats.scp"))) for s in dirs]
    assert sum(ns) == len(keys) and max(ns) - min(ns) <= 1


def test_split_per_speaker_refuses_too_few_speakers(tmp_path):
    d = str(tmp_path / "data")
    _make_dir(d, ["u1", "u2", "u3"], spk_of=lambda k: "onespk")
    with pytest.raises(ValueError, match="speakers"):
        dd.split_data_dir(d, 2)


def test_filter_scps_batch():
    table = {f"u{i}": str(i) for i in range(6)}
    parts = dd.filter_scps([["u0", "u3"], ["u1"], ["u5", "nope"]], table)
    assert parts == [{"u0": "0", "u3": "3"}, {"u1": "1"}, {"u5": "5"}]


def test_convert_and_fix_ctm(tmp_path):
    """convert_ctm.pl's own embedded test vector + fix_ctm padding."""
    from pytorch_kaldi_asr_tpu.tools import ctm

    seg = tmp_path / "segments"
    seg.write_text("utt reco 10.0 20.0\n")
    r2f = tmp_path / "reco2file_and_channel"
    r2f.write_text("reco file A\n")
    out = list(ctm.convert_ctm(
        ["utt 1 8.0 1.0 word 0.5"],
        ctm.read_segments(str(seg)),
        ctm.read_reco2file_and_channel(str(r2f)),
    ))
    assert out == ["file A 18.00 1.00 word 0.5"]
    # unknown utterance: raise, unless skip_unknown
    with pytest.raises(KeyError):
        list(ctm.convert_ctm(["ghost 1 0.0 1.0 w"],
                             ctm.read_segments(str(seg)),
                             ctm.read_reco2file_and_channel(str(r2f))))

    stm = tmp_path / "ref.stm"
    stm.write_text("seg1 A spk 0 5 hello\nseg2 A spk 0 5 there\n")
    hyp = tmp_path / "hyp.ctm"
    hyp.write_text("seg1 A 0.0 1.0 hello\n")
    assert ctm.fix_ctm(str(stm), str(hyp))
    lines = hyp.read_text().splitlines()
    assert "seg2 1 0 0 EMPTY_RECOGNIZED_PHRASE" in lines
    # CTM naming unknown segments is the failure case
    hyp.write_text("rogue A 0.0 1.0 hi\n")
    assert not ctm.fix_ctm(str(stm), str(hyp))
