"""Tests for the WFST core and algorithms (the OpenFst-role subsystem
behind mkgraph/arpa2fst parity; reference kaldi/utils/mkgraph.sh:60-124)."""

import math

import pytest

from pytorch_kaldi_asr_tpu.fst.core import EPS, Fst
from pytorch_kaldi_asr_tpu.fst import ops


def linear_fst(pairs, weight_step=0.5):
    """Chain acceptor/transducer from (ilabel, olabel) pairs."""
    f = Fst()
    s = f.add_state()
    f.start = s
    w = 0.0
    for il, ol in pairs:
        n = f.add_state()
        f.add_arc(s, il, ol, w, n)
        w += weight_step
        s = n
    f.set_final(s, 0.25)
    return f


def test_text_round_trip(tmp_path):
    f = linear_fst([(1, 2), (3, 4), (5, 6)])
    p = str(tmp_path / "f.txt")
    f.write_text(p)
    g = Fst.read_text(p)
    assert ops.equivalent_paths(f, g)


def test_binary_round_trip(tmp_path):
    f = linear_fst([(1, 2), (3, 4)])
    f.add_arc(0, 7, 7, 1.5, 2)
    p = str(tmp_path / "f.fst")
    f.write_binary(p)
    g = Fst.read_binary(p)
    assert g.start == f.start
    assert g.num_states == f.num_states
    assert ops.equivalent_paths(f, g)


def test_connect_trims_dead_states():
    f = Fst()
    s0, s1, s2, s3 = (f.add_state() for _ in range(4))
    f.start = s0
    f.add_arc(s0, 1, 1, 0.0, s1)
    f.add_arc(s0, 2, 2, 0.0, s2)  # s2 never reaches a final
    f.add_arc(s2, 3, 3, 0.0, s2)
    f.set_final(s1)
    _ = s3  # unreachable
    f.connect()
    assert f.num_states == 2
    assert f.paths() == [((1,), (1,), 0.0)]


def test_compose_basic():
    a = linear_fst([(1, 10), (2, 20)], weight_step=1.0)
    b = Fst()
    s = b.add_state()
    b.start = s
    t = b.add_state()
    u = b.add_state()
    b.add_arc(s, 10, 100, 0.5, t)
    b.add_arc(t, 20, 200, 0.5, u)
    b.set_final(u, 0.0)
    c = ops.compose(a, b)
    paths = c.paths()
    assert len(paths) == 1
    ilabs, olabs, w = paths[0]
    assert ilabs == (1, 2) and olabs == (100, 200)
    assert math.isclose(w, 0.0 + 1.0 + 0.5 + 0.5 + 0.25)


def test_compose_epsilon_no_duplicates():
    """a has an output-eps arc, b has an input-eps arc: the filter must
    count each eps-path exactly once."""
    a = Fst()
    s0, s1, s2 = (a.add_state() for _ in range(3))
    a.start = s0
    a.add_arc(s0, 1, 5, 0.0, s1)
    a.add_arc(s1, 2, EPS, 0.0, s2)
    a.set_final(s2)
    b = Fst()
    t0, t1, t2 = (b.add_state() for _ in range(3))
    b.start = t0
    b.add_arc(t0, EPS, 9, 0.0, t1)
    b.add_arc(t1, 5, 7, 0.0, t2)
    b.set_final(t2)
    c = ops.compose(a, b)
    paths = c.paths()
    assert len(paths) == 1
    assert paths[0][0] == (1, 2)
    assert paths[0][1] == (9, 7)


def test_determinize_acceptor():
    # two paths with shared prefix label 1 must merge; weights tropical-min
    f = Fst()
    s0 = f.add_state()
    f.start = s0
    a1, a2, b1, b2 = (f.add_state() for _ in range(4))
    f.add_arc(s0, 1, 1, 0.3, a1)
    f.add_arc(a1, 2, 2, 0.0, a2)
    f.add_arc(s0, 1, 1, 0.1, b1)
    f.add_arc(b1, 3, 3, 0.0, b2)
    f.set_final(a2)
    f.set_final(b2)
    d = ops.determinize(f)
    # deterministic: one arc per (state, ilabel)
    for s in range(d.num_states):
        ils = [a.ilabel for a in d.arcs[s] if a.ilabel != EPS]
        assert len(ils) == len(set(ils))
    assert ops.equivalent_paths(f, d)


def test_determinize_transducer_residual_outputs():
    """Two arcs with the same input but different outputs: the common
    prefix is emitted, the divergence carried in the subset."""
    f = Fst()
    s0 = f.add_state()
    f.start = s0
    a1, a2, b1, b2 = (f.add_state() for _ in range(4))
    f.add_arc(s0, 1, 10, 0.0, a1)
    f.add_arc(a1, 2, 20, 0.0, a2)
    f.add_arc(s0, 1, 11, 0.0, b1)
    f.add_arc(b1, 3, 21, 0.0, b2)
    f.set_final(a2)
    f.set_final(b2)
    d = ops.determinize(f)
    assert ops.equivalent_paths(f, d)
    for s in range(d.num_states):
        ils = [a.ilabel for a in d.arcs[s] if a.ilabel != EPS]
        assert len(ils) == len(set(ils))


def test_rmepsilon():
    f = Fst()
    s0, s1, s2 = (f.add_state() for _ in range(3))
    f.start = s0
    f.add_arc(s0, EPS, EPS, 0.5, s1)
    f.add_arc(s1, 4, 4, 0.25, s2)
    f.set_final(s2)
    g = ops.rmepsilon(f)
    assert g.paths() == [((4,), (4,), 0.75)]
    for lst in g.arcs:
        for a in lst:
            assert not (a.ilabel == EPS and a.olabel == EPS)


def test_minimize_merges_equivalent_suffixes():
    # two branches with identical suffix structure must share states
    f = Fst()
    s0 = f.add_state()
    f.start = s0
    for first in (1, 2):
        s = f.add_state()
        f.add_arc(s0, first, first, 0.0, s)
        t = f.add_state()
        f.add_arc(s, 9, 9, 0.125, t)
        f.set_final(t)
    d = ops.determinize(f)
    m = ops.minimize(d)
    assert ops.equivalent_paths(f, m)
    assert m.num_states < d.num_states or d.num_states <= 3


def test_push_weights_preserves_path_weights():
    f = linear_fst([(1, 1), (2, 2)], weight_step=1.25)
    g = ops.push_weights(f)
    assert ops.equivalent_paths(f, g)


def test_shortest_path():
    f = Fst()
    s0, s1, s2 = (f.add_state() for _ in range(3))
    f.start = s0
    f.add_arc(s0, 1, 1, 1.0, s2)
    f.add_arc(s0, 2, 2, 0.25, s1)
    f.add_arc(s1, 3, 3, 0.25, s2)
    f.set_final(s2)
    ilabs, olabs, w = ops.shortest_path(f)
    assert ilabs == [2, 3]
    assert math.isclose(w, 0.5)


def test_invert_project_relabel():
    f = linear_fst([(1, 10)])
    assert ops.invert(f).paths()[0][0] == (10,)
    assert ops.project(f, "output").paths()[0][0] == (10,)
    assert ops.relabel(f, imap={1: 99}).paths()[0][0] == (99,)


def test_determinize_blowup_guard():
    f = linear_fst([(1, 1)])
    with pytest.raises(RuntimeError):
        # absurd cap to prove the guard trips
        ops.determinize(f, max_states=0)


def test_compose_joint_eps_eps_move():
    """A path that needs BOTH an a-side eps-output move and a b-side
    eps-input move between matches must survive composition (the filter's
    joint eps-eps transition; without it both alone-move orders dead-end)."""
    a = Fst()
    s0, s1 = (a.add_state() for _ in range(2))
    a.start = s0
    a.add_arc(s0, 1, EPS, 0.25, s1)
    a.set_final(s1)
    b = Fst()
    t0, t1 = (b.add_state() for _ in range(2))
    b.start = t0
    b.add_arc(t0, EPS, 5, 0.5, t1)
    b.set_final(t1)
    c = ops.compose(a, b)
    paths = c.paths()
    assert len(paths) == 1
    assert paths[0][0] == (1,)
    assert paths[0][1] == (5,)
    assert math.isclose(paths[0][2], 0.75)


def test_compose_eps_runs_on_both_sides():
    """j=2 a-eps moves and k=1 b-eps move between two real matches: exactly
    one composite path (joint move then excess alone moves)."""
    a = Fst()
    st = [a.add_state() for _ in range(4)]
    a.start = st[0]
    a.add_arc(st[0], 1, 5, 0.0, st[1])
    a.add_arc(st[1], 2, EPS, 0.0, st[2])
    a.add_arc(st[2], 3, EPS, 0.0, st[3])
    a.set_final(st[3])
    b = Fst()
    tt = [b.add_state() for _ in range(3)]
    b.start = tt[0]
    b.add_arc(tt[0], 5, 7, 0.0, tt[1])
    b.add_arc(tt[1], EPS, 9, 0.0, tt[2])
    b.set_final(tt[2])
    c = ops.compose(a, b)
    paths = c.paths()
    assert len(paths) == 1
    assert paths[0][0] == (1, 2, 3)
    assert paths[0][1] == (7, 9)


# ---------------------------------------------------------------------------
# OpenFst byte-level interchange (fst/openfst_io.py)
# ---------------------------------------------------------------------------


def test_vector_fst_golden_bytes(tmp_path):
    """Pin write_binary to the exact OpenFst VectorFst<StdArc> stream:
    a reader implementing OpenFst's documented layout must accept our
    files byte-for-byte.  Expected bytes are hand-assembled here, not
    produced by the code under test."""
    import struct

    f = Fst()
    s0, s1 = f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, 3, 4, 0.5, s1)
    f.set_final(s1, 0.25)
    p = str(tmp_path / "g.fst")
    f.write_binary(p)

    expect = b"".join([
        struct.pack("<i", 2125659606),              # kFstMagicNumber
        struct.pack("<i", 6), b"vector",            # fsttype
        struct.pack("<i", 8), b"standard",          # arctype
        struct.pack("<i", 2),                       # version
        struct.pack("<i", 0),                       # flags (no symtabs)
        struct.pack("<Q", 0),                       # properties
        struct.pack("<q", 0),                       # start
        struct.pack("<q", 2),                       # numstates
        struct.pack("<q", 1),                       # numarcs
        struct.pack("<f", math.inf),                # state0 final = Zero
        struct.pack("<q", 1),                       # state0 narcs
        struct.pack("<iifi", 3, 4, 0.5, 1),         # the arc
        struct.pack("<f", 0.25),                    # state1 final
        struct.pack("<q", 0),                       # state1 narcs
    ])
    assert open(p, "rb").read() == expect


def test_read_const_fst_v2_and_aligned_v1(tmp_path):
    """ConstFst reading: hand-assembled version-2 (unaligned) and
    version-1 (16-byte-aligned) streams decode to the same machine."""
    import struct

    from pytorch_kaldi_asr_tpu.fst import openfst_io

    def const_bytes(version):
        out = [
            struct.pack("<i", 2125659606),
            struct.pack("<i", 5), b"const",
            struct.pack("<i", 8), b"standard",
            struct.pack("<ii", version, 0),
            struct.pack("<Q", 1),
            struct.pack("<qqq", 0, 2, 2),
        ]
        blob = b"".join(out)
        if version == 1:
            blob += b"\0" * ((-len(blob)) % 16)
        # states: {final, pos, narcs, nieps, noeps}
        blob += struct.pack("<fIIII", math.inf, 0, 2, 1, 0)
        blob += struct.pack("<fIIII", 0.75, 2, 0, 0, 0)
        if version == 1:
            blob += b"\0" * ((-len(blob)) % 16)
        blob += struct.pack("<iifi", 0, 9, 0.5, 1)
        blob += struct.pack("<iifi", 2, 2, 1.5, 1)
        return blob

    for version in (2, 1):
        p = tmp_path / f"c{version}.fst"
        p.write_bytes(const_bytes(version))
        g = openfst_io.read_fst(str(p))
        assert g.start == 0
        assert g.num_states == 2
        assert g.final_weight(1) == 0.75
        arcs = [(a.ilabel, a.olabel, a.weight, a.nextstate)
                for a in g.arcs[0]]
        assert arcs == [(0, 9, 0.5, 1), (2, 2, 1.5, 1)]


def test_const_fst_write_read_roundtrip(tmp_path):
    from pytorch_kaldi_asr_tpu.fst import openfst_io

    f = linear_fst([(1, 2), (3, 4), (5, 6)])
    f.add_arc(0, 7, 8, 1.25, 2)
    pv = str(tmp_path / "v.fst")
    pc = str(tmp_path / "c.fst")
    f.write_binary(pv)
    openfst_io.write_const_fst(f, pc)
    gv = openfst_io.read_fst(pv)
    gc = openfst_io.read_fst(pc)
    assert ops.equivalent_paths(gv, gc)
    assert ops.equivalent_paths(f, gc)


def test_binary_lattice_ark_roundtrip(tmp_path):
    from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice
    from pytorch_kaldi_asr_tpu.fst import openfst_io

    word2id = {"hello": 5, "world": 6, "now": 7}
    id2word = {v: k for k, v in word2id.items()}

    lat = WordLattice(utt="utt1")
    n0 = lat.add_node(0)
    n1 = lat.add_node(10)
    n2 = lat.add_node(25)
    lat.add_link(n0, n1, "hello", acoustic=1.5, graph=0.25)
    lat.add_link(n0, n1, "now", acoustic=2.0, graph=0.5)
    lat.add_link(n1, n2, "world", acoustic=3.0, graph=0.75)
    lat.finals[n2] = 0.125

    lat2 = WordLattice(utt="utt2")
    m0 = lat2.add_node(0)
    m1 = lat2.add_node(7)
    lat2.add_link(m0, m1, "hello", acoustic=0.5, graph=0.0)
    lat2.finals[m1] = 0.0

    ark = str(tmp_path / "lat.ark")
    scp = str(tmp_path / "lat.scp")
    openfst_io.write_lattice_ark([lat, lat2], ark, word2id, scp_path=scp)

    got = dict(openfst_io.read_lattice_ark(ark, id2word))
    assert set(got) == {"utt1", "utt2"}
    g = got["utt1"]
    assert g.node_times == [0, 10, 25]
    assert g.finals == {2: 0.125}
    links = sorted((l.start, l.end, l.word, l.acoustic, l.graph)
                   for l in g.links)
    assert links == [(0, 1, "hello", 1.5, 0.25), (0, 1, "now", 2.0, 0.5),
                     (1, 2, "world", 3.0, 0.75)]
    # best path survives the roundtrip
    assert g.best_path()[0] == ["hello", "world"]
    # scp offsets point at the binary markers
    for line in open(scp):
        key, rx = line.split()
        path, off = rx.rsplit(":", 1)
        with open(path, "rb") as fh:
            fh.seek(int(off))
            assert fh.read(2) == b"\x00B"


def test_compact_lattice_golden_header(tmp_path):
    """Pin the compactlattice44 stream prefix: magic + type strings +
    header ints, then state 0's CompactLatticeWeight Zero final."""
    import io
    import struct

    from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice
    from pytorch_kaldi_asr_tpu.fst import openfst_io

    lat = WordLattice(utt="u")
    n0 = lat.add_node(0)
    n1 = lat.add_node(2)
    lat.add_link(n0, n1, "w", acoustic=1.0, graph=0.5)
    lat.finals[n1] = 0.0
    buf = io.BytesIO()
    openfst_io.write_compact_lattice(lat, buf, {"w": 3})
    blob = buf.getvalue()
    expect_prefix = b"".join([
        struct.pack("<i", 2125659606),
        struct.pack("<i", 6), b"vector",
        struct.pack("<i", 16), b"compactlattice44",
        struct.pack("<ii", 2, 0),
        struct.pack("<Q", 0),
        struct.pack("<qqq", 0, 2, 1),
        # state 0: final = CompactLatticeWeight::Zero = (inf, inf, empty)
        struct.pack("<ff", math.inf, math.inf), struct.pack("<i", 0),
        struct.pack("<q", 1),                    # narcs
        struct.pack("<ii", 3, 3),                # acceptor labels
        struct.pack("<ff", 0.5, 1.0),            # (graph, acoustic)
        struct.pack("<i", 2), struct.pack("<ii", 1, 1),  # 2-frame string
        struct.pack("<i", 1),                    # nextstate
    ])
    assert blob.startswith(expect_prefix)


def test_lattice_ark_non_topological_state_numbering(tmp_path):
    """Node times must propagate in topological order even when an
    external tool numbered states non-topologically (OpenFst allows it)."""
    import io as _io

    from pytorch_kaldi_asr_tpu.fst import openfst_io

    # hand-build a compactlattice44 stream with states 0 -> 2 -> 1,
    # i.e. state 2 (mid) has a HIGHER id than its successor 1
    buf = _io.BytesIO()
    import struct

    def clat_w(g, a, string):
        return (struct.pack("<ff", g, a) + struct.pack("<i", len(string))
                + struct.pack(f"<{len(string)}i", *string))

    inf = math.inf
    buf.write(struct.pack("<i", 2125659606))
    for sname in ("vector", "compactlattice44"):
        b = sname.encode()
        buf.write(struct.pack("<i", len(b)) + b)
    buf.write(struct.pack("<iiQ", 2, 0, 0))
    buf.write(struct.pack("<qqq", 0, 3, 2))
    # state 0: not final, arc to 2 (word 5, 4 frames)
    buf.write(clat_w(inf, inf, []))
    buf.write(struct.pack("<q", 1))
    buf.write(struct.pack("<ii", 5, 5) + clat_w(0.5, 1.0, [1] * 4)
              + struct.pack("<i", 2))
    # state 1: final, no arcs
    buf.write(clat_w(0.0, 0.0, []))
    buf.write(struct.pack("<q", 0))
    # state 2: arc to 1 (word 6, 3 frames)
    buf.write(clat_w(inf, inf, []))
    buf.write(struct.pack("<q", 1))
    buf.write(struct.pack("<ii", 6, 6) + clat_w(0.25, 0.5, [1] * 3)
              + struct.pack("<i", 1))
    buf.seek(0)
    lat = openfst_io.read_compact_lattice(buf, {5: "hello", 6: "world"})
    assert lat.node_times == [0, 7, 4]  # state 1 reached via 0->2->1
    assert lat.best_path()[0] == ["hello", "world"]


def test_binary_formats_edge_cases(tmp_path):
    """Empty and degenerate machines roundtrip through both binary
    layouts: no states, start-only, final-only-no-arcs."""
    from pytorch_kaldi_asr_tpu.fst import openfst_io

    # no states at all
    empty = Fst()
    for writer, name in ((empty.write_binary, "v"),
                         (lambda p: openfst_io.write_const_fst(empty, p),
                          "c")):
        p = str(tmp_path / f"empty_{name}.fst")
        writer(p)
        g = openfst_io.read_fst(p)
        assert g.num_states == 0 and g.start == -1

    # single final state, no arcs
    one = Fst()
    s = one.add_state()
    one.start = s
    one.set_final(s, 1.5)
    for writer, name in ((one.write_binary, "v"),
                         (lambda p: openfst_io.write_const_fst(one, p),
                          "c")):
        p = str(tmp_path / f"one_{name}.fst")
        writer(p)
        g = openfst_io.read_fst(p)
        assert g.num_states == 1
        assert g.final_weight(0) == 1.5
        assert g.num_arcs == 0


def test_binary_roundtrip_random_fsts(tmp_path):
    """Property test: random machines survive vector and const roundtrips
    with identical structure (state count, arcs, finals, weights)."""
    import random

    from pytorch_kaldi_asr_tpu.fst import openfst_io

    rnd = random.Random(13)
    for trial in range(10):
        f = Fst()
        n = rnd.randint(1, 12)
        for _ in range(n):
            f.add_state()
        f.start = rnd.randrange(n)
        for _ in range(rnd.randint(0, 30)):
            f.add_arc(rnd.randrange(n), rnd.randint(0, 9),
                      rnd.randint(0, 9), round(rnd.uniform(-2, 5), 3),
                      rnd.randrange(n))
        for s in range(n):
            if rnd.random() < 0.4:
                f.set_final(s, round(rnd.uniform(0, 3), 3))

        def structure(g):
            return (g.start, g.num_states,
                    sorted((s, a.ilabel, a.olabel, round(a.weight, 3),
                            a.nextstate)
                           for s in range(g.num_states) for a in g.arcs[s]),
                    {s: round(w, 3) for s, w in g.final.items()})

        pv = str(tmp_path / f"r{trial}_v.fst")
        f.write_binary(pv)
        assert structure(openfst_io.read_fst(pv)) == structure(f)
        pc = str(tmp_path / f"r{trial}_c.fst")
        openfst_io.write_const_fst(f, pc)
        assert structure(openfst_io.read_fst(pc)) == structure(f)


def test_lattice_ark_empty_and_single_node(tmp_path):
    from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice
    from pytorch_kaldi_asr_tpu.fst import openfst_io

    # single node, final, no links
    lat = WordLattice(utt="solo")
    n0 = lat.add_node(0)
    lat.finals[n0] = 0.25
    ark = str(tmp_path / "solo.ark")
    openfst_io.write_lattice_ark([lat], ark, {})
    (utt, got), = list(openfst_io.read_lattice_ark(ark, {}))
    assert utt == "solo"
    assert got.num_nodes == 1 and not got.links
    assert abs(got.finals[0] - 0.25) < 1e-6

    # empty ark file: iterator terminates immediately
    open(str(tmp_path / "none.ark"), "wb").close()
    assert list(openfst_io.read_lattice_ark(str(tmp_path / "none.ark"),
                                            {})) == []
