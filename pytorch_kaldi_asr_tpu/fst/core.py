"""Mutable weighted FST over the tropical semiring.

The in-memory representation behind this framework's decoding-graph
pipeline (the role OpenFst's VectorFst<StdArc> plays for the reference's
vendored kaldi/utils/mkgraph.sh and arpa2fst).  Weights are tropical:
plus = min, times = +, zero = +inf, one = 0.0; label 0 is epsilon.

Serializations:
- text: AT&T format (``src dst ilabel olabel [weight]`` / final lines),
  compatible with the text emitters in lm/fst.py;
- binary: a VectorFst<StdArc>-shaped stream (little-endian header with
  fst/arc type strings, then per-state final weight + arc list) so graphs
  can be stored compactly; see write_binary for the exact layout.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

INF = math.inf
EPS = 0


@dataclass
class Arc:
    ilabel: int
    olabel: int
    weight: float
    nextstate: int

    def __iter__(self):  # unpacking convenience
        return iter((self.ilabel, self.olabel, self.weight, self.nextstate))


class Fst:
    """states are dense ints; ``arcs[s]`` is the outgoing arc list;
    ``final[s]`` is the final weight (absent = not final)."""

    def __init__(self):
        self.arcs: list[list[Arc]] = []
        self.final: dict[int, float] = {}
        self.start: int = -1

    # -- construction -----------------------------------------------------

    def add_state(self) -> int:
        self.arcs.append([])
        return len(self.arcs) - 1

    def add_arc(self, state, ilabel, olabel, weight, nextstate):
        self.arcs[state].append(Arc(ilabel, olabel, float(weight), nextstate))

    def set_final(self, state, weight=0.0):
        self.final[state] = float(weight)

    @property
    def num_states(self):
        return len(self.arcs)

    @property
    def num_arcs(self):
        return sum(len(a) for a in self.arcs)

    def is_final(self, s):
        return s in self.final

    def final_weight(self, s):
        return self.final.get(s, INF)

    # -- basic transforms --------------------------------------------------

    def arcsort(self, sort_type="ilabel"):
        key = (lambda a: (a.ilabel, a.olabel)) if sort_type == "ilabel" else (
            lambda a: (a.olabel, a.ilabel))
        for lst in self.arcs:
            lst.sort(key=key)
        return self

    def connect(self):
        """Trim states not on a successful (start -> final) path."""
        if self.start < 0:
            return self
        # forward reachability
        fwd = set()
        stack = [self.start]
        while stack:
            s = stack.pop()
            if s in fwd:
                continue
            fwd.add(s)
            stack.extend(a.nextstate for a in self.arcs[s])
        # backward from finals (over the reversed graph, restricted to fwd)
        rev: dict[int, list[int]] = {}
        for s in fwd:
            for a in self.arcs[s]:
                if a.nextstate in fwd:
                    rev.setdefault(a.nextstate, []).append(s)
        bwd = set()
        stack = [s for s in self.final if s in fwd]
        while stack:
            s = stack.pop()
            if s in bwd:
                continue
            bwd.add(s)
            stack.extend(rev.get(s, []))
        keep = fwd & bwd
        remap = {}
        out = Fst()
        for s in range(self.num_states):
            if s in keep:
                remap[s] = out.add_state()
        for s in keep:
            for a in self.arcs[s]:
                if a.nextstate in keep:
                    out.add_arc(remap[s], a.ilabel, a.olabel, a.weight,
                                remap[a.nextstate])
        for s, w in self.final.items():
            if s in keep:
                out.set_final(remap[s], w)
        out.start = remap.get(self.start, -1)
        self.arcs, self.final, self.start = out.arcs, out.final, out.start
        return self

    def copy(self):
        out = Fst()
        out.start = self.start
        out.final = dict(self.final)
        out.arcs = [[Arc(*a) for a in lst] for lst in self.arcs]
        return out

    # -- text format --------------------------------------------------------

    def write_text(self, path_or_file):
        close = False
        f = path_or_file
        if isinstance(f, str):
            f = open(f, "w", encoding="utf-8")
            close = True
        try:
            # AT&T convention: the start state's lines come first
            order = [self.start] + [
                s for s in range(self.num_states) if s != self.start
            ] if self.start >= 0 else range(self.num_states)
            for s in order:
                for a in self.arcs[s]:
                    if a.weight == 0.0:
                        f.write(f"{s} {a.nextstate} {a.ilabel} {a.olabel}\n")
                    else:
                        f.write(
                            f"{s} {a.nextstate} {a.ilabel} {a.olabel} {a.weight:.6g}\n"
                        )
                if s in self.final:
                    w = self.final[s]
                    f.write(f"{s}\n" if w == 0.0 else f"{s} {w:.6g}\n")
        finally:
            if close:
                f.close()

    @classmethod
    def read_text(cls, path_or_file):
        close = False
        f = path_or_file
        if isinstance(f, str):
            f = open(f, encoding="utf-8")
            close = True
        try:
            fst = cls()

            def state(n):
                n = int(n)
                while fst.num_states <= n:
                    fst.add_state()
                return n

            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if len(parts) >= 4:
                    s, d = state(parts[0]), state(parts[1])
                    w = float(parts[4]) if len(parts) > 4 else 0.0
                    fst.add_arc(s, int(parts[2]), int(parts[3]), w, d)
                    if fst.start < 0:
                        fst.start = s
                else:
                    s = state(parts[0])
                    fst.set_final(s, float(parts[1]) if len(parts) > 1 else 0.0)
                    if fst.start < 0:
                        fst.start = s
            return fst
        finally:
            if close:
                f.close()

    # -- binary format -------------------------------------------------------
    # Layout (little endian), modeled on VectorFst<StdArc>:
    #   int32 magic (0x7EB2FDD6) | string fsttype | string arctype |
    #   int32 version | int32 flags | uint64 properties |
    #   int64 start | int64 numstates | int64 numarcs
    #   per state: float final (inf if none) | int64 narcs |
    #              narcs * (int32 ilabel, int32 olabel, float weight,
    #                       int32 nextstate)
    # Strings are int32 length + utf-8 bytes.

    _MAGIC = 0x7EB2FDD6

    @staticmethod
    def _wstr(f, s):
        b = s.encode()
        f.write(struct.pack("<i", len(b)))
        f.write(b)

    @staticmethod
    def _rstr(f):
        (n,) = struct.unpack("<i", f.read(4))
        return f.read(n).decode()

    def write_binary(self, path):
        with open(path, "wb") as f:
            f.write(struct.pack("<i", self._MAGIC))
            self._wstr(f, "vector")
            self._wstr(f, "standard")
            f.write(struct.pack("<iiQ", 2, 0, 0))
            f.write(struct.pack("<qqq", self.start, self.num_states,
                                self.num_arcs))
            for s in range(self.num_states):
                final = self.final.get(s, INF)
                f.write(struct.pack("<f", final))
                f.write(struct.pack("<q", len(self.arcs[s])))
                for a in self.arcs[s]:
                    f.write(struct.pack("<iifi", a.ilabel, a.olabel,
                                        a.weight, a.nextstate))
        return path

    @classmethod
    def read_binary(cls, path):
        with open(path, "rb") as f:
            (magic,) = struct.unpack("<i", f.read(4))
            if magic != cls._MAGIC:
                raise ValueError(f"bad FST magic {magic:#x} in {path}")
            fsttype = cls._rstr(f)
            arctype = cls._rstr(f)
            if fsttype != "vector" or arctype != "standard":
                raise ValueError(f"unsupported fst {fsttype}/{arctype}")
            _version, _flags, _props = struct.unpack("<iiQ", f.read(16))
            start, nstates, _narcs = struct.unpack("<qqq", f.read(24))
            fst = cls()
            for _ in range(nstates):
                fst.add_state()
            fst.start = start
            for s in range(nstates):
                (final,) = struct.unpack("<f", f.read(4))
                if final != INF:
                    fst.set_final(s, final)
                (narcs,) = struct.unpack("<q", f.read(8))
                raw = f.read(16 * narcs)
                for i in range(narcs):
                    il, ol, w, ns = struct.unpack_from("<iifi", raw, 16 * i)
                    fst.add_arc(s, il, ol, w, ns)
            return fst

    # -- inspection ----------------------------------------------------------

    def paths(self, max_paths=10000):
        """Enumerate accepted (input, output, weight) paths — acyclic FSTs
        only; used by tests."""
        results = []

        def walk(s, ilabs, olabs, w):
            if len(results) >= max_paths:
                return
            if s in self.final:
                results.append((tuple(ilabs), tuple(olabs),
                                w + self.final[s]))
            for a in self.arcs[s]:
                walk(a.nextstate,
                     ilabs + ([a.ilabel] if a.ilabel != EPS else []),
                     olabs + ([a.olabel] if a.olabel != EPS else []),
                     w + a.weight)

        if self.start >= 0:
            walk(self.start, [], [], 0.0)
        return results
