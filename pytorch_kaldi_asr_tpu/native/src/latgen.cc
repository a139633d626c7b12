// Frame-synchronous Viterbi beam decoder over a compiled (H)LG graph —
// the native hot loop behind decode/latgen.py (StreamingLatgen).  Same
// role Kaldi's C++ decoder binaries play for the reference (SURVEY.md
// §2c); semantics are pinned 1:1 against the pure-Python decoder (it
// remains the oracle/fallback): identical beam + histogram pruning,
// epsilon relaxation, traceback arena with reachability compaction, and
// identical float64 arithmetic so decoded outputs match exactly
// (modulo exact-cost ties, which random-real posteriors never produce).
//
// C API (ctypes, see native/__init__.py):
//   pka_graph_create / pka_graph_destroy        — shared, read-only graph
//   pka_latgen_create / reset / push / partial /
//   finish / dead / frames / destroy            — one handle per stream

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct Arc {
  int32_t il, ol, next;
  double w;
};

struct Graph {
  int32_t n_states = 0;
  int32_t start = -1;
  // split by emitting-ness once, so the frame loop never tests ilabel
  std::vector<std::vector<Arc>> eps_arcs, emit_arcs;
  std::vector<double> finals;  // +inf = not final
};

struct TB {
  int64_t prev;
  int32_t ol, il;
};

using Tokens = std::unordered_map<int32_t, std::pair<double, int64_t>>;

struct Decoder {
  const Graph* g;
  double ascale, beam;
  int32_t max_active, sym_offset;
  int64_t compact_threshold;
  std::vector<double> log_priors;  // empty = none

  std::vector<TB> tbs;
  Tokens tokens;
  bool dead = false;
  int64_t frames = 0;

  void reset() {
    tbs.clear();
    tbs.push_back({-1, 0, 0});
    tokens.clear();
    tokens.emplace(g->start, std::make_pair(0.0, int64_t{0}));
    eps_expand(tokens);
    dead = false;
    frames = 0;
  }

  void eps_expand(Tokens& toks) {
    std::vector<int32_t> stack;
    stack.reserve(toks.size());
    for (const auto& kv : toks) stack.push_back(kv.first);
    while (!stack.empty()) {
      int32_t s = stack.back();
      stack.pop_back();
      auto cur = toks[s];  // (cost, tb) — re-read at pop time, like Python
      for (const Arc& a : g->eps_arcs[s]) {
        double nc = cur.first + a.w;
        auto it = toks.find(a.next);
        if (it == toks.end() || nc < it->second.first) {
          tbs.push_back({cur.second, a.ol, 0});
          toks[a.next] = {nc, (int64_t)tbs.size() - 1};
          stack.push_back(a.next);
        }
      }
    }
  }

  // returns 1 while alive, 0 once the beam died
  int push(const double* posts, int64_t T, int32_t n_ph) {
    if (dead) return 0;
    for (int64_t t = 0; t < T; ++t) {
      const double* row = posts + t * n_ph;
      Tokens nxt;
      nxt.reserve(tokens.size() * 2 + 16);
      double best = kInf;
      for (const auto& kv : tokens) {
        double cost = kv.second.first;
        int64_t tb = kv.second.second;
        for (const Arc& a : g->emit_arcs[kv.first]) {
          int32_t col = a.il - sym_offset;
          if (col < 0 || col >= n_ph) continue;
          double lp = row[col];
          if (!log_priors.empty()) lp -= log_priors[col];
          double nc = cost + a.w + (-ascale) * lp;
          if (nc >= best + beam) continue;
          auto it = nxt.find(a.next);
          if (it == nxt.end() || nc < it->second.first) {
            tbs.push_back({tb, a.ol, a.il});
            nxt[a.next] = {nc, (int64_t)tbs.size() - 1};
            if (nc < best) best = nc;
          }
        }
      }
      if (nxt.empty()) {
        dead = true;
        return 0;
      }
      double cut = best + beam;
      if ((int64_t)nxt.size() > max_active) {
        std::vector<double> costs;
        costs.reserve(nxt.size());
        for (const auto& kv : nxt)
          if (kv.second.first <= cut) costs.push_back(kv.second.first);
        if ((int64_t)costs.size() > max_active) {
          std::nth_element(costs.begin(), costs.begin() + (max_active - 1),
                           costs.end());
          cut = costs[max_active - 1];
        }
      }
      for (auto it = nxt.begin(); it != nxt.end();) {
        if (it->second.first > cut)
          it = nxt.erase(it);
        else
          ++it;
      }
      eps_expand(nxt);
      tokens = std::move(nxt);
      ++frames;
      if ((int64_t)tbs.size() > compact_threshold) compact();
    }
    return 1;
  }

  void compact() {
    std::unordered_set<int64_t> reach;
    reach.reserve(tokens.size() * 64);
    for (const auto& kv : tokens) {
      int64_t tb = kv.second.second;
      while (tb >= 0 && !reach.count(tb)) {
        reach.insert(tb);
        tb = tbs[tb].prev;
      }
    }
    std::vector<int64_t> order(reach.begin(), reach.end());
    std::sort(order.begin(), order.end());
    std::unordered_map<int64_t, int64_t> remap;
    remap.reserve(order.size() * 2);
    for (size_t i = 0; i < order.size(); ++i) remap[order[i]] = (int64_t)i;
    std::vector<TB> out;
    out.reserve(order.size());
    for (int64_t old : order) {
      const TB& e = tbs[old];
      auto it = remap.find(e.prev);
      out.push_back({it == remap.end() ? -1 : it->second, e.ol, e.il});
    }
    tbs = std::move(out);
    for (auto& kv : tokens) kv.second.second = remap[kv.second.second];
  }

  // best ALIVE token's olabels; returns count (may exceed cap: caller
  // re-calls with a bigger buffer), or -1 if dead/empty
  int64_t partial(int32_t* words, int64_t cap, double* cost) const {
    if (dead || tokens.empty()) return -1;
    double bc = kInf;
    int64_t btb = -1;
    for (const auto& kv : tokens) {
      if (kv.second.first < bc) {
        bc = kv.second.first;
        btb = kv.second.second;
      }
    }
    *cost = bc;
    std::vector<int32_t> rev;
    for (int64_t tb = btb; tb >= 0; tb = tbs[tb].prev)
      if (tbs[tb].ol != 0) rev.push_back(tbs[tb].ol);
    int64_t n = (int64_t)rev.size();
    for (int64_t i = 0; i < n && i < cap; ++i) words[i] = rev[n - 1 - i];
    return n;
  }

  // best FINAL token's (olabel, ilabel) entries in temporal order,
  // epsilon entries included (decode/align.py recovers frame indices by
  // counting emitting entries).  Returns count (may exceed cap), or -1.
  int64_t finish(int32_t* ols, int32_t* ils, int64_t cap,
                 double* cost) const {
    if (dead) return -1;
    double bc = kInf;
    int64_t btb = -1;
    bool found = false;
    for (const auto& kv : tokens) {
      double fw = g->finals[kv.first];
      if (fw == kInf) continue;
      double total = kv.second.first + fw;
      if (total < bc) {
        bc = total;
        btb = kv.second.second;
        found = true;
      }
    }
    if (!found) return -1;
    *cost = bc;
    std::vector<std::pair<int32_t, int32_t>> rev;
    for (int64_t tb = btb; tb >= 0; tb = tbs[tb].prev)
      rev.push_back({tbs[tb].ol, tbs[tb].il});
    int64_t n = (int64_t)rev.size();
    for (int64_t i = 0; i < n && i < cap; ++i) {
      ols[i] = rev[n - 1 - i].first;
      ils[i] = rev[n - 1 - i].second;
    }
    return n;
  }
};

}  // namespace

extern "C" {

void* pka_graph_create(int32_t n_states, int32_t start,
                       const int64_t* row_off, const int32_t* il,
                       const int32_t* ol, const double* w, const int32_t* ns,
                       const double* finals) {
  Graph* g = new Graph();
  g->n_states = n_states;
  g->start = start;
  g->eps_arcs.resize(n_states);
  g->emit_arcs.resize(n_states);
  g->finals.assign(finals, finals + n_states);
  for (int32_t s = 0; s < n_states; ++s) {
    for (int64_t a = row_off[s]; a < row_off[s + 1]; ++a) {
      Arc arc{il[a], ol[a], ns[a], w[a]};
      (arc.il == 0 ? g->eps_arcs : g->emit_arcs)[s].push_back(arc);
    }
  }
  return g;
}

void pka_graph_destroy(void* h) { delete static_cast<Graph*>(h); }

void* pka_latgen_create(void* graph, double acoustic_scale, double beam,
                        int32_t max_active, const double* log_priors,
                        int32_t n_priors, int32_t sym_offset,
                        int64_t compact_threshold) {
  Decoder* d = new Decoder();
  d->g = static_cast<const Graph*>(graph);
  d->ascale = acoustic_scale;
  d->beam = beam;
  d->max_active = max_active;
  d->sym_offset = sym_offset;
  d->compact_threshold = compact_threshold;
  if (log_priors && n_priors > 0)
    d->log_priors.assign(log_priors, log_priors + n_priors);
  d->reset();
  return d;
}

void pka_latgen_destroy(void* h) { delete static_cast<Decoder*>(h); }
void pka_latgen_reset(void* h) { static_cast<Decoder*>(h)->reset(); }

int32_t pka_latgen_push(void* h, const double* posts, int64_t T,
                        int32_t n_ph) {
  return static_cast<Decoder*>(h)->push(posts, T, n_ph);
}

int32_t pka_latgen_dead(void* h) {
  return static_cast<Decoder*>(h)->dead ? 1 : 0;
}

int64_t pka_latgen_frames(void* h) {
  return static_cast<Decoder*>(h)->frames;
}

int64_t pka_latgen_partial(void* h, int32_t* words, int64_t cap,
                           double* cost) {
  return static_cast<Decoder*>(h)->partial(words, cap, cost);
}

int64_t pka_latgen_finish(void* h, int32_t* ols, int32_t* ils, int64_t cap,
                          double* cost) {
  return static_cast<Decoder*>(h)->finish(ols, ils, cap, cost);
}

}  // extern "C"
