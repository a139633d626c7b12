// Levenshtein edit distance with insertion/deletion/substitution breakdown —
// the compute core of the compute-wer clone (role of the Kaldi C++ binary at
// reference run.sh:192-195).  Tokens are pre-hashed to int32 ids by the
// caller, so the DP is pure integer work.

#include <cstdint>
#include <vector>

extern "C" {

// ref/hyp: int32 token id arrays. Fills err/ins/del/sub. Returns 0.
int pka_edit_distance(const int32_t* ref, int32_t ref_len,
                      const int32_t* hyp, int32_t hyp_len, int32_t* err,
                      int32_t* ins, int32_t* del, int32_t* sub) {
  if (ref_len == 0) {
    *err = *ins = hyp_len;
    *del = *sub = 0;
    return 0;
  }
  if (hyp_len == 0) {
    *err = *del = ref_len;
    *ins = *sub = 0;
    return 0;
  }
  struct Cell {
    int32_t total, ins, del, sub;
  };
  std::vector<Cell> prev(hyp_len + 1), cur(hyp_len + 1);
  for (int32_t j = 0; j <= hyp_len; ++j) prev[j] = {j, j, 0, 0};
  for (int32_t i = 1; i <= ref_len; ++i) {
    cur[0] = {i, 0, i, 0};
    for (int32_t j = 1; j <= hyp_len; ++j) {
      const int match = (ref[i - 1] == hyp[j - 1]) ? 0 : 1;
      const int32_t diag = prev[j - 1].total + match;
      const int32_t up = prev[j].total + 1;
      const int32_t left = cur[j - 1].total + 1;
      if (diag <= up && diag <= left) {
        cur[j] = {diag, prev[j - 1].ins, prev[j - 1].del,
                  prev[j - 1].sub + match};
      } else if (up <= left) {
        cur[j] = {up, prev[j].ins, prev[j].del + 1, prev[j].sub};
      } else {
        cur[j] = {left, cur[j - 1].ins + 1, cur[j - 1].del, cur[j - 1].sub};
      }
    }
    prev.swap(cur);
  }
  *err = prev[hyp_len].total;
  *ins = prev[hyp_len].ins;
  *del = prev[hyp_len].del;
  *sub = prev[hyp_len].sub;
  return 0;
}

}  // extern "C"
