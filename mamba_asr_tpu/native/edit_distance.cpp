// Fast Levenshtein alignment counts for WER/CER scoring.
//
// Native replacement for the metric hot path the reference delegates to
// speechbrain.utils.edit_distance (pure Python); full-test-set scoring
// (2620 utterances x ~35 words, plus char-level CER over ~180-char
// strings) is host-bound, so the DP runs here in C++ (-O3), exposed via
// ctypes (no pybind11 in this image).
//
// API: sequences are int32 id arrays (the caller maps words/chars to ids).
// Returns substitutions/insertions/deletions of one optimal alignment
// (ties broken sub > ins > del, matching the Python reference in
// training/metrics.py).

#include <cstdint>
#include <vector>

extern "C" {

// ref[n], hyp[m] -> out[3] = {sub, ins, del}; returns edit distance.
int64_t edit_distance_counts(const int32_t* ref, int64_t n,
                             const int32_t* hyp, int64_t m,
                             int64_t* out) {
  struct Cell {
    int32_t cost;
    int32_t sub, ins, del;
  };
  std::vector<Cell> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = {(int32_t)j, 0, (int32_t)j, 0};
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = {(int32_t)i, 0, 0, (int32_t)i};
    for (int64_t j = 1; j <= m; ++j) {
      if (ref[i - 1] == hyp[j - 1]) {
        cur[j] = prev[j - 1];
        continue;
      }
      const Cell& s = prev[j - 1];
      const Cell& a = cur[j - 1];
      const Cell& d = prev[j];
      int32_t cs = s.cost + 1, ca = a.cost + 1, cd = d.cost + 1;
      if (cs <= ca && cs <= cd) {
        cur[j] = {cs, s.sub + 1, s.ins, s.del};
      } else if (ca <= cd) {
        cur[j] = {ca, a.sub, a.ins + 1, a.del};
      } else {
        cur[j] = {cd, d.sub, d.ins, d.del + 1};
      }
    }
    std::swap(prev, cur);
  }
  out[0] = prev[m].sub;
  out[1] = prev[m].ins;
  out[2] = prev[m].del;
  return prev[m].cost;
}

// Batched variant: flat ref/hyp id buffers with per-utterance lengths.
// outs is (batch, 3). Returns total edit distance.
int64_t edit_distance_batch(const int32_t* refs, const int64_t* ref_lens,
                            const int32_t* hyps, const int64_t* hyp_lens,
                            int64_t batch, int64_t* outs) {
  int64_t total = 0;
  int64_t roff = 0, hoff = 0;
  for (int64_t b = 0; b < batch; ++b) {
    total += edit_distance_counts(refs + roff, ref_lens[b], hyps + hoff,
                                  hyp_lens[b], outs + 3 * b);
    roff += ref_lens[b];
    hoff += hyp_lens[b];
  }
  return total;
}

}  // extern "C"
