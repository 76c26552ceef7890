// Native SentencePiece unigram Viterbi encoder.
//
// C++ core for the host-side tokenization hot loop, replacing the role of
// fairseq2n's C++ sentencepiece binding (reference import sites:
// sonar/inference_pipelines/text.py:13-14). Text normalization (NFKC + NMT
// rules + whitespace escaping) happens in Python; this core segments the
// normalized UTF-8 string with the same Viterbi DP as the pure-Python
// fallback (sonar_tpu/tokenizers/spm.py) — results must be bit-identical.
//
// Exposed via a plain C ABI for ctypes; calls release the GIL, so the data
// pipeline's num_parallel_calls threads scale.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC spm.cpp -o _sonar_native.so

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Piece {
  int32_t id;
  float score;
};

struct SpmModel {
  std::unordered_map<std::string, Piece> pieces;
  int32_t max_piece_chars = 1;
  int32_t unk_id = 0;
  float unk_score = -1e9f;
  int32_t byte_ids[256];
  bool byte_fallback = false;
};

// Byte offsets of UTF-8 character starts (plus end sentinel).
inline void char_starts(const char* s, int len, std::vector<int32_t>& out) {
  out.clear();
  for (int i = 0; i < len; ++i) {
    if ((s[i] & 0xC0) != 0x80) out.push_back(i);
  }
  out.push_back(len);
}

}  // namespace

extern "C" {

SpmModel* spm_create(const char* const* pieces, const int32_t* ids,
                     const float* scores, int32_t n, int32_t unk_id,
                     float unk_score, const int32_t* byte_ids) {
  auto* m = new SpmModel();
  m->unk_id = unk_id;
  m->unk_score = unk_score;
  m->pieces.reserve(static_cast<size_t>(n) * 2);
  for (int32_t i = 0; i < n; ++i) {
    std::string p(pieces[i]);
    // Count UTF-8 chars for the max piece length bound.
    int32_t chars = 0;
    for (char c : p)
      if ((c & 0xC0) != 0x80) ++chars;
    if (chars > m->max_piece_chars) m->max_piece_chars = chars;
    m->pieces.emplace(std::move(p), Piece{ids[i], scores[i]});
  }
  bool any_byte = false;
  for (int b = 0; b < 256; ++b) {
    m->byte_ids[b] = byte_ids ? byte_ids[b] : -1;
    any_byte |= (m->byte_ids[b] >= 0);
  }
  m->byte_fallback = any_byte;
  return m;
}

void spm_destroy(SpmModel* m) { delete m; }

// Viterbi-encode `text` (normalized UTF-8). Returns the number of ids
// written, or -1 if out buffer too small.
int32_t spm_encode(const SpmModel* m, const char* text, int32_t text_len,
                   int32_t* out, int32_t max_out) {
  if (text_len == 0) return 0;
  thread_local std::vector<int32_t> starts;
  char_starts(text, text_len, starts);
  const int n = static_cast<int>(starts.size()) - 1;  // chars

  constexpr double NEG = -1e18;
  thread_local std::vector<double> best;
  thread_local std::vector<int32_t> back_pos;
  thread_local std::vector<int32_t> back_id;
  best.assign(n + 1, NEG);
  back_pos.assign(n + 1, -1);
  back_id.assign(n + 1, -1);
  best[0] = 0.0;

  std::string key;
  for (int i = 0; i < n; ++i) {
    if (best[i] <= NEG) continue;
    const double bi = best[i];
    const int hi = std::min(n, i + m->max_piece_chars);
    bool found = false;
    for (int j = i + 1; j <= hi; ++j) {
      key.assign(text + starts[i], starts[j] - starts[i]);
      auto it = m->pieces.find(key);
      if (it == m->pieces.end()) continue;
      found = true;
      const double cand = bi + it->second.score;
      if (cand > best[j]) {
        best[j] = cand;
        back_pos[j] = i;
        back_id[j] = it->second.id;
      }
    }
    if (!found || best[i + 1] <= NEG) {
      const double cand = bi + m->unk_score;
      if (cand > best[i + 1]) {
        best[i + 1] = cand;
        back_pos[i + 1] = i;
        back_id[i + 1] = -1;  // unk / byte-fallback marker
      }
    }
  }

  // Backtrack (collect reversed), then emit forward.
  thread_local std::vector<int32_t> rev;
  rev.clear();
  int pos = n;
  while (pos > 0) {
    const int i = back_pos[pos];
    const int32_t id = back_id[pos];
    if (id == -1) {
      if (m->byte_fallback) {
        for (int b = starts[pos] - 1; b >= starts[i]; --b)
          rev.push_back(m->byte_ids[static_cast<uint8_t>(text[b])]);
      } else {
        rev.push_back(m->unk_id);
      }
    } else {
      rev.push_back(id);
    }
    pos = i;
  }
  const int32_t total = static_cast<int32_t>(rev.size());
  if (total > max_out) return -1;
  for (int32_t k = 0; k < total; ++k) out[k] = rev[total - 1 - k];
  return total;
}

}  // extern "C"
