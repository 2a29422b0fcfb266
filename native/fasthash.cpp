// fasthash: native batch text featurizer for ragfin_tpu.
//
// The host-side hot loop at index-build time is tokenize+hash over millions
// of chunk texts (the TPU does the projection; see
// ragfin_tpu/models/featurizer.py). This implements the exact same
// featurization natively:
//   - lowercase; digit-group commas removed ("10,636" -> "10636")
//   - tokens: decimal numbers (\d+(\.\d+)?) or ASCII letter runs
//   - features: unigrams + adjacent-word bigrams ("net_profit")
//   - FNV-1a 64-bit hash % vocab_size, with per-document TF counts
//
// Bit-for-bit parity with the Python featurizer is enforced by
// tests/test_native.py. Built as a shared library, bound via ctypes
// (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ULL;
constexpr uint64_t kFnvPrime = 0x100000001B3ULL;

inline uint64_t fnv1a64(const char* data, size_t len) {
  uint64_t h = kFnvOffset;
  for (size_t i = 0; i < len; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

inline bool is_digit(char c) { return c >= '0' && c <= '9'; }
inline bool is_alpha(char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline char to_lower(char c) { return (c >= 'A' && c <= 'Z') ? c + 32 : c; }

// Tokenize matching the Python regex \d+(?:\.\d+)? | [a-z]+ applied to the
// lowercased text with commas-between-digits removed first.
void tokenize(const char* text, std::vector<std::string>* out) {
  out->clear();
  size_t n = std::strlen(text);
  size_t i = 0;
  std::string tok;
  while (i < n) {
    char c = text[i];
    if (is_digit(c)) {
      tok.clear();
      while (i < n) {
        if (is_digit(text[i])) {
          tok.push_back(text[i]);
          ++i;
        } else if (text[i] == ',' && i + 1 < n && is_digit(text[i + 1]) &&
                   !tok.empty()) {
          ++i;  // comma between digits: elided before tokenization
        } else {
          break;
        }
      }
      // optional single decimal part
      if (i + 1 < n && text[i] == '.' && is_digit(text[i + 1])) {
        tok.push_back('.');
        ++i;
        while (i < n) {
          if (is_digit(text[i])) {
            tok.push_back(text[i]);
            ++i;
          } else if (text[i] == ',' && i + 1 < n && is_digit(text[i + 1])) {
            ++i;
          } else {
            break;
          }
        }
      }
      // Data-value numbers are not retrieval keys (mirrors Python
      // featurizer._is_retrieval_token): decimals and integers >= 5 digits
      // are dropped before unigram/bigram formation.
      if (tok.find('.') == std::string::npos && tok.size() < 5) {
        out->push_back(tok);
      }
    } else if (is_alpha(c)) {
      tok.clear();
      while (i < n && is_alpha(text[i])) {
        tok.push_back(to_lower(text[i]));
        ++i;
      }
      out->push_back(tok);
    } else {
      ++i;
    }
  }
}

}  // namespace

extern "C" {

// Featurize one batch of texts.
//  texts:      array of n_texts NUL-terminated UTF-8 strings
//  vocab_size: hash-bucket count
//  bigram_weight: contribution of each word bigram (0 disables bigrams)
//  max_feats:  per-text capacity of the output rows
//  out_ids:    [n_texts * max_feats] feature ids (row-major)
//  out_tf:     [n_texts * max_feats] raw term frequencies
//  out_lens:   [n_texts] number of distinct features written per text
// Returns 0 on success.
int ragfin_featurize_batch(const char** texts, int n_texts,
                           uint64_t vocab_size, float bigram_weight,
                           int max_feats, int32_t* out_ids, float* out_tf,
                           int32_t* out_lens) {
  if (vocab_size == 0 || max_feats <= 0) return 1;
  std::vector<std::string> toks;
  std::unordered_map<uint64_t, float> counts;
  std::string bigram;
  for (int t = 0; t < n_texts; ++t) {
    tokenize(texts[t], &toks);
    counts.clear();
    for (const auto& tok : toks) {
      counts[fnv1a64(tok.data(), tok.size()) % vocab_size] += 1.0f;
    }
    if (bigram_weight != 0.0f) {
      for (size_t i = 0; i + 1 < toks.size(); ++i) {
        bigram.assign(toks[i]);
        bigram.push_back('_');
        bigram.append(toks[i + 1]);
        counts[fnv1a64(bigram.data(), bigram.size()) % vocab_size] +=
            bigram_weight;
      }
    }
    int32_t len = 0;
    int32_t* ids_row = out_ids + static_cast<size_t>(t) * max_feats;
    float* tf_row = out_tf + static_cast<size_t>(t) * max_feats;
    for (const auto& kv : counts) {
      if (len >= max_feats) break;
      ids_row[len] = static_cast<int32_t>(kv.first);
      tf_row[len] = kv.second;
      ++len;
    }
    out_lens[t] = len;
  }
  return 0;
}

// Simple self-describing version tag for the ctypes loader.
int ragfin_fasthash_abi_version() { return 1; }

}  // extern "C"
