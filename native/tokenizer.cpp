// Native host tokenizer: FNV-1a hash tokenizer + greedy WordPiece.
//
// ASCII fast path for radiant_rag_tpu/models/tokenizer.py — the Python
// wrapper routes only texts where `str.isascii()` holds here (non-ASCII falls
// back to the Python implementation), so the byte semantics below only need
// to match Python's on ASCII input:
//   - str.lower(): 'A'-'Z' -> 'a'-'z'
//   - regex [a-z0-9]+|[^\sa-z0-9] with re.I: alnum runs, else single chars
//   - \s on ASCII: \t \n \v \f \r \x1c-\x1f and ' '
//   - stable_hash32: FNV-1a over UTF-8 bytes (== raw bytes for ASCII)
//
// Replaces the hot host-side loop of ingest (reference runs tokenization in
// HF fast tokenizers — rust — inside SentenceTransformer.encode,
// `local_models.py`; here the native unit is scoped to exactly the two
// tokenizers the framework ships).
//
// C ABI + ctypes (pybind11 not in the toolchain); compiled on first use by
// radiant_rag_tpu/index/native.py.

#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

inline bool is_space(uint8_t c) {
  return c == 9 || c == 10 || c == 11 || c == 12 || c == 13 ||
         (c >= 28 && c <= 32);
}
inline bool is_alnum_lower(uint8_t c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}
inline uint8_t to_lower(uint8_t c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<uint8_t>(c + 32) : c;
}

struct WpVocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t unk;
  int32_t lowercase;
  int32_t max_chars;
};

}  // namespace

extern "C" {

// Hash-tokenize a batch of ASCII texts (concatenated in `buf`, text i =
// bytes [offsets[i], offsets[i+1])). Writes up to max_ids token ids per text
// into out_ids (row-major (n, max_ids)) and the emitted count (clipped) into
// out_lens[i]. id = reserved + fnv1a(word) % (vocab_size - reserved).
void tok_hash_batch(const uint8_t* buf, const int64_t* offsets, int64_t n,
                    int32_t vocab_size, int32_t reserved, int32_t max_ids,
                    int32_t* out_ids, int32_t* out_lens) {
  const uint32_t span = static_cast<uint32_t>(vocab_size - reserved);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + offsets[i];
    const uint8_t* end = buf + offsets[i + 1];
    int32_t cnt = 0;
    int32_t* row = out_ids + i * static_cast<int64_t>(max_ids);
    while (p < end) {
      uint8_t c = to_lower(*p);
      if (is_space(c)) {
        ++p;
        continue;
      }
      uint32_t h = 0x811C9DC5u;
      if (is_alnum_lower(c)) {
        while (p < end) {
          uint8_t d = to_lower(*p);
          if (!is_alnum_lower(d)) break;
          h ^= d;
          h *= 0x01000193u;
          ++p;
        }
      } else {
        h ^= c;
        h *= 0x01000193u;
        ++p;
      }
      if (cnt < max_ids) row[cnt] = static_cast<int32_t>(reserved + (h % span));
      ++cnt;
    }
    out_lens[i] = cnt < max_ids ? cnt : max_ids;
  }
}

// Build a WordPiece vocab handle. Terms are utf-8 blobs (term i = bytes
// [offs[i], offs[i+1])) mapped to ids[i].
void* wp_new(const uint8_t* blob, const int64_t* offs, int64_t n_terms,
             const int32_t* ids, int32_t unk_id, int32_t lowercase,
             int32_t max_chars) {
  auto* v = new WpVocab();
  v->map.reserve(static_cast<size_t>(n_terms) * 2);
  for (int64_t i = 0; i < n_terms; ++i) {
    v->map.emplace(std::string(reinterpret_cast<const char*>(blob) + offs[i],
                               static_cast<size_t>(offs[i + 1] - offs[i])),
                   ids[i]);
  }
  v->unk = unk_id;
  v->lowercase = lowercase;
  v->max_chars = max_chars;
  return v;
}

void wp_free(void* h) { delete static_cast<WpVocab*>(h); }

// Greedy longest-match-first WordPiece over ASCII texts; same batch layout
// as tok_hash_batch. A word with any unmatched remainder emits a single UNK.
void wp_tokenize_batch(const void* h, const uint8_t* buf,
                       const int64_t* offsets, int64_t n, int32_t max_ids,
                       int32_t* out_ids, int32_t* out_lens) {
  const auto* v = static_cast<const WpVocab*>(h);
  std::string word;
  std::string piece;
  std::vector<int32_t> word_ids;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + offsets[i];
    const uint8_t* end = buf + offsets[i + 1];
    int32_t cnt = 0;
    int32_t* row = out_ids + i * static_cast<int64_t>(max_ids);
    auto emit = [&](int32_t id) {
      if (cnt < max_ids) row[cnt] = id;
      ++cnt;
    };
    while (p < end) {
      uint8_t c = v->lowercase ? to_lower(*p) : *p;
      if (is_space(c)) {
        ++p;
        continue;
      }
      word.clear();
      bool alnum = v->lowercase ? is_alnum_lower(c)
                                : (is_alnum_lower(to_lower(c)));
      if (alnum) {
        while (p < end) {
          uint8_t d = v->lowercase ? to_lower(*p) : *p;
          if (!is_alnum_lower(v->lowercase ? d : to_lower(d))) break;
          word.push_back(static_cast<char>(d));
          ++p;
        }
      } else {
        word.push_back(static_cast<char>(c));
        ++p;
      }
      if (static_cast<int32_t>(word.size()) > v->max_chars) {
        emit(v->unk);
        continue;
      }
      size_t start = 0;
      bool ok = true;
      word_ids.clear();
      while (start < word.size()) {
        size_t e = word.size();
        int32_t cur = -1;
        while (start < e) {
          piece.clear();
          if (start > 0) piece = "##";
          piece.append(word, start, e - start);
          auto it = v->map.find(piece);
          if (it != v->map.end()) {
            cur = it->second;
            break;
          }
          --e;
        }
        if (cur < 0) {
          ok = false;
          break;
        }
        word_ids.push_back(cur);
        start = e;
      }
      if (ok) {
        for (int32_t id : word_ids) emit(id);
      } else {
        emit(v->unk);
      }
    }
    out_lens[i] = cnt < max_ids ? cnt : max_ids;
  }
}

}  // extern "C"
