// Native bulk BM25 index builder.
//
// Replaces the Python per-document tokenize/count/append loop (the dominant
// cost of BM25 index construction at corpus scale) with a single C++ pass:
// tokenize (ASCII lowercase alnum runs, length > 1 — byte-identical semantics
// to radiant_rag_tpu.index.bm25.tokenize for ASCII, and equivalent for
// non-ASCII since neither side matches non-ASCII bytes), build the term
// vocabulary, document frequencies, CSR postings sorted by term, and document
// lengths. Exposed via a C ABI for ctypes (no pybind11 in this toolchain).
//
// Reference capability: storage/bm25_index.py builds the same statistics
// incrementally in Python (add_document, `bm25_index.py:139-180`).

#include <cstdint>
#include <cstring>
#include <deque>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Build {
  // vocab: concatenated term bytes + offsets
  std::string term_bytes;
  std::vector<int64_t> term_offsets;  // T+1
  std::vector<int64_t> df;            // T
  // CSR postings by term
  std::vector<int64_t> term_start;    // T+1
  std::vector<int32_t> post_rows;     // P
  std::vector<float>   post_tfs;      // P
  // per-doc
  std::vector<int32_t> doc_lens;      // n_docs (token counts)
  // per-doc term lists (for persistence): term ids + counts, CSR by doc
  std::vector<int64_t> doc_term_start;  // n_docs+1
  std::vector<int32_t> doc_term_ids;
  std::vector<int32_t> doc_term_tfs;
};

inline bool is_alnum(uint8_t c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
}

inline uint8_t lower(uint8_t c) {
  return (c >= 'A' && c <= 'Z') ? c + 32 : c;
}

}  // namespace

extern "C" {

// Build from concatenated UTF-8 text. doc_offsets has n_docs+1 entries.
// rows[i] is the engine row id for doc i (postings reference these).
// Returns an opaque handle; query the arrays with the getters; free with
// bm25_build_free.
void* bm25_build(const uint8_t* text, const int64_t* doc_offsets,
                 int64_t n_docs, const int32_t* rows) {
  auto* b = new Build();
  std::unordered_map<std::string_view, int32_t> vocab;
  vocab.reserve(1 << 16);
  // postings collected per term in growable vectors-of-pairs
  std::vector<std::vector<std::pair<int32_t, float>>> postings;
  postings.reserve(1 << 16);
  // term string storage: the vocab map keys are string_views into these
  // strings, so element addresses MUST be stable across growth. A
  // std::vector<std::string> reallocates and moves SSO strings (dangling
  // every view once unique terms exceed the reserve); std::deque never
  // moves existing elements on push_back.
  std::deque<std::string> term_store;

  b->doc_lens.resize(n_docs);
  b->doc_term_start.resize(n_docs + 1, 0);

  std::unordered_map<int32_t, int32_t> counts;  // term id -> tf (per doc)
  std::string token;
  token.reserve(64);

  for (int64_t d = 0; d < n_docs; ++d) {
    const uint8_t* p = text + doc_offsets[d];
    const uint8_t* end = text + doc_offsets[d + 1];
    counts.clear();
    int32_t n_tokens = 0;
    while (p < end) {
      token.clear();
      while (p < end) {
        uint8_t c = lower(*p);
        if (is_alnum(c)) { token.push_back(static_cast<char>(c)); ++p; }
        else break;
      }
      if (token.empty()) { ++p; continue; }
      if (token.size() > 1) {
        ++n_tokens;
        auto it = vocab.find(std::string_view(token));
        int32_t tid;
        if (it == vocab.end()) {
          tid = static_cast<int32_t>(term_store.size());
          term_store.emplace_back(token);
          vocab.emplace(std::string_view(term_store.back()), tid);
          postings.emplace_back();
        } else {
          tid = it->second;
        }
        ++counts[tid];
      }
    }
    b->doc_lens[d] = n_tokens;
    for (const auto& [tid, tf] : counts) {
      postings[tid].emplace_back(rows ? rows[d] : static_cast<int32_t>(d),
                                 static_cast<float>(tf));
      b->doc_term_ids.push_back(tid);
      b->doc_term_tfs.push_back(tf);
    }
    b->doc_term_start[d + 1] = static_cast<int64_t>(b->doc_term_ids.size());
  }

  // flatten vocab + postings into CSR
  const int64_t T = static_cast<int64_t>(term_store.size());
  b->term_offsets.resize(T + 1, 0);
  b->term_start.resize(T + 1, 0);
  b->df.resize(T, 0);
  int64_t total_post = 0, total_bytes = 0;
  for (int64_t t = 0; t < T; ++t) {
    total_post += static_cast<int64_t>(postings[t].size());
    total_bytes += static_cast<int64_t>(term_store[t].size());
  }
  b->term_bytes.reserve(total_bytes);
  b->post_rows.reserve(total_post);
  b->post_tfs.reserve(total_post);
  for (int64_t t = 0; t < T; ++t) {
    b->term_bytes += term_store[t];
    b->term_offsets[t + 1] = static_cast<int64_t>(b->term_bytes.size());
    b->df[t] = static_cast<int64_t>(postings[t].size());
    for (const auto& [row, tf] : postings[t]) {
      b->post_rows.push_back(row);
      b->post_tfs.push_back(tf);
    }
    b->term_start[t + 1] = static_cast<int64_t>(b->post_rows.size());
  }
  return b;
}

void bm25_build_free(void* h) { delete static_cast<Build*>(h); }

int64_t bm25_num_terms(void* h) {
  return static_cast<int64_t>(static_cast<Build*>(h)->df.size());
}
int64_t bm25_num_postings(void* h) {
  return static_cast<int64_t>(static_cast<Build*>(h)->post_rows.size());
}
int64_t bm25_term_bytes_len(void* h) {
  return static_cast<int64_t>(static_cast<Build*>(h)->term_bytes.size());
}
int64_t bm25_doc_terms_len(void* h) {
  return static_cast<int64_t>(static_cast<Build*>(h)->doc_term_ids.size());
}

const char* bm25_term_bytes(void* h) {
  return static_cast<Build*>(h)->term_bytes.data();
}
const int64_t* bm25_term_offsets(void* h) {
  return static_cast<Build*>(h)->term_offsets.data();
}
const int64_t* bm25_df(void* h) { return static_cast<Build*>(h)->df.data(); }
const int64_t* bm25_term_start(void* h) {
  return static_cast<Build*>(h)->term_start.data();
}
const int32_t* bm25_post_rows(void* h) {
  return static_cast<Build*>(h)->post_rows.data();
}
const float* bm25_post_tfs(void* h) {
  return static_cast<Build*>(h)->post_tfs.data();
}
const int32_t* bm25_doc_lens(void* h) {
  return static_cast<Build*>(h)->doc_lens.data();
}
const int64_t* bm25_doc_term_start(void* h) {
  return static_cast<Build*>(h)->doc_term_start.data();
}
const int32_t* bm25_doc_term_ids(void* h) {
  return static_cast<Build*>(h)->doc_term_ids.data();
}
const int32_t* bm25_doc_term_tfs(void* h) {
  return static_cast<Build*>(h)->doc_term_tfs.data();
}

// ---------------------------------------------------------------------------
// Query tokenize-to-term-ids: the per-batch host cost of the device BM25 path
// is dominated by Python regex tokenization of the query texts (~31 ms for a
// 1024x48-token batch). This context holds a hash of the index vocabulary
// (rebuilt only when the vocab grows); bm25_query_tids then turns a
// concatenated query batch into unique in-vocab term ids per query in one C
// pass — queries never materialize as Python strings.
// ---------------------------------------------------------------------------

namespace {
struct QueryCtx {
  std::string bytes;  // owned copy of concatenated term bytes
  std::unordered_map<std::string_view, int32_t> vocab;
};
}  // namespace

void* bm25_query_ctx_new(const uint8_t* term_bytes, const int64_t* term_offsets,
                         int64_t n_terms) {
  auto* c = new QueryCtx();
  c->bytes.assign(reinterpret_cast<const char*>(term_bytes),
                  static_cast<size_t>(term_offsets[n_terms]));
  c->vocab.reserve(static_cast<size_t>(n_terms) * 2);
  for (int64_t t = 0; t < n_terms; ++t) {
    c->vocab.emplace(
        std::string_view(c->bytes.data() + term_offsets[t],
                         static_cast<size_t>(term_offsets[t + 1] - term_offsets[t])),
        static_cast<int32_t>(t));
  }
  return c;
}

void bm25_query_ctx_free(void* h) { delete static_cast<QueryCtx*>(h); }

// Tokenize n_q concatenated queries (q_offsets: n_q+1) and write each query's
// UNIQUE in-vocab term ids (first-seen order, tokenizer semantics identical
// to bm25_build) into out_tids (n_q x max_terms, -1 padded). Token scanning
// stops contributing after cap_tokens tokens per query (mirrors the Python
// tokenize(q)[:max_query_terms] cap, which truncates the TOKEN stream before
// dedup). Returns total tids written.
int64_t bm25_query_tids(void* h, const uint8_t* text, const int64_t* q_offsets,
                        int64_t n_q, int64_t cap_tokens, int64_t max_terms,
                        int32_t* out_tids) {
  auto* c = static_cast<QueryCtx*>(h);
  std::string token;
  token.reserve(64);
  int64_t written = 0;
  for (int64_t q = 0; q < n_q; ++q) {
    const uint8_t* p = text + q_offsets[q];
    const uint8_t* end = text + q_offsets[q + 1];
    int32_t* out = out_tids + q * max_terms;
    int64_t n_out = 0, n_tok = 0;
    while (p < end && n_tok < cap_tokens) {
      token.clear();
      while (p < end) {
        uint8_t ch = lower(*p);
        if (is_alnum(ch)) { token.push_back(static_cast<char>(ch)); ++p; }
        else break;
      }
      if (token.empty()) { ++p; continue; }
      if (token.size() > 1) {
        ++n_tok;
        auto it = c->vocab.find(std::string_view(token));
        if (it != c->vocab.end()) {
          const int32_t tid = it->second;
          bool dup = false;  // linear dedup: n_out <= max_terms (tiny)
          for (int64_t j = 0; j < n_out; ++j) {
            if (out[j] == tid) { dup = true; break; }
          }
          if (!dup && n_out < max_terms) { out[n_out++] = tid; ++written; }
        }
      }
    }
  }
  return written;
}

}  // extern "C"
