// Native WordPiece tokenizer — the host-side data-packing hot path.
//
// Dataset packing tokenizes every lyric sentence and topic prompt
// (reference MyDataset.py:62-118); for large corpora the pure-Python
// tokenizer dominates packing time. This C++ implementation mirrors
// mmtg_tpu/tokenizer.py: text cleanup, CJK-character isolation,
// lowercasing + accent stripping, punctuation splitting, then greedy
// longest-match WordPiece with "##" continuations. Exposed as a minimal
// C API consumed via ctypes (no pybind11 in the image).
//
// Unicode handling is table-driven for the ranges that occur in the MMTG
// domain (CJK + Latin + common punctuation); parity with the Python
// tokenizer is enforced by tests/test_native_tokenizer.py over the real
// vocab. Build: `make -C native` → libwordpiece.so.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 100;
  size_t max_chars_per_word = 100;
};

// ---- UTF-8 <-> codepoints -------------------------------------------------

std::vector<uint32_t> decode_utf8(const char* s, size_t n) {
  std::vector<uint32_t> cps;
  cps.reserve(n);
  size_t i = 0;
  while (i < n) {
    unsigned char c = s[i];
    uint32_t cp;
    size_t len;
    if (c < 0x80) {
      cp = c;
      len = 1;
    } else if ((c >> 5) == 0x6) {
      cp = c & 0x1F;
      len = 2;
    } else if ((c >> 4) == 0xE) {
      cp = c & 0x0F;
      len = 3;
    } else if ((c >> 3) == 0x1E) {
      cp = c & 0x07;
      len = 4;
    } else {  // invalid byte — skip
      i += 1;
      continue;
    }
    if (i + len > n) break;
    bool ok = true;
    for (size_t j = 1; j < len; ++j) {
      unsigned char cc = s[i + j];
      if ((cc >> 6) != 0x2) {
        ok = false;
        break;
      }
      cp = (cp << 6) | (cc & 0x3F);
    }
    if (ok) cps.push_back(cp);
    i += len;
  }
  return cps;
}

void encode_utf8(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back((char)cp);
  } else if (cp < 0x800) {
    out->push_back((char)(0xC0 | (cp >> 6)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back((char)(0xE0 | (cp >> 12)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out->push_back((char)(0xF0 | (cp >> 18)));
    out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  }
}

// ---- character classes (mirrors tokenizer.py) ------------------------------

bool is_whitespace(uint32_t c) {
  if (c == ' ' || c == '\t' || c == '\n' || c == '\r') return true;
  // Unicode Zs
  return c == 0xA0 || (c >= 0x2000 && c <= 0x200A) || c == 0x202F ||
         c == 0x205F || c == 0x3000 || c == 0x1680;
}

bool is_control(uint32_t c) {
  if (c == '\t' || c == '\n' || c == '\r') return false;
  if (c < 0x20 || c == 0x7F || (c >= 0x80 && c <= 0x9F)) return true;  // Cc
  // Cf (format) chars seen in the wild
  return c == 0xAD || (c >= 0x200B && c <= 0x200F) ||
         (c >= 0x202A && c <= 0x202E) || (c >= 0x2060 && c <= 0x2064) ||
         c == 0xFEFF;
}

bool is_cjk(uint32_t c) {
  return (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
         (c >= 0x20000 && c <= 0x2A6DF) || (c >= 0x2A700 && c <= 0x2B73F) ||
         (c >= 0x2B740 && c <= 0x2B81F) || (c >= 0x2B820 && c <= 0x2CEAF) ||
         (c >= 0xF900 && c <= 0xFAFF) || (c >= 0x2F800 && c <= 0x2FA1F);
}

bool is_punctuation(uint32_t c) {
  // ASCII blocks BERT treats as punctuation
  if ((c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
      (c >= 123 && c <= 126))
    return true;
  // Unicode P* ranges common in the domain
  return (c >= 0x2010 && c <= 0x2027) ||            // dashes, quotes, …
         (c >= 0x2030 && c <= 0x205E) ||            // ‰ ′ ″ ※ etc.
         (c >= 0x3001 && c <= 0x3011) ||            // 、。〈〉《》「」『』【】
         (c >= 0x3014 && c <= 0x301F) || c == 0x30FB ||
         (c >= 0xFE30 && c <= 0xFE4F) ||            // vertical forms
         (c >= 0xFE50 && c <= 0xFE6B) ||            // small forms
         (c >= 0xFF01 && c <= 0xFF0F) || (c >= 0xFF1A && c <= 0xFF20) ||
         (c >= 0xFF3B && c <= 0xFF40) || (c >= 0xFF5B && c <= 0xFF65) ||
         c == 0xA7 || c == 0xB7 || c == 0xBF || c == 0xAB || c == 0xBB ||
         (c >= 0x2E00 && c <= 0x2E7F);
}

// lowercase + NFD accent strip for Latin-1 Supplement / Latin Extended-A.
// Returns 0 to drop the char (combining marks).
uint32_t lower_strip(uint32_t c) {
  if (c >= 'A' && c <= 'Z') return c + 32;
  if (c >= 0x300 && c <= 0x36F) return 0;  // combining marks (Mn)
  if (c >= 0xC0 && c <= 0xFF) {            // Latin-1 letters
    if (c >= 0xC0 && c <= 0xDE && c != 0xD7) c += 32;  // uppercase → lower
    switch (c) {
      case 0xE0: case 0xE1: case 0xE2: case 0xE3: case 0xE4: case 0xE5:
        return 'a';
      case 0xE7: return 'c';
      case 0xE8: case 0xE9: case 0xEA: case 0xEB: return 'e';
      case 0xEC: case 0xED: case 0xEE: case 0xEF: return 'i';
      case 0xF1: return 'n';
      case 0xF2: case 0xF3: case 0xF4: case 0xF5: case 0xF6: return 'o';
      case 0xF9: case 0xFA: case 0xFB: case 0xFC: return 'u';
      case 0xFD: case 0xFF: return 'y';
      default: return c;  // ø æ þ ß — no decomposition
    }
  }
  if (c >= 0x100 && c <= 0x17F) {
    // Latin Extended-A → lowercase ASCII base (generated from Python
    // unicodedata: lower() then NFD-strip). 0 = no single-ASCII base →
    // keep the char (exotic; never appears in the MMTG domain).
    static const uint8_t base[0x80] = {
        97,97,97,97,97,97,99,99,99,99,99,99,99,99,100,100,0,0,101,101,101,
        101,101,101,101,101,101,101,103,103,103,103,103,103,103,103,104,104,
        0,0,105,105,105,105,105,105,105,105,105,0,0,0,106,106,107,107,0,108,
        108,108,108,108,108,0,0,0,0,110,110,110,110,110,110,0,0,0,111,111,
        111,111,111,111,0,0,114,114,114,114,114,114,115,115,115,115,115,115,
        115,115,116,116,116,116,0,0,117,117,117,117,117,117,117,117,117,117,
        117,117,119,119,121,121,121,122,122,122,122,122,122,0};
    uint8_t b = base[c - 0x100];
    return b ? (uint32_t)b : c;
  }
  return c;
}

// ---- pipeline ---------------------------------------------------------------

std::vector<std::string> basic_tokenize(const char* text, size_t n) {
  std::vector<uint32_t> cps = decode_utf8(text, n);
  // clean + CJK isolate + lowercase/strip, building space-separated words
  std::vector<std::vector<uint32_t>> words;
  bool start_new = true;
  auto push = [&](uint32_t c, bool isolated) {
    if (isolated || start_new) {
      words.emplace_back();
      start_new = isolated;  // isolated chars end their own word
    }
    words.back().push_back(c);
    if (isolated) start_new = true;
  };
  for (uint32_t c : cps) {
    if (c == 0 || c == 0xFFFD || is_control(c)) continue;
    if (is_whitespace(c)) {
      start_new = true;
      continue;
    }
    if (is_cjk(c)) {
      push(c, true);
      continue;
    }
    uint32_t lc = lower_strip(c);
    if (lc == 0) continue;  // stripped combining mark
    if (is_punctuation(lc)) {
      push(lc, true);
      continue;
    }
    push(lc, false);
  }
  std::vector<std::string> out;
  out.reserve(words.size());
  for (auto& w : words) {
    std::string s;
    for (uint32_t c : w) encode_utf8(c, &s);
    if (!s.empty()) out.push_back(std::move(s));
  }
  return out;
}

size_t utf8_len(const std::string& s) {
  size_t n = 0;
  for (unsigned char c : s)
    if ((c & 0xC0) != 0x80) ++n;
  return n;
}

void wordpiece(const Tokenizer& tk, const std::string& word,
               std::vector<int32_t>* out) {
  if (utf8_len(word) > tk.max_chars_per_word) {
    out->push_back(tk.unk_id);
    return;
  }
  // byte offsets of codepoint starts
  std::vector<size_t> starts;
  for (size_t i = 0; i < word.size(); ++i)
    if (((unsigned char)word[i] & 0xC0) != 0x80) starts.push_back(i);
  starts.push_back(word.size());

  std::vector<int32_t> pieces;
  size_t si = 0;
  while (si + 1 < starts.size()) {
    int32_t found = -1;
    size_t found_end = si;
    for (size_t ei = starts.size() - 1; ei > si; --ei) {
      std::string sub = word.substr(starts[si], starts[ei] - starts[si]);
      if (si > 0) sub = "##" + sub;
      auto it = tk.vocab.find(sub);
      if (it != tk.vocab.end()) {
        found = it->second;
        found_end = ei;
        break;
      }
    }
    if (found < 0) {
      out->push_back(tk.unk_id);
      return;
    }
    pieces.push_back(found);
    si = found_end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path) {
  std::ifstream f(vocab_path);
  if (!f.is_open()) return nullptr;
  auto* tk = new Tokenizer();
  std::string line;
  int32_t idx = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (!line.empty()) tk->vocab.emplace(line, idx);
    ++idx;
  }
  auto it = tk->vocab.find("[UNK]");
  if (it != tk->vocab.end()) tk->unk_id = it->second;
  return tk;
}

void wp_free(void* h) { delete static_cast<Tokenizer*>(h); }

// Tokenize UTF-8 text to ids. Returns the number of ids written (clipped
// to max_out); returns -1 on invalid handle.
int32_t wp_tokenize_ids(void* h, const char* text, int32_t* out,
                        int32_t max_out) {
  if (h == nullptr) return -1;
  const auto& tk = *static_cast<Tokenizer*>(h);
  std::vector<int32_t> ids;
  for (const auto& word : basic_tokenize(text, strlen(text))) {
    wordpiece(tk, word, &ids);
  }
  int32_t n = (int32_t)ids.size();
  if (n > max_out) n = max_out;
  memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

int32_t wp_vocab_size(void* h) {
  if (h == nullptr) return -1;
  return (int32_t)static_cast<Tokenizer*>(h)->vocab.size();
}

// ---- corpus packer ---------------------------------------------------------
//
// Packs the token columns for n samples in one call — the host-side
// dataset hot loop (reference MyDataset.py:34-118: 1 topic + n_sents
// sentence tokenizations per sample) moves entirely into C++, threaded
// over samples (the tokenizer is read-only; ctypes releases the GIL).
//
// Framing contract (must stay bit-identical to mmtg_tpu/data.py):
//   topic (MyDataset.py:62-78): encode("主题词：" + topic)[:topic_len],
//     mask/type 1 on real tokens, pad_id/0/0 on padding.
//   lyrics (MyDataset.py:81-118): per sentence [#START#] + content[:max_sent]
//     + pads to max_sent+1 + [#EOS#] (= max_sent+2 tokens); content type =
//     pair+1, except the 5th pair "calls back" to type 1; START/EOS/pad
//     type 0; a single [SEP] (mask 1, type 0) closes the row. Sentences
//     are scrubbed of {space, \n, \t, \r, U+00A0, U+3000} BEFORE
//     tokenization (MyDataset.py:94-95 — the removal JOINS adjacent words,
//     so it cannot be folded into the tokenizer's whitespace handling).
//
// Output arrays are caller-allocated, row-major:
//   topic_ids/topic_mask/topic_type: [n, topic_len]
//   targets/mask/type_ids:           [n, n_sents*(max_sent+2)+1]
// Returns 0, or -1 on an invalid handle.

extern "C" int32_t wp_pack_rows(
    void* h, const char** topics, const char** lyrics /* [n*n_sents] */,
    int32_t n, int32_t n_sents, int32_t topic_len, int32_t max_sent,
    int32_t pad_id, int32_t start_id, int32_t eos_id, int32_t sep_id,
    int32_t* topic_ids, int32_t* topic_mask, int32_t* topic_type,
    int32_t* targets, int32_t* mask, int32_t* type_ids, int32_t n_threads) {
  if (h == nullptr) return -1;
  const auto& tk = *static_cast<Tokenizer*>(h);
  const int32_t frame = max_sent + 2;
  const size_t tlen = (size_t)n_sents * frame + 1;
  static const std::string kPrefix = "\xe4\xb8\xbb\xe9\xa2\x98\xe8\xaf\x8d"
                                     "\xef\xbc\x9a";  // "主题词："

  auto pack_range = [&](int32_t lo, int32_t hi) {
    std::vector<int32_t> ids;
    std::string buf;
    for (int32_t i = lo; i < hi; ++i) {
      // topic prompt
      buf.assign(kPrefix);
      buf.append(topics[i]);
      ids.clear();
      for (const auto& w : basic_tokenize(buf.data(), buf.size()))
        wordpiece(tk, w, &ids);
      int32_t* ti = topic_ids + (size_t)i * topic_len;
      int32_t* tm = topic_mask + (size_t)i * topic_len;
      int32_t* tt = topic_type + (size_t)i * topic_len;
      for (int32_t j = 0; j < topic_len; ++j) {
        const bool real = j < (int32_t)ids.size();
        ti[j] = real ? ids[j] : pad_id;
        tm[j] = real ? 1 : 0;
        tt[j] = real ? 1 : 0;
      }
      // lyric grid
      int32_t* row = targets + (size_t)i * tlen;
      int32_t* mrow = mask + (size_t)i * tlen;
      int32_t* yrow = type_ids + (size_t)i * tlen;
      size_t off = 0;
      for (int32_t s = 0; s < n_sents; ++s) {
        const int32_t pair = s / 2;
        const int32_t ctype = (pair == 4) ? 1 : pair + 1;
        const char* sent = lyrics[(size_t)i * n_sents + s];
        buf.clear();
        for (uint32_t c : decode_utf8(sent, strlen(sent))) {
          if (c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == 0xA0 ||
              c == 0x3000)
            continue;
          encode_utf8(c, &buf);
        }
        ids.clear();
        for (const auto& w : basic_tokenize(buf.data(), buf.size()))
          wordpiece(tk, w, &ids);
        if ((int32_t)ids.size() > max_sent) ids.resize(max_sent);
        row[off] = start_id; mrow[off] = 1; yrow[off] = 0; ++off;
        for (int32_t j = 0; j < max_sent; ++j) {
          const bool real = j < (int32_t)ids.size();
          row[off] = real ? ids[j] : pad_id;
          mrow[off] = real ? 1 : 0;
          yrow[off] = real ? ctype : 0;
          ++off;
        }
        row[off] = eos_id; mrow[off] = 1; yrow[off] = 0; ++off;
      }
      row[off] = sep_id; mrow[off] = 1; yrow[off] = 0;
    }
  };

  int32_t nt = n_threads;
  if (nt <= 0) {
    nt = (int32_t)std::thread::hardware_concurrency();
    if (nt <= 0) nt = 1;
    if (nt > 8) nt = 8;
  }
  if (nt > n) nt = n > 0 ? n : 1;
  if (nt <= 1) {
    pack_range(0, n);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    const int32_t chunk = (n + nt - 1) / nt;
    for (int32_t t = 0; t < nt; ++t) {
      const int32_t lo = t * chunk;
      const int32_t hi = lo + chunk < n ? lo + chunk : n;
      if (lo >= hi) break;
      pool.emplace_back(pack_range, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

}  // extern "C"
