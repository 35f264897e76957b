// Native byte-level BPE encoder — the English-variant host hot path.
//
// The English pipeline (reference README.md:19-20, :86 frames English
// adaptation as supported) tokenizes with GPT-2-style byte-level BPE
// (mmtg_tpu/bpe.py). Dataset packing tokenizes every sentence and topic
// prompt; for large corpora the pure-Python merge loop dominates packing
// time, exactly like the WordPiece case (wordpiece.cc). This mirrors
// mmtg_tpu/bpe.py: the byte->unicode alphabet (bytes_to_unicode), the
// GPT-2 pre-tokenization scanner (contractions / ?\p{L}+ / ?\p{N}+ /
//  ?[^\s\p{L}\p{N}]+ / \s+(?!\S) / \s+ with leftmost-alternation
// semantics), and the lowest-rank-first merge loop over vocab.json +
// merges.txt. Exposed as a minimal C API consumed via ctypes (no
// pybind11 in the image).
//
// Unicode classification is table-driven for the ranges that occur in
// the MMTG domain (ASCII/Latin/Greek/Cyrillic/CJK kana+han); parity with
// the Python tokenizer is enforced by tests/test_native_bpe.py.
// Build: `make -C native` -> libbpe.so.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---- UTF-8 <-> codepoints ---------------------------------------------------

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

// ---- Unicode classes (mirrors bpe.py's unicodedata categories over the
// domain ranges) --------------------------------------------------------------

bool is_letter(uint32_t c) {
  if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) return true;
  if (c == 0xAA || c == 0xB5 || c == 0xBA) return true;            // Lo/Ll
  if ((c >= 0xC0 && c <= 0xD6) || (c >= 0xD8 && c <= 0xF6) ||
      (c >= 0xF8 && c <= 0x2AF))
    return true;                                                   // Latin
  if (c >= 0x370 && c <= 0x3FF)                                    // Greek
    return !(c == 0x374 || c == 0x375 || c == 0x37E || c == 0x384 ||
             c == 0x385 || c == 0x387);
  if (c >= 0x400 && c <= 0x4FF) return true;                       // Cyrillic
  if (c >= 0x3041 && c <= 0x3096) return true;                     // Hiragana
  if ((c >= 0x30A1 && c <= 0x30FA) || (c >= 0x30FC && c <= 0x30FF))
    return true;                                                   // Katakana
  if (c >= 0xAC00 && c <= 0xD7A3) return true;                     // Hangul
  return (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
         (c >= 0x20000 && c <= 0x2A6DF) || (c >= 0xF900 && c <= 0xFAFF);
}

bool is_number(uint32_t c) {
  if (c >= '0' && c <= '9') return true;
  if (c == 0xB2 || c == 0xB3 || c == 0xB9) return true;   // superscripts (No)
  if (c >= 0xBC && c <= 0xBE) return true;                // vulgar fractions
  if (c >= 0x660 && c <= 0x669) return true;              // Arabic-Indic
  return c >= 0xFF10 && c <= 0xFF19;                      // fullwidth
}

bool is_space(uint32_t c) {
  // Python str.isspace(): ASCII ws incl. \x1c-\x1f, \x85, plus Zs + Zl/Zp.
  if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\v' || (c >= 0x1C && c <= 0x1F) || c == 0x85)
    return true;
  return c == 0xA0 || c == 0x1680 || (c >= 0x2000 && c <= 0x200A) ||
         c == 0x2028 || c == 0x2029 || c == 0x202F || c == 0x205F ||
         c == 0x3000;
}

// ---- byte -> unicode alphabet (bpe.py bytes_to_unicode) ---------------------

void build_byte_alphabet(std::string table[256]) {
  bool direct[256] = {false};
  for (int b = '!'; b <= '~'; ++b) direct[b] = true;
  for (int b = 0xA1; b <= 0xAC; ++b) direct[b] = true;
  for (int b = 0xAE; b <= 0xFF; ++b) direct[b] = true;
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    uint32_t cp = direct[b] ? (uint32_t)b : (uint32_t)(256 + n++);
    std::string s;
    encode_utf8(cp, &s);
    table[b] = s;
  }
}

// ---- minimal JSON parser for the flat {token: id} vocab.json ----------------

bool parse_json_string(const std::string& s, size_t* i, std::string* out) {
  out->clear();
  if ((*i) >= s.size() || s[*i] != '"') return false;
  ++*i;
  uint32_t pending_high = 0;  // surrogate-pair state
  while (*i < s.size()) {
    char c = s[*i];
    if (c == '"') {
      ++*i;
      return true;
    }
    if (c == '\\') {
      if (*i + 1 >= s.size()) return false;
      char e = s[*i + 1];
      *i += 2;
      switch (e) {
        case '"': out->push_back('"'); break;
        case '\\': out->push_back('\\'); break;
        case '/': out->push_back('/'); break;
        case 'b': out->push_back('\b'); break;
        case 'f': out->push_back('\f'); break;
        case 'n': out->push_back('\n'); break;
        case 'r': out->push_back('\r'); break;
        case 't': out->push_back('\t'); break;
        case 'u': {
          if (*i + 4 > s.size()) return false;
          uint32_t cp = (uint32_t)std::stoul(s.substr(*i, 4), nullptr, 16);
          *i += 4;
          if (cp >= 0xD800 && cp <= 0xDBFF) {
            pending_high = cp;
            continue;
          }
          if (cp >= 0xDC00 && cp <= 0xDFFF && pending_high) {
            cp = 0x10000 + ((pending_high - 0xD800) << 10) + (cp - 0xDC00);
            pending_high = 0;
          }
          encode_utf8(cp, out);
          break;
        }
        default: return false;
      }
      continue;
    }
    out->push_back(c);
    ++*i;
  }
  return false;
}

void skip_ws(const std::string& s, size_t* i) {
  while (*i < s.size() &&
         (s[*i] == ' ' || s[*i] == '\t' || s[*i] == '\n' || s[*i] == '\r'))
    ++*i;
}

bool parse_vocab_json(const std::string& path,
                      std::unordered_map<std::string, int32_t>* vocab) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::stringstream ss;
  ss << f.rdbuf();
  std::string s = ss.str();
  size_t i = 0;
  skip_ws(s, &i);
  if (i >= s.size() || s[i] != '{') return false;
  ++i;
  skip_ws(s, &i);
  if (i < s.size() && s[i] == '}') return true;  // empty dict
  while (i < s.size()) {
    std::string key;
    if (!parse_json_string(s, &i, &key)) return false;
    skip_ws(s, &i);
    if (i >= s.size() || s[i] != ':') return false;
    ++i;
    skip_ws(s, &i);
    size_t j = i;
    while (j < s.size() && (isdigit((unsigned char)s[j]) || s[j] == '-')) ++j;
    if (j == i) return false;
    (*vocab)[key] = (int32_t)std::stol(s.substr(i, j - i));
    i = j;
    skip_ws(s, &i);
    if (i < s.size() && s[i] == ',') {
      ++i;
      skip_ws(s, &i);
      continue;
    }
    if (i < s.size() && s[i] == '}') return true;
    return false;
  }
  return false;
}

// ---- tokenizer --------------------------------------------------------------

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003u ^
           std::hash<std::string>()(p.second);
  }
};

struct BPE {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  std::string byte_alphabet[256];
  int32_t unk_id = 0;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

// GPT-2 pre-tokenization over codepoints; emits [start, end) spans.
std::vector<std::pair<size_t, size_t>> pretokenize(
    const std::vector<uint32_t>& cp) {
  std::vector<std::pair<size_t, size_t>> spans;
  const size_t n = cp.size();
  // contractions, case-sensitive (bpe.py _CONTRACTIONS)
  static const char* kContr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
  size_t i = 0;
  while (i < n) {
    uint32_t ch = cp[i];
    if (ch == '\'') {
      size_t hit = 0;
      for (const char* c : kContr) {
        size_t len = strlen(c);
        if (i + len <= n) {
          bool eq = true;
          for (size_t k = 0; k < len; ++k)
            if (cp[i + k] != (uint32_t)(unsigned char)c[k]) { eq = false; break; }
          if (eq) { hit = len; break; }
        }
      }
      if (hit) {
        spans.emplace_back(i, i + hit);
        i += hit;
        continue;
      }
    }
    // optional single leading space shared by the L+/N+/punct alternatives
    size_t j = (ch == ' ' && i + 1 < n) ? i + 1 : i;
    uint32_t nxt = cp[j];
    if (is_letter(nxt)) {
      size_t k = j;
      while (k < n && is_letter(cp[k])) ++k;
      spans.emplace_back(i, k);
      i = k;
      continue;
    }
    if (is_number(nxt)) {
      size_t k = j;
      while (k < n && is_number(cp[k])) ++k;
      spans.emplace_back(i, k);
      i = k;
      continue;
    }
    if (!is_space(nxt)) {
      size_t k = j;
      while (k < n && !is_space(cp[k]) && !is_letter(cp[k]) && !is_number(cp[k]))
        ++k;
      spans.emplace_back(i, k);
      i = k;
      continue;
    }
    // whitespace run: \s+(?!\S) gives the last ws char back before a word
    size_t k = i;
    while (k < n && is_space(cp[k])) ++k;
    if (k < n && k - i > 1) {
      spans.emplace_back(i, k - 1);
      i = k - 1;
    } else {
      spans.emplace_back(i, k);
      i = k;
    }
  }
  return spans;
}

void bpe_word(BPE* t, const std::string& mapped, std::vector<int32_t>* out) {
  auto it = t->cache.find(mapped);
  if (it != t->cache.end()) {
    out->insert(out->end(), it->second.begin(), it->second.end());
    return;
  }
  // split the mapped string into its alphabet symbols (each one codepoint)
  std::vector<std::string> word;
  {
    std::vector<uint32_t> cps = decode_utf8(mapped.data(), mapped.size());
    word.reserve(cps.size());
    for (uint32_t c : cps) {
      std::string s;
      encode_utf8(c, &s);
      word.push_back(s);
    }
  }
  while (word.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best = 0;
    for (size_t k = 0; k + 1 < word.size(); ++k) {
      auto r = t->ranks.find({word[k], word[k + 1]});
      if (r != t->ranks.end() && r->second < best_rank) {
        best_rank = r->second;
        best = k;
      }
    }
    if (best_rank == INT32_MAX) break;
    const std::string first = word[best], second = word[best + 1];
    std::vector<std::string> merged;
    merged.reserve(word.size());
    size_t k = 0;
    while (k < word.size()) {
      if (k + 1 < word.size() && word[k] == first && word[k + 1] == second) {
        merged.push_back(first + second);
        k += 2;
      } else {
        merged.push_back(word[k]);
        k += 1;
      }
    }
    word.swap(merged);
  }
  std::vector<int32_t> ids;
  ids.reserve(word.size());
  for (const std::string& tok : word) {
    auto v = t->vocab.find(tok);
    ids.push_back(v == t->vocab.end() ? t->unk_id : v->second);
  }
  t->cache.emplace(mapped, ids);
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

void* bpe_create(const char* vocab_json, const char* merges_txt) {
  auto* t = new BPE();
  if (!parse_vocab_json(vocab_json, &t->vocab)) {
    delete t;
    return nullptr;
  }
  std::ifstream f(merges_txt, std::ios::binary);
  if (!f) {
    delete t;
    return nullptr;
  }
  std::string line;
  int32_t rank = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line.rfind("#version", 0) == 0) continue;
    size_t sp = line.find(' ');
    if (sp == std::string::npos || line.find(' ', sp + 1) != std::string::npos)
      continue;
    t->ranks[{line.substr(0, sp), line.substr(sp + 1)}] = rank++;
  }
  build_byte_alphabet(t->byte_alphabet);
  auto unk = t->vocab.find("[UNK]");
  t->unk_id = unk == t->vocab.end() ? 0 : unk->second;
  return t;
}

void bpe_free(void* h) { delete static_cast<BPE*>(h); }

int32_t bpe_vocab_size(void* h) {
  return h ? (int32_t)static_cast<BPE*>(h)->vocab.size() : -1;
}

// Encode UTF-8 `text` into token ids. Returns the id count (truncated to
// `cap`), or -1 on an invalid handle.
int32_t bpe_encode_ids(void* h, const char* text, int32_t* out, int32_t cap) {
  if (!h) return -1;
  auto* t = static_cast<BPE*>(h);
  size_t n = strlen(text);
  std::vector<uint32_t> cps = decode_utf8(text, n);
  std::vector<int32_t> ids;
  for (auto [a, b] : pretokenize(cps)) {
    // map the span's UTF-8 bytes through the byte alphabet
    std::string raw;
    for (size_t k = a; k < b; ++k) encode_utf8(cps[k], &raw);
    std::string mapped;
    mapped.reserve(raw.size() * 2);
    for (unsigned char c : raw) mapped += t->byte_alphabet[c];
    bpe_word(t, mapped, &ids);
  }
  int32_t m = (int32_t)ids.size();
  if (m > cap) m = cap;
  std::memcpy(out, ids.data(), sizeof(int32_t) * m);
  return m;
}

}  // extern "C"
