// Native byte-level BPE tokenizer (replaces the reference's Rust tiktoken
// dependency, cosyvoice/tokenizer/tokenizer.py:9,200-206).
//
// Vocab format: tiktoken-style lines "<base64 token bytes> <rank>".
// Encoding: greedy lowest-rank pair merging over UTF-8 bytes, with
// longest-match special-token segmentation done by the caller (Python side
// splits on specials; this core encodes plain byte spans).
//
// C ABI (ctypes):
//   void* bpe_load(const char* vocab_path)            -> handle (NULL on error)
//   void  bpe_free(void* h)
//   int   bpe_vocab_size(void* h)
//   int   bpe_encode(void* h, const uint8_t* bytes, int n,
//                    int32_t* out, int out_cap)        -> #tokens (or -1)
//   int   bpe_decode(void* h, const int32_t* ids, int n,
//                    uint8_t* out, int out_cap)        -> #bytes (or -1)

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> token_to_id;
  std::vector<std::string> id_to_token;
};

int b64val(char c) {
  if (c >= 'A' && c <= 'Z') return c - 'A';
  if (c >= 'a' && c <= 'z') return c - 'a' + 26;
  if (c >= '0' && c <= '9') return c - '0' + 52;
  if (c == '+') return 62;
  if (c == '/') return 63;
  return -1;
}

std::string b64decode(const std::string& in) {
  std::string out;
  int val = 0, bits = 0;
  for (char c : in) {
    if (c == '=') break;
    int d = b64val(c);
    if (d < 0) continue;
    val = (val << 6) | d;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out.push_back(static_cast<char>((val >> bits) & 0xFF));
    }
  }
  return out;
}

}  // namespace

extern "C" {

void* bpe_load(const char* vocab_path) {
  std::ifstream f(vocab_path);
  if (!f.good()) return nullptr;
  auto* v = new Vocab();
  std::string line;
  int32_t max_id = -1;
  std::vector<std::pair<std::string, int32_t>> entries;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    auto sp = line.find(' ');
    if (sp == std::string::npos) continue;
    std::string tok = b64decode(line.substr(0, sp));
    int32_t id = std::stoi(line.substr(sp + 1));
    entries.emplace_back(tok, id);
    if (id > max_id) max_id = id;
  }
  v->id_to_token.resize(max_id + 1);
  for (auto& [tok, id] : entries) {
    v->token_to_id[tok] = id;
    v->id_to_token[id] = tok;
  }
  return v;
}

void bpe_free(void* h) { delete static_cast<Vocab*>(h); }

int bpe_vocab_size(void* h) {
  return static_cast<int>(static_cast<Vocab*>(h)->id_to_token.size());
}

int bpe_encode(void* h, const uint8_t* bytes, int n, int32_t* out, int out_cap) {
  auto* v = static_cast<Vocab*>(h);
  // start from single bytes; every single byte must exist in a byte-level vocab
  std::vector<std::string> parts;
  parts.reserve(n);
  for (int i = 0; i < n; ++i) parts.emplace_back(1, static_cast<char>(bytes[i]));

  // greedy merge: repeatedly merge the adjacent pair with the LOWEST rank
  while (parts.size() > 1) {
    int best_rank = INT32_MAX, best_i = -1;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = v->token_to_id.find(parts[i] + parts[i + 1]);
      if (it != v->token_to_id.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = static_cast<int>(i);
      }
    }
    if (best_i < 0) break;
    parts[best_i] = parts[best_i] + parts[best_i + 1];
    parts.erase(parts.begin() + best_i + 1);
  }

  int count = 0;
  for (auto& p : parts) {
    auto it = v->token_to_id.find(p);
    if (it == v->token_to_id.end()) return -1;  // byte missing from vocab
    if (count >= out_cap) return -1;
    out[count++] = it->second;
  }
  return count;
}

int bpe_decode(void* h, const int32_t* ids, int n, uint8_t* out, int out_cap) {
  auto* v = static_cast<Vocab*>(h);
  int pos = 0;
  for (int i = 0; i < n; ++i) {
    if (ids[i] < 0 || ids[i] >= static_cast<int32_t>(v->id_to_token.size())) return -1;
    const std::string& tok = v->id_to_token[ids[i]];
    if (pos + static_cast<int>(tok.size()) > out_cap) return -1;
    std::memcpy(out + pos, tok.data(), tok.size());
    pos += static_cast<int>(tok.size());
  }
  return pos;
}

}  // extern "C"
