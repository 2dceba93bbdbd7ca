// Native paged KV-cache block manager — the control-plane hot path.
//
// Capability parity with the reference BlockManager
// (src/engine/block_manager.rs:12-361): refcounted blocks, xxh64 chained
// content hashing (a block's identity encodes its whole prefix), prefix-
// cache reuse with a content-verification collision guard, FIFO recycling
// of freed-but-still-cached blocks, and the decode append protocol. The
// reference implements this in Rust; this is the C++ equivalent exposed
// through a C ABI consumed via ctypes (nanovllm_tpu/native/__init__.py).
// A pure-Python implementation (engine/block_manager.py) remains as the
// portable fallback and behavioral oracle.

#include <cstdint>
#include <cstring>
#include <list>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// xxh64 (implemented from the public XXH64 specification)
// ---------------------------------------------------------------------------
constexpr uint64_t P1 = 0x9E3779B185EBCA87ULL;
constexpr uint64_t P2 = 0xC2B2AE3D27D4EB4FULL;
constexpr uint64_t P3 = 0x165667B19E3779F9ULL;
constexpr uint64_t P4 = 0x85EBCA77C2B2AE63ULL;
constexpr uint64_t P5 = 0x27D4EB2F165667C5ULL;

inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  return acc * P1;
}

inline uint64_t merge_round(uint64_t acc, uint64_t val) {
  acc ^= round1(0, val);
  return acc * P1 + P4;
}

inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (x86/arm)
}

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

uint64_t xxh64(const uint8_t* data, size_t len, uint64_t seed = 0) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = round1(v1, read64(p));
      v2 = round1(v2, read64(p + 8));
      v3 = round1(v3, read64(p + 16));
      v4 = round1(v4, read64(p + 24));
      p += 32;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint64_t>(len);
  while (p + 8 <= end) {
    h ^= round1(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= static_cast<uint64_t>(read32(p)) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

// Chained content hash matching engine/block_manager.compute_hash: xxh64
// over prefix_hash (8 LE bytes) ++ each token (8 LE bytes).
uint64_t chain_hash(const int64_t* tokens, int64_t n, uint64_t prefix) {
  std::vector<uint8_t> buf(8 * (static_cast<size_t>(n) + 1));
  std::memcpy(buf.data(), &prefix, 8);
  std::memcpy(buf.data() + 8, tokens, 8 * static_cast<size_t>(n));
  return xxh64(buf.data(), buf.size());
}

// ---------------------------------------------------------------------------
// Block manager
// ---------------------------------------------------------------------------
struct Block {
  int64_t ref_count = 0;
  bool has_hash = false;
  uint64_t hash = 0;
  std::vector<int64_t> tokens;
};

struct BlockManager {
  int64_t num_blocks;
  int64_t block_size;
  bool prefix_caching;
  std::vector<Block> blocks;
  std::unordered_map<uint64_t, int64_t> hash_to_block;
  // FIFO free list + iterator index for O(1) removal (reactivation).
  std::list<int64_t> free_list;
  std::unordered_map<int64_t, std::list<int64_t>::iterator> free_pos;
  int64_t used = 0;
  int64_t cache_hits = 0;
  int64_t cache_queries = 0;

  explicit BlockManager(int64_t nb, int64_t bs, bool pc)
      : num_blocks(nb), block_size(bs), prefix_caching(pc), blocks(nb) {
    for (int64_t i = 0; i < nb; ++i) {
      free_list.push_back(i);
      free_pos[i] = std::prev(free_list.end());
    }
  }

  int64_t num_free() const { return static_cast<int64_t>(free_list.size()); }

  int64_t recycle() {  // oldest freed first; wipes cached identity
    int64_t id = free_list.front();
    free_list.pop_front();
    free_pos.erase(id);
    Block& b = blocks[id];
    if (b.has_hash) {
      auto it = hash_to_block.find(b.hash);
      if (it != hash_to_block.end() && it->second == id) hash_to_block.erase(it);
    }
    b.ref_count = 1;
    b.has_hash = false;
    b.hash = 0;
    b.tokens.clear();
    ++used;
    return id;
  }

  void reactivate(int64_t id) {  // free-but-cached block hit
    auto it = free_pos.find(id);
    free_list.erase(it->second);
    free_pos.erase(it);
    blocks[id].ref_count = 1;
    ++used;
  }

  void free_block(int64_t id) {  // keeps hash: stays prefix-cache reusable
    free_list.push_back(id);
    free_pos[id] = std::prev(free_list.end());
    --used;
  }

  void deallocate(const int64_t* table, int64_t n) {
    for (int64_t i = n - 1; i >= 0; --i) {
      if (table[i] < 0) continue;  // sliding-window eviction hole
      Block& b = blocks[table[i]];
      if (--b.ref_count == 0) free_block(table[i]);
    }
  }

  // Sliding-window rolling buffer: free blocks [0, last) of the table
  // (ids >= 0 only). The caller replaces released entries with -1 holes;
  // freed blocks keep their hash identity (their KV is real) and stay
  // prefix-cache reusable until recycled. Returns the count freed.
  int64_t release_below(const int64_t* table, int64_t last) {
    int64_t freed = 0;
    for (int64_t i = 0; i < last; ++i) {
      if (table[i] < 0) continue;
      Block& b = blocks[table[i]];
      if (--b.ref_count == 0) free_block(table[i]);
      ++freed;
    }
    return freed;
  }

  // Drop a block's prefix-cache identity. Used when freeing blocks whose KV
  // was never computed: keeping the hash would let a later same-prefix
  // allocate cache-hit uninitialized KV (silently wrong output).
  void wipe_identity(int64_t id) {
    Block& b = blocks[id];
    if (b.has_hash) {
      auto it = hash_to_block.find(b.hash);
      if (it != hash_to_block.end() && it->second == id) hash_to_block.erase(it);
    }
    b.has_hash = false;
    b.hash = 0;
    b.tokens.clear();
  }

  // Deallocate a sequence whose prefill never ran (scheduler token-budget
  // undo / allocate rollback). Blocks dropping to ref 0 lose their hash
  // identity UNLESS they were prefix-cache hits (hits[i] != 0): a hit
  // block's KV is real (it was free-but-cached when reused), and wiping it
  // would evict a valid cache entry on every token-budget undo. hits may be
  // null (wipe all — legacy behavior for callers without hit tracking).
  void undo_allocate(const int64_t* table, int64_t n, const uint8_t* hits) {
    for (int64_t i = n - 1; i >= 0; --i) {
      if (table[i] < 0) continue;
      Block& b = blocks[table[i]];
      if (--b.ref_count == 0) {
        if (!hits || !hits[i]) wipe_identity(table[i]);
        free_block(table[i]);
      }
    }
  }

  // Prefix-cached allocation over the whole prompt. Returns 0 on success
  // (out_table[ceil(n/bs)] filled, *out_cached set, out_hits[i] = 1 for
  // prefix-cache hit blocks), -1 on exhaustion (fully rolled back).
  int64_t allocate(const int64_t* tokens, int64_t n_tokens, int64_t* out_table,
                   int64_t* out_cached, uint8_t* out_hits) {
    int64_t nb = (n_tokens + block_size - 1) / block_size;
    uint64_t prefix = 0;
    bool miss = false;
    int64_t cached = 0;
    int64_t filled = 0;
    for (int64_t idx = 0; idx < nb; ++idx) {
      const int64_t* tok = tokens + idx * block_size;
      int64_t len = std::min(block_size, n_tokens - idx * block_size);
      bool full = len == block_size;
      uint64_t h = 0;
      if (full) {
        prefix = chain_hash(tok, len, prefix);
        h = prefix;
      }
      int64_t hit = -1;
      if (prefix_caching && full && !miss) {
        ++cache_queries;
        auto it = hash_to_block.find(h);
        if (it != hash_to_block.end() &&
            blocks[it->second].tokens.size() == static_cast<size_t>(len) &&
            std::memcmp(blocks[it->second].tokens.data(), tok, 8 * len) == 0) {
          ++cache_hits;
          hit = it->second;
          if (free_pos.count(hit)) {
            reactivate(hit);
          } else {
            ++blocks[hit].ref_count;
          }
          cached += block_size;
        } else {
          miss = true;
        }
      } else if (full) {
        miss = true;
      }
      if (hit >= 0) {
        out_hits[filled] = 1;
        out_table[filled++] = hit;
        continue;
      }
      if (free_list.empty()) {  // roll back; wipe never-computed identities
        undo_allocate(out_table, filled, out_hits);
        return -1;
      }
      int64_t id = recycle();
      Block& b = blocks[id];
      b.tokens.assign(tok, tok + len);
      if (full && prefix_caching) {
        b.has_hash = true;
        b.hash = h;
        hash_to_block[h] = id;
      }
      out_hits[filled] = 0;
      out_table[filled++] = id;
    }
    // Never allow a fully-cached prompt: force >= 1 query token, capped to
    // a block boundary so num_cached_tokens stays block-aligned (the bulk
    // prefill KV-commit kernel writes whole blocks).
    if (cached >= n_tokens) cached = (n_tokens - 1) / block_size * block_size;
    *out_cached = cached;
    return 0;
  }

  // Reserve `need` fresh blocks (decode window). Returns count or -1.
  int64_t reserve(int64_t* out_new, int64_t need) {
    if (num_free() < need) return -1;
    for (int64_t i = 0; i < need; ++i) {
      int64_t id = recycle();
      blocks[id].tokens.clear();
      out_new[i] = id;
    }
    return need;
  }

  // Sync block contents/hashes with the sequence's confirmed tokens
  // (reference: block_manager.rs:283-304). Scans back from the last block
  // covered by both the tokens and the table.
  void register_progress(const int64_t* tokens, int64_t n_tokens,
                         const int64_t* table, int64_t table_len) {
    int64_t nb = std::min((n_tokens + block_size - 1) / block_size, table_len);
    if (nb <= 0) return;
    int64_t start = nb - 1;
    while (start > 0) {
      if (table[start - 1] < 0) break;  // eviction hole: chain boundary
      const Block& prev = blocks[table[start - 1]];
      if (prev.has_hash || prev.ref_count > 1) break;
      --start;
    }
    for (int64_t idx = start; idx < nb; ++idx) {
      if (table[idx] < 0) continue;  // sliding-window eviction hole
      Block& b = blocks[table[idx]];
      if (b.ref_count != 1 || b.has_hash) continue;
      const int64_t* tok = tokens + idx * block_size;
      int64_t len = std::min(block_size, n_tokens - idx * block_size);
      b.tokens.assign(tok, tok + len);
      // Only hash blocks whose KV is fully committed on device: the final
      // token of a decode window is the NEXT window's input, whose KV row
      // may never be written (preempt/abort/stop), so a block is hashable
      // only when covered by the first n_tokens-1 tokens.
      // A block's identity must chain from a HASHED predecessor:
      // registering with prefix 0 would alias a mid-sequence block to a
      // position-0 chain start (a later same-token prompt would cache-hit
      // KV computed at the wrong positions). A sliding-window eviction
      // hole (or an unhashed prev behind one) breaks the chain for the
      // whole tail — skip registration there.
      if (len == block_size && prefix_caching &&
          (idx + 1) * block_size < n_tokens) {
        uint64_t prefix = 0;
        if (idx > 0) {
          if (table[idx - 1] < 0) continue;
          const Block& prev = blocks[table[idx - 1]];
          if (!prev.has_hash) continue;
          prefix = prev.hash;
        }
        b.hash = chain_hash(tok, len, prefix);
        b.has_hash = true;
        hash_to_block[b.hash] = table[idx];
      }
    }
  }

  void stats(int64_t* out) const {
    int64_t cached = 0;
    for (const Block& b : blocks)
      if (b.has_hash) ++cached;
    out[0] = num_blocks;
    out[1] = num_free();
    out[2] = used;
    out[3] = cached;
    out[4] = cache_hits;
    out[5] = cache_queries;
  }
};

}  // namespace

extern "C" {

void* nvbm_create(int64_t num_blocks, int64_t block_size, int enable_prefix) {
  return new BlockManager(num_blocks, block_size, enable_prefix != 0);
}

void nvbm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int64_t nvbm_num_free(void* h) {
  return static_cast<BlockManager*>(h)->num_free();
}

int64_t nvbm_allocate(void* h, const int64_t* tokens, int64_t n_tokens,
                      int64_t* out_table, int64_t* out_cached,
                      uint8_t* out_hits) {
  return static_cast<BlockManager*>(h)->allocate(tokens, n_tokens, out_table,
                                                 out_cached, out_hits);
}

void nvbm_wipe_identity(void* h, int64_t id) {
  static_cast<BlockManager*>(h)->wipe_identity(id);
}

int64_t nvbm_release_below(void* h, const int64_t* table, int64_t last) {
  return static_cast<BlockManager*>(h)->release_below(table, last);
}

void nvbm_deallocate(void* h, const int64_t* table, int64_t n) {
  static_cast<BlockManager*>(h)->deallocate(table, n);
}

void nvbm_undo_allocate(void* h, const int64_t* table, int64_t n,
                        const uint8_t* hits) {
  static_cast<BlockManager*>(h)->undo_allocate(table, n, hits);
}

int64_t nvbm_reserve(void* h, int64_t* out_new, int64_t need) {
  return static_cast<BlockManager*>(h)->reserve(out_new, need);
}

void nvbm_register_progress(void* h, const int64_t* tokens, int64_t n_tokens,
                            const int64_t* table, int64_t table_len) {
  static_cast<BlockManager*>(h)->register_progress(tokens, n_tokens, table,
                                                   table_len);
}

void nvbm_stats(void* h, int64_t* out6) {
  static_cast<BlockManager*>(h)->stats(out6);
}

uint64_t nvbm_xxh64(const uint8_t* data, int64_t len) {
  return xxh64(data, static_cast<size_t>(len));
}

}  // extern "C"
