// lmdbx: a minimal, dependency-free implementation of the LMDB on-disk
// format (data.mdb) — reader + bulk writer — used as the native IO core of
// the mrn_tpu data pipeline (the Python `lmdb` package is not available in
// deployment images; files produced here are standard LMDB files and files
// produced by liblmdb-based tools, e.g. the reference's
// tools/create_lmdb_dataset.py, are readable here).
//
// Supported subset (all the dataset pipeline needs):
//   - read: meta pages, B+tree branch/leaf search by key, overflow (BIGDATA)
//     values, entry count; memory-mapped, zero-copy value pointers.
//   - write: bulk bottom-up B+tree construction from sorted key/value pairs
//     (the dataset builder always writes whole datasets at once).
// Not supported: DUPSORT/DUPFIXED databases, named sub-databases,
// incremental transactions, free-list reuse.
//
// Format reference: LMDB (Symas), mdb.c public layout; page size 4096.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t MDB_MAGIC = 0xBEEFC0DE;
constexpr uint32_t MDB_DATA_VERSION = 1;
constexpr size_t PAGE_SIZE = 4096;
constexpr size_t PAGEHDRSZ = 16;
constexpr uint64_t P_INVALID = ~uint64_t(0);

constexpr uint16_t P_BRANCH = 0x01;
constexpr uint16_t P_LEAF = 0x02;
constexpr uint16_t P_OVERFLOW = 0x04;
constexpr uint16_t P_META = 0x08;

constexpr uint16_t F_BIGDATA = 0x01;

// node max size for a 4096 page: (psize - PAGEHDRSZ) / MDB_MINKEYS(2), even.
constexpr size_t NODE_MAX = ((PAGE_SIZE - PAGEHDRSZ) / 2) & ~size_t(1);

#pragma pack(push, 1)
struct PageHeader {
  uint64_t pgno;
  uint16_t pad;
  uint16_t flags;
  union {
    struct {
      uint16_t lower;
      uint16_t upper;
    } pb;
    uint32_t pages;  // overflow page count
  };
};
static_assert(sizeof(PageHeader) == 16, "page header must be 16 bytes");

struct NodeHeader {
  uint16_t lo;     // leaf: data size low; branch: pgno low
  uint16_t hi;     // leaf: data size high; branch: pgno mid
  uint16_t flags;  // leaf: F_* flags; branch: pgno top word
  uint16_t ksize;
  // key bytes follow, then data bytes (leaf)
};

struct MDB_db {
  uint32_t md_pad;
  uint16_t md_flags;
  uint16_t md_depth;
  uint64_t md_branch_pages;
  uint64_t md_leaf_pages;
  uint64_t md_overflow_pages;
  uint64_t md_entries;
  uint64_t md_root;
};
static_assert(sizeof(MDB_db) == 48, "MDB_db must be 48 bytes");

struct MDB_meta {
  uint32_t mm_magic;
  uint32_t mm_version;
  uint64_t mm_address;
  uint64_t mm_mapsize;
  MDB_db mm_dbs[2];  // [0]=free db, [1]=main db
  uint64_t mm_last_pg;
  uint64_t mm_txnid;
};
#pragma pack(pop)

int key_cmp(const uint8_t* a, size_t alen, const uint8_t* b, size_t blen) {
  size_t n = std::min(alen, blen);
  int c = std::memcmp(a, b, n);
  if (c) return c;
  return alen < blen ? -1 : (alen > blen ? 1 : 0);
}

struct Env {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  uint64_t root = P_INVALID;
  uint64_t entries = 0;
  uint16_t depth = 0;

  const PageHeader* page(uint64_t pgno) const {
    return reinterpret_cast<const PageHeader*>(map + pgno * PAGE_SIZE);
  }
};

const NodeHeader* node_at(const PageHeader* p, size_t i) {
  const uint16_t* ptrs = reinterpret_cast<const uint16_t*>(
      reinterpret_cast<const uint8_t*>(p) + PAGEHDRSZ);
  return reinterpret_cast<const NodeHeader*>(
      reinterpret_cast<const uint8_t*>(p) + ptrs[i]);
}

size_t num_keys(const PageHeader* p) {
  return (p->pb.lower - PAGEHDRSZ) / 2;
}

const uint8_t* node_key(const NodeHeader* n) {
  return reinterpret_cast<const uint8_t*>(n) + sizeof(NodeHeader);
}

uint64_t branch_pgno(const NodeHeader* n) {
  return uint64_t(n->lo) | (uint64_t(n->hi) << 16) | (uint64_t(n->flags) << 32);
}

size_t leaf_datasize(const NodeHeader* n) {
  return size_t(n->lo) | (size_t(n->hi) << 16);
}

}  // namespace

extern "C" {

void* lmdbx_open(const char* path) {
  std::string p(path);
  struct stat st;
  if (stat(p.c_str(), &st) == 0 && S_ISDIR(st.st_mode)) p += "/data.mdb";
  int fd = open(p.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)(2 * PAGE_SIZE)) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  Env* env = new Env();
  env->fd = fd;
  env->map = static_cast<const uint8_t*>(map);
  env->map_len = st.st_size;

  // pick the live meta (higher txnid)
  const MDB_meta* best = nullptr;
  for (int i = 0; i < 2; i++) {
    const PageHeader* ph = env->page(i);
    if (!(ph->flags & P_META)) continue;
    const MDB_meta* m = reinterpret_cast<const MDB_meta*>(
        reinterpret_cast<const uint8_t*>(ph) + PAGEHDRSZ);
    if (m->mm_magic != MDB_MAGIC || m->mm_version != MDB_DATA_VERSION) continue;
    if (!best || m->mm_txnid >= best->mm_txnid) best = m;
  }
  if (!best) {
    munmap(map, st.st_size);
    close(fd);
    delete env;
    return nullptr;
  }
  env->root = best->mm_dbs[1].md_root;
  env->entries = best->mm_dbs[1].md_entries;
  env->depth = best->mm_dbs[1].md_depth;
  return env;
}

long lmdbx_entries(void* handle) {
  return static_cast<Env*>(handle)->entries;
}

// Returns 0 on hit; *val points into the mmap (valid until close).
int lmdbx_get(void* handle, const uint8_t* key, size_t klen,
              const uint8_t** val, size_t* vlen) {
  Env* env = static_cast<Env*>(handle);
  if (env->root == P_INVALID) return -1;
  uint64_t pgno = env->root;
  for (;;) {
    const PageHeader* p = env->page(pgno);
    size_t n = num_keys(p);
    if (p->flags & P_BRANCH) {
      // binary search: find rightmost i (>=1) with key_i <= key; descend.
      size_t lo = 1, hi = n, best = 0;
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        const NodeHeader* nd = node_at(p, mid);
        int c = key_cmp(node_key(nd), nd->ksize, key, klen);
        if (c <= 0) {
          best = mid;
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      pgno = branch_pgno(node_at(p, best));
    } else if (p->flags & P_LEAF) {
      size_t lo = 0, hi = n;
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        const NodeHeader* nd = node_at(p, mid);
        int c = key_cmp(node_key(nd), nd->ksize, key, klen);
        if (c == 0) {
          size_t dsize = leaf_datasize(nd);
          if (nd->flags & F_BIGDATA) {
            uint64_t opg;
            std::memcpy(&opg, node_key(nd) + nd->ksize, 8);
            *val = reinterpret_cast<const uint8_t*>(env->page(opg)) + PAGEHDRSZ;
          } else {
            *val = node_key(nd) + nd->ksize;
          }
          *vlen = dsize;
          return 0;
        }
        if (c < 0)
          lo = mid + 1;
        else
          hi = mid;
      }
      return 1;  // not found
    } else {
      return -2;  // corrupt
    }
  }
}

void lmdbx_close(void* handle) {
  Env* env = static_cast<Env*>(handle);
  munmap(const_cast<uint8_t*>(env->map), env->map_len);
  close(env->fd);
  delete env;
}

// ---------------------------------------------------------------- writer

struct Writer {
  std::vector<std::pair<std::string, std::string>> items;
};

void* lmdbx_writer_new() { return new Writer(); }

void lmdbx_writer_put(void* handle, const uint8_t* key, size_t klen,
                      const uint8_t* val, size_t vlen) {
  Writer* w = static_cast<Writer*>(handle);
  w->items.emplace_back(std::string((const char*)key, klen),
                        std::string((const char*)val, vlen));
}

void lmdbx_writer_free(void* handle) { delete static_cast<Writer*>(handle); }

namespace {

struct PageBuilder {
  std::vector<uint8_t> buf;
  std::vector<uint16_t> ptrs;
  size_t top;  // grows downward from PAGE_SIZE
  uint16_t flags;

  explicit PageBuilder(uint16_t f) : buf(PAGE_SIZE, 0), top(PAGE_SIZE), flags(f) {}

  size_t free_space() const {
    size_t lower = PAGEHDRSZ + 2 * ptrs.size();
    return top - lower;
  }

  bool fits(size_t node_size) const { return free_space() >= node_size + 2; }

  void add_node(const uint8_t* hdr8, const uint8_t* key, size_t klen,
                const uint8_t* data, size_t dlen) {
    size_t sz = sizeof(NodeHeader) + klen + dlen;
    sz = (sz + 1) & ~size_t(1);
    top -= sz;
    std::memcpy(&buf[top], hdr8, sizeof(NodeHeader));
    std::memcpy(&buf[top + sizeof(NodeHeader)], key, klen);
    if (dlen) std::memcpy(&buf[top + sizeof(NodeHeader) + klen], data, dlen);
    ptrs.push_back((uint16_t)top);
  }

  void finalize(uint64_t pgno) {
    PageHeader* ph = reinterpret_cast<PageHeader*>(buf.data());
    ph->pgno = pgno;
    ph->pad = 0;
    ph->flags = flags;
    ph->pb.lower = (uint16_t)(PAGEHDRSZ + 2 * ptrs.size());
    ph->pb.upper = (uint16_t)top;
    std::memcpy(buf.data() + PAGEHDRSZ, ptrs.data(), 2 * ptrs.size());
  }
};

}  // namespace

// Bulk-writes all puts as one committed tree. Returns 0 on success.
int lmdbx_writer_write(void* handle, const char* path, uint64_t mapsize) {
  Writer* w = static_cast<Writer*>(handle);
  std::sort(w->items.begin(), w->items.end(),
            [](const auto& a, const auto& b) {
              return key_cmp((const uint8_t*)a.first.data(), a.first.size(),
                             (const uint8_t*)b.first.data(),
                             b.first.size()) < 0;
            });
  w->items.erase(std::unique(w->items.begin(), w->items.end(),
                             [](const auto& a, const auto& b) {
                               return a.first == b.first;
                             }),
                 w->items.end());

  std::vector<std::vector<uint8_t>> pages;  // data pages from pgno 2
  auto alloc_pgno = [&pages]() { return uint64_t(2 + pages.size()); };

  uint64_t n_overflow = 0, n_leaf = 0, n_branch = 0;

  // (first_key, pgno) per completed page at the current level
  struct Sep {
    std::string key;
    uint64_t pgno;
  };
  std::vector<Sep> level;

  // ---- leaves
  {
    PageBuilder pb(P_LEAF);
    std::string first_key;
    auto flush = [&]() {
      if (pb.ptrs.empty()) return;
      uint64_t pgno = alloc_pgno();
      pb.finalize(pgno);
      pages.push_back(std::move(pb.buf));
      level.push_back({first_key, pgno});
      n_leaf++;
      pb = PageBuilder(P_LEAF);
    };
    for (auto& kv : w->items) {
      const std::string& k = kv.first;
      const std::string& v = kv.second;
      bool big = sizeof(NodeHeader) + k.size() + v.size() > NODE_MAX;
      size_t dlen = big ? 8 : v.size();
      size_t node_size = ((sizeof(NodeHeader) + k.size() + dlen) + 1) & ~size_t(1);
      if (!pb.fits(node_size)) flush();
      if (pb.ptrs.empty()) first_key = k;

      NodeHeader nh;
      nh.lo = (uint16_t)(v.size() & 0xFFFF);
      nh.hi = (uint16_t)(v.size() >> 16);
      nh.flags = big ? F_BIGDATA : 0;
      nh.ksize = (uint16_t)k.size();

      if (big) {
        // LMDB OVPAGES: one header on the first page, value contiguous.
        size_t opages = (PAGEHDRSZ - 1 + v.size()) / PAGE_SIZE + 1;
        uint64_t opg = alloc_pgno();
        std::vector<uint8_t> chunk(opages * PAGE_SIZE, 0);
        PageHeader* oph = reinterpret_cast<PageHeader*>(chunk.data());
        oph->pgno = opg;
        oph->flags = P_OVERFLOW;
        oph->pages = (uint32_t)opages;
        std::memcpy(chunk.data() + PAGEHDRSZ, v.data(), v.size());
        for (size_t i = 0; i < opages; i++) {
          pages.emplace_back(chunk.begin() + i * PAGE_SIZE,
                             chunk.begin() + (i + 1) * PAGE_SIZE);
        }
        n_overflow += opages;
        pb.add_node(reinterpret_cast<uint8_t*>(&nh), (const uint8_t*)k.data(),
                    k.size(), reinterpret_cast<const uint8_t*>(&opg), 8);
      } else {
        pb.add_node(reinterpret_cast<uint8_t*>(&nh), (const uint8_t*)k.data(),
                    k.size(), (const uint8_t*)v.data(), v.size());
      }
    }
    flush();
  }

  // ---- branches bottom-up
  uint16_t depth = 1;
  while (level.size() > 1) {
    std::vector<Sep> next;
    PageBuilder pb(P_BRANCH);
    std::string first_key;
    auto flush = [&]() {
      if (pb.ptrs.empty()) return;
      uint64_t pgno = alloc_pgno();
      pb.finalize(pgno);
      pages.push_back(std::move(pb.buf));
      next.push_back({first_key, pgno});
      n_branch++;
      pb = PageBuilder(P_BRANCH);
    };
    for (size_t i = 0; i < level.size(); i++) {
      // branch node 0 of each page carries an empty key (LMDB convention)
      size_t klen = pb.ptrs.empty() ? 0 : level[i].key.size();
      size_t node_size = ((sizeof(NodeHeader) + klen) + 1) & ~size_t(1);
      if (!pb.fits(node_size)) {
        flush();
        klen = 0;
      }
      if (pb.ptrs.empty()) first_key = level[i].key;
      NodeHeader nh;
      uint64_t pgno = level[i].pgno;
      nh.lo = (uint16_t)(pgno & 0xFFFF);
      nh.hi = (uint16_t)((pgno >> 16) & 0xFFFF);
      nh.flags = (uint16_t)(pgno >> 32);
      nh.ksize = (uint16_t)klen;
      pb.add_node(reinterpret_cast<uint8_t*>(&nh),
                  (const uint8_t*)level[i].key.data(), klen, nullptr, 0);
    }
    flush();
    level = std::move(next);
    depth++;
  }

  uint64_t root = level.empty() ? P_INVALID : level[0].pgno;
  uint64_t last_pg = 1 + pages.size();

  // ---- metas
  std::vector<uint8_t> meta(2 * PAGE_SIZE, 0);
  for (int i = 0; i < 2; i++) {
    PageHeader* ph = reinterpret_cast<PageHeader*>(meta.data() + i * PAGE_SIZE);
    ph->pgno = i;
    ph->flags = P_META;
    MDB_meta* m = reinterpret_cast<MDB_meta*>(meta.data() + i * PAGE_SIZE +
                                              PAGEHDRSZ);
    m->mm_magic = MDB_MAGIC;
    m->mm_version = MDB_DATA_VERSION;
    m->mm_address = 0;
    uint64_t filesize = (2 + pages.size()) * PAGE_SIZE;
    m->mm_mapsize = mapsize > filesize ? mapsize : filesize;
    // free db: empty
    m->mm_dbs[0].md_root = P_INVALID;
    m->mm_dbs[1].md_flags = 0;
    m->mm_dbs[1].md_depth = w->items.empty() ? 0 : depth;
    m->mm_dbs[1].md_branch_pages = n_branch;
    m->mm_dbs[1].md_leaf_pages = n_leaf;
    m->mm_dbs[1].md_overflow_pages = n_overflow;
    m->mm_dbs[1].md_entries = w->items.size();
    m->mm_dbs[1].md_root = root;
    m->mm_last_pg = last_pg;
    m->mm_txnid = (i == 1) ? 1 : 0;  // meta1 is live
  }

  std::string p(path);
  struct stat st;
  if (stat(p.c_str(), &st) == 0 && S_ISDIR(st.st_mode)) p += "/data.mdb";
  FILE* f = fopen(p.c_str(), "wb");
  if (!f) return -1;
  fwrite(meta.data(), 1, meta.size(), f);
  for (auto& pg : pages) fwrite(pg.data(), 1, pg.size(), f);
  fclose(f);
  return 0;
}

}  // extern "C"
