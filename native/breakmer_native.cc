// breakmer_native — native IO runtime for breakmer_tpu.
//
// The reference offloads all heavy lifting to external C/C++ binaries
// (jellyfish, blat, samtools — SURVEY.md §2a). In this framework the
// device owns the compute; the native layer owns the IO hot path that
// Python is too slow for at production scale:
//   * BGZF (multi-member gzip) inflation via zlib
//   * BAM alignment-section decode straight into columnar numpy buffers,
//     with sequences emitted as 2-bit-ready base codes (A,C,G,T -> 0..3,
//     N/other -> 4) so no Python string round-trip ever happens
//   * FASTQ parse + encode into the same packed representation
//
// Exposed as a plain C ABI consumed with ctypes (no pybind11 in the
// image). All buffers are caller-allocated numpy arrays except the
// inflate output, which is malloc'd here and released with nat_free.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BGZF
// ---------------------------------------------------------------------------

// Sequential fallback: any multi-member gzip stream (non-BGZF members
// have no BSIZE field, so block extents can't be pre-walked).
static int bgzf_inflate_serial(const uint8_t* in, uint64_t in_len,
                               uint8_t** out, uint64_t* out_len) {
  std::vector<uint8_t> buf;
  buf.reserve(in_len * 4);
  z_stream zs;
  uint64_t off = 0;
  uint8_t chunk[1 << 16];
  while (off < in_len) {
    std::memset(&zs, 0, sizeof(zs));
    // 15+16: gzip header parsing
    if (inflateInit2(&zs, 15 + 16) != Z_OK) return -1;
    zs.next_in = const_cast<uint8_t*>(in + off);
    zs.avail_in = static_cast<uInt>(in_len - off);
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
      zs.next_out = chunk;
      zs.avail_out = sizeof(chunk);
      ret = inflate(&zs, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        inflateEnd(&zs);
        return -2;
      }
      buf.insert(buf.end(), chunk, chunk + (sizeof(chunk) - zs.avail_out));
    }
    off += zs.total_in;
    inflateEnd(&zs);
  }
  *out = static_cast<uint8_t*>(std::malloc(buf.size() ? buf.size() : 1));
  if (!*out) return -3;
  std::memcpy(*out, buf.data(), buf.size());
  *out_len = buf.size();
  return 0;
}

// Worker count for the parallel paths (BGZF inflate, BAM decode).
// BREAKMER_NATIVE_THREADS overrides hardware_concurrency for benchmarking
// and for pinning determinism-sensitive comparisons (outputs are
// byte-identical at any thread count; the override only steers CPU use).
static size_t native_thread_count() {
  unsigned hw = std::thread::hardware_concurrency();
  if (const char* env = std::getenv("BREAKMER_NATIVE_THREADS")) {
    int v = std::atoi(env);
    if (v > 0) hw = static_cast<unsigned>(v);
  }
  return hw ? hw : 1;
}

// One BGZF member's extents: [in_off, in_off+in_size) inflates to
// [out_off, out_off+out_size).
struct BgzfBlock {
  uint64_t in_off, in_size, out_off, out_size;
};

// Walk BGZF member headers (BC extra subfield -> BSIZE; ISIZE trailer ->
// uncompressed size). Returns false when any member is not BGZF-framed.
static bool bgzf_walk_blocks(const uint8_t* in, uint64_t in_len,
                             std::vector<BgzfBlock>* blocks,
                             uint64_t* total_out) {
  uint64_t off = 0, out_off = 0;
  while (off < in_len) {
    if (off + 18 > in_len) return false;
    if (in[off] != 0x1f || in[off + 1] != 0x8b || in[off + 2] != 8 ||
        !(in[off + 3] & 4))  // FEXTRA required for the BC subfield
      return false;
    uint16_t xlen;
    std::memcpy(&xlen, in + off + 10, 2);
    if (off + 12 + xlen > in_len) return false;
    uint64_t bsize = 0;
    uint64_t p = off + 12, xend = off + 12 + xlen;
    while (p + 4 <= xend) {
      uint16_t slen;
      std::memcpy(&slen, in + p + 2, 2);
      if (in[p] == 'B' && in[p + 1] == 'C' && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, in + p + 4, 2);
        bsize = static_cast<uint64_t>(bs) + 1;
      }
      p += 4 + slen;
    }
    if (bsize == 0 || off + bsize > in_len || bsize < 12 + (uint64_t)xlen + 8)
      return false;
    uint32_t isize;
    std::memcpy(&isize, in + off + bsize - 4, 4);  // <= 2^16 per BGZF spec
    blocks->push_back({off, bsize, out_off, isize});
    off += bsize;
    out_off += isize;
  }
  *total_out = out_off;
  return true;
}

// Inflate a BGZF/multi-member-gzip stream. *out is malloc'd; caller frees
// with nat_free. Returns 0 on success.
//
// BGZF members are INDEPENDENT deflate streams with their sizes recorded
// in the framing (BSIZE extra field + ISIZE trailer), so the hot path
// pre-walks the extents sequentially (cheap header reads) and inflates
// blocks in parallel into their exact output offsets — single-threaded
// zlib (~0.8 GB/s) was the dominant cost of whole-BAM ingest at deep
// coverage (bam_decode 2.6 s of a 4.4 s two-region run at 118x).
// Non-BGZF gzip falls back to the serial path.
int nat_bgzf_inflate(const uint8_t* in, uint64_t in_len,
                     uint8_t** out, uint64_t* out_len) {
  std::vector<BgzfBlock> blocks;
  uint64_t total = 0;
  if (!bgzf_walk_blocks(in, in_len, &blocks, &total))
    return bgzf_inflate_serial(in, in_len, out, out_len);
  uint8_t* dst = static_cast<uint8_t*>(std::malloc(total ? total : 1));
  if (!dst) return -3;
  size_t nthreads = native_thread_count();
  if (nthreads > blocks.size()) nthreads = blocks.size() ? blocks.size() : 1;
  std::atomic<size_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 15 + 16) != Z_OK) {
      err.store(-1);
      return;
    }
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= blocks.size() || err.load()) break;
      const BgzfBlock& b = blocks[i];
      inflateReset2(&zs, 15 + 16);
      zs.next_in = const_cast<uint8_t*>(in + b.in_off);
      zs.avail_in = static_cast<uInt>(b.in_size);
      uint8_t sink;  // empty member (BGZF EOF sentinel): zlib needs >=1
      bool empty = b.out_size == 0;  // output byte to reach stream end
      zs.next_out = empty ? &sink : dst + b.out_off;
      zs.avail_out = empty ? 1 : static_cast<uInt>(b.out_size);
      int ret = inflate(&zs, Z_FINISH);
      bool exact = empty ? (zs.total_out == 0) : (zs.avail_out == 0);
      if (ret != Z_STREAM_END || !exact) {
        err.store(-2);
        break;
      }
    }
    inflateEnd(&zs);
  };
  if (nthreads <= 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    ts.reserve(nthreads);
    for (size_t t = 0; t < nthreads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  if (err.load()) {
    std::free(dst);
    return err.load();
  }
  *out = dst;
  *out_len = total;
  return 0;
}

void nat_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// BAM decode
// ---------------------------------------------------------------------------

static const int8_t kNibbleCode[16] = {
    // BAM 4-bit: 0='=',1=A,2=C,4=G,8=T,15=N; everything ambiguous -> 4
    4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4};

static const char kCigarOp[9] = {'M', 'I', 'D', 'N', 'S', 'H', 'P', '=', 'X'};

// Pass 1: count records and maxima so Python can allocate columns.
// data/len: INFLATED BAM bytes; align_off: offset of first alignment.
int nat_bam_count(const uint8_t* data, uint64_t len, uint64_t align_off,
                  uint64_t* n, uint64_t* max_name, uint64_t* max_seq,
                  uint64_t* max_cigar) {
  uint64_t off = align_off, cnt = 0, mn = 1, ms = 1, mc = 1;
  while (off + 4 <= len) {
    uint32_t block;
    std::memcpy(&block, data + off, 4);
    if (off + 4 + block > len) break;
    const uint8_t* r = data + off + 4;
    uint8_t l_read_name = r[8];
    uint16_t n_cigar;
    std::memcpy(&n_cigar, r + 12, 2);
    int32_t l_seq;
    std::memcpy(&l_seq, r + 16, 4);
    if (l_read_name > mn) mn = l_read_name;
    if ((uint64_t)l_seq > ms) ms = l_seq;
    if (n_cigar > mc) mc = n_cigar;
    cnt++;
    off += 4 + block;
  }
  *n = cnt;
  *max_name = mn;
  *max_seq = ms;
  *max_cigar = mc;
  return 0;
}

// Pass 2: decode every record into caller-allocated columns.
//   seq_codes [n, max_seq] int8 (pad 4), quals [n, max_seq] int8 (pad -1)
//   names     [n, max_name] char (NUL padded)
//   cigar_ops [n, max_cigar] uint32 raw BAM encoding (len<<4|op)
// Soft-clip lengths and reference span are precomputed so Python's
// extractor does no per-record CIGAR walk.
int nat_bam_decode(const uint8_t* data, uint64_t len, uint64_t align_off,
                   int32_t* refid, int32_t* pos, int32_t* mapq, int32_t* flag,
                   int32_t* next_refid, int32_t* next_pos, int32_t* tlen,
                   int32_t* lseq, int32_t* n_cigar_out,
                   int32_t* clip_left, int32_t* clip_right, int32_t* ref_span,
                   int8_t* seq_codes, int8_t* quals, char* names,
                   uint32_t* cigar_ops,
                   uint64_t n, uint64_t max_name, uint64_t max_seq,
                   uint64_t max_cigar) {
  // Records are independent once their byte extents are known, so the hot
  // path pre-walks the offsets (one 4-byte block-size read per record — a
  // tiny fraction of full decode cost) and decodes disjoint contiguous
  // record ranges in parallel. Columns are written at record-indexed
  // offsets only, so ranges never overlap and output is byte-identical to
  // the serial order at any thread count.
  std::vector<uint64_t> offs;
  offs.reserve(n);
  uint64_t off = align_off;
  while (off + 4 <= len && offs.size() < n) {
    uint32_t block;
    std::memcpy(&block, data + off, 4);
    if (off + 4 + block > len) break;
    offs.push_back(off);
    off += 4 + block;
  }
  auto decode_one = [&](uint64_t i) {
    const uint8_t* r = data + offs[i] + 4;
    int32_t rid, p, nrid, np, tl, ls;
    std::memcpy(&rid, r, 4);
    std::memcpy(&p, r + 4, 4);
    uint8_t l_read_name = r[8];
    uint8_t mq = r[9];
    uint16_t nc;
    std::memcpy(&nc, r + 12, 2);
    uint16_t fl;
    std::memcpy(&fl, r + 14, 2);
    std::memcpy(&ls, r + 16, 4);
    std::memcpy(&nrid, r + 20, 4);
    std::memcpy(&np, r + 24, 4);
    std::memcpy(&tl, r + 28, 4);
    refid[i] = rid;
    pos[i] = p;
    mapq[i] = mq;
    flag[i] = fl;
    next_refid[i] = nrid;
    next_pos[i] = np;
    tlen[i] = tl;
    lseq[i] = ls;
    n_cigar_out[i] = nc;

    const uint8_t* q = r + 32;
    uint64_t name_n = l_read_name < max_name ? l_read_name : max_name;
    std::memcpy(names + i * max_name, q, name_n);  // includes NUL
    q += l_read_name;

    int32_t cl = 0, cr = 0, span = 0;
    for (uint16_t c = 0; c < nc; c++) {
      uint32_t v;
      std::memcpy(&v, q + 4 * c, 4);
      cigar_ops[i * max_cigar + c] = v;
      uint32_t opl = v >> 4;
      char op = kCigarOp[v & 0xF];
      if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
        span += opl;
      if (op == 'S') {
        if (c == 0)
          cl = opl;
        else if (c == nc - 1)
          cr = opl;
      }
    }
    clip_left[i] = cl;
    clip_right[i] = cr;
    ref_span[i] = span;
    q += 4ull * nc;

    int8_t* sc = seq_codes + i * max_seq;
    for (int32_t b = 0; b < ls; b++) {
      uint8_t byte = q[b >> 1];
      uint8_t nib = (b & 1) ? (byte & 0xF) : (byte >> 4);
      sc[b] = kNibbleCode[nib];
    }
    for (uint64_t b = ls; b < max_seq; b++) sc[b] = 4;
    q += (ls + 1) / 2;

    int8_t* qu = quals + i * max_seq;
    if (ls > 0 && q[0] == 0xFF) {
      for (int32_t b = 0; b < ls; b++) qu[b] = 40;  // missing -> sentinel
    } else {
      for (int32_t b = 0; b < ls; b++) qu[b] = (int8_t)q[b];
    }
    for (uint64_t b = ls; b < max_seq; b++) qu[b] = -1;
  };

  size_t nthreads = native_thread_count();
  if (nthreads > offs.size()) nthreads = offs.size() ? offs.size() : 1;
  if (nthreads <= 1 || offs.size() < 4096) {  // thread spawn ~ decode of ~1e3 records
    for (uint64_t i = 0; i < offs.size(); i++) decode_one(i);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(nthreads);
    uint64_t total = offs.size();
    for (size_t t = 0; t < nthreads; t++) {
      uint64_t lo = total * t / nthreads, hi = total * (t + 1) / nthreads;
      ts.emplace_back([&, lo, hi]() {
        for (uint64_t i = lo; i < hi; i++) decode_one(i);
      });
    }
    for (auto& th : ts) th.join();
  }
  return (int)(offs.size() == n ? 0 : -1);
}

// ---------------------------------------------------------------------------
// SAM text decode — same columnar output as nat_bam_decode, so text SAM
// input reaches the vectorized extractor (extract.extract_sv_reads_columnar)
// instead of the per-line Python parser (io/sam.py parse_sam_line, whose
// field conventions this mirrors exactly: pos/pnext 1-based -> 0-based,
// rnext '=' resolved to rname, qual '*' -> the 40 sentinel the BAM path
// uses for missing quals, seq '*' -> lseq 0).
// ---------------------------------------------------------------------------

static int8_t ascii_code(uint8_t c);  // defined in the FASTQ section below

static inline int sam_cigar_op_idx(char op) {
  switch (op) {
    case 'M': return 0; case 'I': return 1; case 'D': return 2;
    case 'N': return 3; case 'S': return 4; case 'H': return 5;
    case 'P': return 6; case '=': return 7; case 'X': return 8;
    default: return -1;
  }
}

namespace {

struct SamFields {
  const char* f[11];
  uint64_t fl[11];
};

// Split the first 11 tab-separated fields of [p, line_end). Returns false
// on malformed lines (fewer than 11 fields).
static bool sam_split(const char* p, const char* line_end, SamFields* out) {
  for (int k = 0; k < 11; k++) {
    if (p >= line_end && k < 11) return false;
    const char* e = p;
    while (e < line_end && *e != '\t') e++;
    out->f[k] = p;
    out->fl[k] = (uint64_t)(e - p);
    if (k < 10) {
      if (e >= line_end) return false;  // need a tab after fields 0..9
      p = e + 1;
    }
  }
  return true;
}

static inline int64_t sam_atoi(const char* p, uint64_t n) {
  int64_t v = 0, sign = 1;
  uint64_t i = 0;
  if (n && (p[0] == '-' || p[0] == '+')) { sign = p[0] == '-' ? -1 : 1; i = 1; }
  for (; i < n; i++) {
    if (p[i] < '0' || p[i] > '9') break;
    v = v * 10 + (p[i] - '0');
  }
  return sign * v;
}

// Deterministic first-appearance ref-name table over rname then rnext
// per record ('*' skipped, '=' resolves to rname) — built identically in
// the count and decode passes so refids always agree.
struct RefTable {
  std::unordered_map<std::string, int32_t> ids;
  std::vector<std::string> names;
  int32_t intern(const char* p, uint64_t n) {
    if (n == 1 && p[0] == '*') return -1;
    std::string s(p, n);
    auto it = ids.find(s);
    if (it != ids.end()) return it->second;
    int32_t id = (int32_t)names.size();
    ids.emplace(std::move(s), id);
    names.push_back(std::string(p, n));
    return id;
  }
};

}  // namespace

// Pass 1: count records and maxima; collect the ref-name table into
// ref_blob as NUL-joined names (caller-allocated, ref_cap bytes).
// Returns 0 ok, -1 malformed line, -2 ref blob too small.
int nat_sam_count(const uint8_t* data, uint64_t len,
                  uint64_t* n, uint64_t* max_name, uint64_t* max_seq,
                  uint64_t* max_cigar,
                  char* ref_blob, uint64_t ref_cap, uint64_t* ref_len,
                  uint64_t* n_refs) {
  const char* p = (const char*)data;
  const char* end = p + len;
  uint64_t cnt = 0, mn = 1, ms = 1, mc = 1;
  RefTable refs;
  SamFields fx;
  while (p < end) {
    // universal newlines like the Python text-mode fallback: '\n',
    // '\r\n' and lone '\r' all terminate a line (a bare '\r' left in
    // the QUAL field would corrupt it into a phantom -20 score)
    const char* le = p;
    while (le < end && *le != '\n' && *le != '\r') le++;
    if (p < le && *p != '@') {
      if (!sam_split(p, le, &fx)) return -1;
      cnt++;
      if (fx.fl[0] + 1 > mn) mn = fx.fl[0] + 1;
      uint64_t sl = (fx.fl[9] == 1 && fx.f[9][0] == '*') ? 0 : fx.fl[9];
      if (sl > ms) ms = sl;
      uint64_t nc = 0;
      if (!(fx.fl[5] == 1 && fx.f[5][0] == '*')) {
        for (uint64_t i = 0; i < fx.fl[5]; i++)
          if (fx.f[5][i] < '0' || fx.f[5][i] > '9') {
            if (sam_cigar_op_idx(fx.f[5][i]) < 0) return -1;
            nc++;
          }
      }
      if (nc > mc) mc = nc;
      int32_t rid = refs.intern(fx.f[2], fx.fl[2]);
      if (fx.fl[6] == 1 && fx.f[6][0] == '=') {
        (void)rid;
      } else {
        refs.intern(fx.f[6], fx.fl[6]);
      }
    }
    p = le + 1;
  }
  uint64_t blob = 0;
  for (const auto& s : refs.names) blob += s.size() + 1;
  if (blob > ref_cap) {
    *ref_len = blob;  // tell the caller the size needed so it can retry
    return -2;
  }
  char* b = ref_blob;
  for (const auto& s : refs.names) {
    std::memcpy(b, s.data(), s.size());
    b[s.size()] = 0;
    b += s.size() + 1;
  }
  *ref_len = blob;
  *n_refs = refs.names.size();
  *n = cnt;
  *max_name = mn;
  *max_seq = ms;
  *max_cigar = mc;
  return 0;
}

// Pass 2: decode into the same caller-allocated columns as nat_bam_decode.
int nat_sam_decode(const uint8_t* data, uint64_t len,
                   int32_t* refid, int32_t* pos, int32_t* mapq, int32_t* flag,
                   int32_t* next_refid, int32_t* next_pos, int32_t* tlen,
                   int32_t* lseq, int32_t* n_cigar_out,
                   int32_t* clip_left, int32_t* clip_right, int32_t* ref_span,
                   int8_t* seq_codes, int8_t* quals, char* names,
                   uint32_t* cigar_ops,
                   uint64_t n, uint64_t max_name, uint64_t max_seq,
                   uint64_t max_cigar) {
  const char* p = (const char*)data;
  const char* end = p + len;
  uint64_t i = 0;
  RefTable refs;
  SamFields fx;
  while (p < end && i <= n) {
    const char* le = p;
    while (le < end && *le != '\n' && *le != '\r') le++;  // universal newlines
    if (p < le && *p != '@') {
      if (i >= n || !sam_split(p, le, &fx)) return -1;
      int32_t rid = refs.intern(fx.f[2], fx.fl[2]);
      int32_t nrid;
      if (fx.fl[6] == 1 && fx.f[6][0] == '=')
        nrid = rid;
      else
        nrid = refs.intern(fx.f[6], fx.fl[6]);
      refid[i] = rid;
      pos[i] = (int32_t)(sam_atoi(fx.f[3], fx.fl[3]) - 1);
      mapq[i] = (int32_t)sam_atoi(fx.f[4], fx.fl[4]);
      flag[i] = (int32_t)sam_atoi(fx.f[1], fx.fl[1]);
      next_refid[i] = nrid;
      next_pos[i] = (int32_t)(sam_atoi(fx.f[7], fx.fl[7]) - 1);
      tlen[i] = (int32_t)sam_atoi(fx.f[8], fx.fl[8]);

      uint64_t name_n = fx.fl[0] < max_name - 1 ? fx.fl[0] : max_name - 1;
      std::memcpy(names + i * max_name, fx.f[0], name_n);
      for (uint64_t b = name_n; b < max_name; b++) names[i * max_name + b] = 0;

      // CIGAR
      int32_t cl = 0, cr = 0, span = 0;
      uint64_t nc = 0;
      if (!(fx.fl[5] == 1 && fx.f[5][0] == '*')) {
        uint64_t v = 0;
        for (uint64_t c = 0; c < fx.fl[5]; c++) {
          char ch = fx.f[5][c];
          if (ch >= '0' && ch <= '9') {
            v = v * 10 + (uint64_t)(ch - '0');
          } else {
            int op = sam_cigar_op_idx(ch);
            if (op < 0 || nc >= max_cigar) return -1;
            cigar_ops[i * max_cigar + nc] = (uint32_t)((v << 4) | (uint32_t)op);
            if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
              span += (int32_t)v;
            if (op == 4) {
              if (nc == 0) cl = (int32_t)v;
              else cr = (int32_t)v;  // overwritten below unless last
            }
            nc++;
            v = 0;
          }
        }
        // mirror nat_bam_decode: only a LAST-op S counts as clip_right
        if (nc > 0) {
          uint32_t last = cigar_ops[i * max_cigar + nc - 1];
          if ((last & 0xF) != 4) cr = 0;
          if (nc == 1 && (last & 0xF) == 4) cr = 0;  // single-S: left only
        }
      }
      n_cigar_out[i] = (int32_t)nc;
      clip_left[i] = cl;
      clip_right[i] = cr;
      ref_span[i] = span;

      // SEQ / QUAL
      uint64_t L = (fx.fl[9] == 1 && fx.f[9][0] == '*') ? 0 : fx.fl[9];
      if (L > max_seq) return -1;
      lseq[i] = (int32_t)L;
      int8_t* sc = seq_codes + i * max_seq;
      for (uint64_t b = 0; b < L; b++) sc[b] = ascii_code((uint8_t)fx.f[9][b]);
      for (uint64_t b = L; b < max_seq; b++) sc[b] = 4;
      int8_t* qu = quals + i * max_seq;
      bool no_qual = (fx.fl[10] >= 1 && fx.f[10][0] == '*' && fx.fl[10] == 1);
      for (uint64_t b = 0; b < L; b++)
        qu[b] = no_qual ? (int8_t)40
                        : (b < fx.fl[10] ? (int8_t)(fx.f[10][b] - 33) : (int8_t)40);
      for (uint64_t b = L; b < max_seq; b++) qu[b] = -1;
      i++;
    }
    p = le + 1;
  }
  return (int)(i == n ? 0 : -1);
}

// ---------------------------------------------------------------------------
// FASTQ parse + encode
// ---------------------------------------------------------------------------

static const int8_t kAsciiCode[256] = {
    /* initialized at first use */};

static int8_t ascii_code(uint8_t c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
  }
}

// Pass 1: count reads + max read length / name length.
int nat_fastq_count(const uint8_t* data, uint64_t len, uint64_t* n,
                    uint64_t* max_len, uint64_t* max_name) {
  uint64_t i = 0, cnt = 0, ml = 1, mn = 1;
  while (i < len) {
    // @name line
    uint64_t ns = i + 1, ne = ns;
    while (ne < len && data[ne] != '\n' && data[ne] != ' ' && data[ne] != '\t')
      ne++;
    uint64_t le = ne;
    while (le < len && data[le] != '\n') le++;
    // seq line
    uint64_t ss = le + 1, se = ss;
    while (se < len && data[se] != '\n') se++;
    // '+' line
    uint64_t ps = se + 1;
    while (ps < len && data[ps] != '\n') ps++;
    // qual line
    uint64_t qs = ps + 1, qe = qs;
    while (qe < len && data[qe] != '\n') qe++;
    if (ss >= len) break;
    cnt++;
    if (se - ss > ml) ml = se - ss;
    if (ne - ns + 1 > mn) mn = ne - ns + 1;
    i = qe + 1;
  }
  *n = cnt;
  *max_len = ml;
  *max_name = mn;
  return 0;
}

int nat_fastq_decode(const uint8_t* data, uint64_t len, int8_t* codes,
                     int8_t* quals, int32_t* lengths, char* names,
                     uint64_t n, uint64_t max_len, uint64_t max_name) {
  uint64_t i = 0, r = 0;
  while (i < len && r < n) {
    uint64_t ns = i + 1, ne = ns;
    while (ne < len && data[ne] != '\n' && data[ne] != ' ' && data[ne] != '\t')
      ne++;
    uint64_t le = ne;
    while (le < len && data[le] != '\n') le++;
    uint64_t ss = le + 1, se = ss;
    while (se < len && data[se] != '\n') se++;
    uint64_t ps = se + 1;
    while (ps < len && data[ps] != '\n') ps++;
    uint64_t qs = ps + 1, qe = qs;
    while (qe < len && data[qe] != '\n') qe++;
    if (ss >= len) break;

    uint64_t name_n = ne - ns;
    if (name_n >= max_name) name_n = max_name - 1;
    std::memcpy(names + r * max_name, data + ns, name_n);
    names[r * max_name + name_n] = 0;

    uint64_t L = se - ss;
    if (L > max_len) L = max_len;
    lengths[r] = (int32_t)L;
    int8_t* c = codes + r * max_len;
    int8_t* ql = quals + r * max_len;
    for (uint64_t b = 0; b < L; b++) {
      c[b] = ascii_code(data[ss + b]);
      ql[b] = (qs + b < qe) ? (int8_t)(data[qs + b] - 33) : 40;
    }
    for (uint64_t b = L; b < max_len; b++) {
      c[b] = 4;
      ql[b] = -1;
    }
    i = qe + 1;
    r++;
  }
  return (int)(r == n ? 0 : -1);
}

// ---------------------------------------------------------------------------
// 2-bit packing (faToTwoBit replacement backend)
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Winner-only affine SW fill + traceback (host side of the realignment
// engine; semantics IDENTICAL to align/traceback.py traceback_align,
// which stays as the tested oracle/fallback). Reference equivalent: the
// PSL rows blat emits per contig (sv_caller.py blat_res).
// ---------------------------------------------------------------------------

static const int32_t kNeg = -(1 << 28);

// out_ints: [score, q_start, q_end, t_start, t_end, matches, mismatches,
// n_ops]; ops_rev: caller buffer of at least n+m+2 chars, filled with the
// traceback ops ('M','I','D') from the alignment END backwards.
// Returns 0 ok (incl. empty alignment), 1 alloc failure.
int nat_sw_traceback(const int8_t* q, int64_t n, const int8_t* t, int64_t m,
                     int32_t match, int32_t mismatch, int32_t gap_open,
                     int32_t gap_extend, int32_t* out_ints, char* ops_rev) {
  for (int k = 0; k < 8; k++) out_ints[k] = 0;
  if (n <= 0 || m <= 0) return 0;
  const int64_t W = m + 1;
  int32_t* H = (int32_t*)std::malloc(sizeof(int32_t) * (n + 1) * W);
  int32_t* E = (int32_t*)std::malloc(sizeof(int32_t) * (n + 1) * W);
  int32_t* F = (int32_t*)std::malloc(sizeof(int32_t) * (n + 1) * W);
  if (!H || !E || !F) {
    std::free(H); std::free(E); std::free(F);
    return 1;
  }
  const int32_t go = gap_open + gap_extend;
  const int32_t ge = gap_extend;
  for (int64_t j = 0; j <= m; j++) { H[j] = 0; E[j] = kNeg; F[j] = kNeg; }
  int32_t best = 0; int64_t bd = INT64_MAX, bi = -1, bj = -1;
  for (int64_t i = 1; i <= n; i++) {
    int32_t* Hi = H + i * W; int32_t* Hp = H + (i - 1) * W;
    int32_t* Ei = E + i * W; int32_t* Fi = F + i * W;
    int32_t* Fp = F + (i - 1) * W;
    Hi[0] = 0; Ei[0] = kNeg; Fi[0] = kNeg;
    const int8_t qc = q[i - 1];
    int32_t row_best = 0; int64_t row_j = -1;
    for (int64_t j = 1; j <= m; j++) {
      int32_t f = Hp[j] - go;
      int32_t f2 = Fp[j] - ge;
      if (f2 > f) f = f2;
      Fi[j] = f;
      // E: recurrence form; E[i][1] pinned to NEG exactly like the
      // numpy fill (it assigns E[:, 2:] only)
      int32_t e = kNeg;
      if (j >= 2) {
        e = Hi[j - 1] - go;
        int32_t e2 = Ei[j - 1] - ge;
        if (e2 > e) e = e2;
      }
      Ei[j] = e;
      const int8_t tc = t[j - 1];
      int32_t sub = (qc >= 4 || tc >= 4) ? kNeg
                    : (qc == tc ? match : -mismatch);
      int32_t h = Hp[j - 1] + sub;
      if (h < 0) h = 0;
      if (f > h) h = f;
      if (e > h) h = e;
      Hi[j] = h;
      if (h > row_best) { row_best = h; row_j = j - 1; }  // first max
    }
    if (row_j >= 0) {
      int64_t d = (i - 1) + row_j;
      if (row_best > best || (row_best == best && d < bd)) {
        best = row_best; bd = d; bi = i - 1; bj = row_j;
      }
    }
  }
  if (best <= 0) {
    std::free(H); std::free(E); std::free(F);
    out_ints[1] = out_ints[2] = out_ints[3] = out_ints[4] = 0;
    return 0;
  }
  // traceback (mirrors traceback_align's state machine exactly)
  int64_t i = bi + 1, j = bj + 1;
  int64_t nops = 0;
  int32_t matches = 0, mismatches = 0;
  char state = 'H';
  while (i > 0 && j > 0) {
    if (state == 'H') {
      int32_t h = H[i * W + j];
      if (h == 0) break;
      const int8_t qc = q[i - 1], tc = t[j - 1];
      int32_t sub = (qc >= 4 || tc >= 4) ? kNeg
                    : (qc == tc ? match : -mismatch);
      if (h == H[(i - 1) * W + (j - 1)] + sub) {
        ops_rev[nops++] = 'M';
        if (qc == tc) matches++; else mismatches++;
        i--; j--;
      } else if (h == E[i * W + j]) {
        state = 'E';
      } else if (h == F[i * W + j]) {
        state = 'F';
      } else {
        std::free(H); std::free(E); std::free(F);
        return 2;  // inconsistent cell: caller falls back to python
      }
    } else if (state == 'E') {
      ops_rev[nops++] = 'D';
      if (E[i * W + j] == H[i * W + (j - 1)] - go) state = 'H';
      j--;
    } else {
      ops_rev[nops++] = 'I';
      if (F[i * W + j] == H[(i - 1) * W + j] - go) state = 'H';
      i--;
    }
  }
  out_ints[0] = best;
  out_ints[1] = (int32_t)i;        // q_start
  out_ints[2] = (int32_t)(bi + 1); // q_end
  out_ints[3] = (int32_t)j;        // t_start
  out_ints[4] = (int32_t)(bj + 1); // t_end
  out_ints[5] = matches;
  out_ints[6] = mismatches;
  out_ints[7] = (int32_t)nops;
  std::free(H); std::free(E); std::free(F);
  return 0;
}

int nat_pack_2bit(const int8_t* codes, uint64_t n, uint32_t* out) {
  uint64_t words = (n + 15) / 16;
  for (uint64_t w = 0; w < words; w++) {
    uint32_t acc = 0;
    uint64_t base = w * 16;
    uint64_t lim = base + 16 < n ? base + 16 : n;
    for (uint64_t b = base; b < lim; b++) {
      int8_t c = codes[b];
      acc |= ((uint32_t)(c >= 4 ? 0 : c)) << (2 * (b - base));
    }
    out[w] = acc;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Greedy k-mer-extension assembly — byte-identical native twin of
// breakmer_tpu/assemble/greedy.py (the Python implementation remains the
// semantics oracle; tests assert structural equality on randomized
// fixtures). Every tie-break rule pinned there is replicated here:
//   * k-mer processing order = caller's kmer_values order (count desc,
//     code asc);
//   * posting order = read index asc, then position asc;
//   * consensus argmax ties -> smaller base code;
//   * newly reachable sample-only k-mers enqueued in consensus scan order;
//   * popped k-mers marked globally used even when the contig is later
//     discarded; reads of discarded contigs stay available.
// Assembly was the largest host stage of the warm panel profile (~38%,
// numpy-call-overhead-bound at ~80us/read); this runs the same integer
// work in-cache.
// ---------------------------------------------------------------------------

namespace {

struct AsmPost {
  uint32_t code;
  int32_t read;
  int32_t pos;
};

// Mutable contig under construction: dense position-vote matrix over
// contig coordinates [lo, lo+rows), per-row argmax maintained
// incrementally (counts never decrease, so untouched rows cannot change).
struct AsmGrow {
  std::vector<int32_t> counts;  // rows*4
  std::vector<int8_t> out;      // per-row argmax, 4 = uncovered
  int64_t lo = 0;
  bool init = false;
  int64_t cov_lo = 0, cov_hi = -1;  // covered extent, contig coords

  void add_read(const int8_t* codes, int64_t n, int64_t offset) {
    if (n == 0) return;
    int64_t first = -1, last = -1;
    for (int64_t i = 0; i < n; ++i) {
      int8_t c = codes[i];
      if (c >= 0 && c < 4) {
        if (first < 0) first = i;
        last = i;
      }
    }
    if (first < 0) return;  // zero non-N bases: nothing to vote on
    if (!init) {
      init = true;
      lo = offset;
      counts.assign((size_t)n * 4, 0);
      out.assign((size_t)n, 4);
    } else {
      int64_t rows = (int64_t)out.size();
      int64_t grow_left = lo - offset;
      if (grow_left > 0) {
        counts.insert(counts.begin(), (size_t)grow_left * 4, 0);
        out.insert(out.begin(), (size_t)grow_left, 4);
        lo = offset;
        rows += grow_left;
      }
      int64_t grow_right = (offset + n) - (lo + rows);
      if (grow_right > 0) {
        counts.insert(counts.end(), (size_t)grow_right * 4, 0);
        out.insert(out.end(), (size_t)grow_right, 4);
      }
    }
    for (int64_t i = 0; i < n; ++i) {
      int8_t c = codes[i];
      if (c >= 0 && c < 4) counts[(size_t)(offset - lo + i) * 4 + c]++;
    }
    // re-derive only the touched rows; argmax tie -> smaller base code
    int64_t a = offset - lo + first, b = offset - lo + last + 1;
    for (int64_t r = a; r < b; ++r) {
      const int32_t* row = &counts[(size_t)r * 4];
      int32_t best = row[0];
      int bi = 0;
      bool any = row[0] > 0;
      for (int j = 1; j < 4; ++j) {
        any = any || row[j] > 0;
        if (row[j] > best) {
          best = row[j];
          bi = j;
        }
      }
      out[(size_t)r] = any ? (int8_t)bi : (int8_t)4;
    }
    int64_t cl = lo + a, ch = lo + b - 1;
    if (cov_hi < cov_lo) {
      cov_lo = cl;
      cov_hi = ch;
    } else {
      if (cl < cov_lo) cov_lo = cl;
      if (ch > cov_hi) cov_hi = ch;
    }
  }

  // trimmed consensus view (interior uncovered rows stay code 4 = N)
  const int8_t* cons() const { return out.data() + (cov_lo - lo); }
  int64_t cons_len() const {
    return (init && cov_hi >= cov_lo) ? cov_hi - cov_lo + 1 : 0;
  }
  int64_t cons_start() const { return cov_lo; }
};

}  // namespace

// Returns 0 and a malloc'd blob (release with nat_free) laid out as:
//   u64 header[4] = {n_contigs, total_reads, total_kmers, total_cons}
//   i64 meta[n_contigs*3]          (n_reads, n_kmers, cons_len)
//   i64 reads[total_reads*2]       (read_index, offset rebased to 0)
//   i64 kmers[total_kmers]         (scan order, duplicates kept)
//   i8  cons[total_cons]           (concatenated consensus base codes)
// rc -1: unsupported args (k outside 1..16, L < k) -> caller falls back
// to the Python oracle path; rc -2: allocation failure.
int nat_assemble(const int8_t* codes, int64_t R, int64_t L,
                 const int32_t* lengths, const int64_t* kmer_values,
                 int64_t nk, int32_t k, int32_t min_reads, int32_t min_len,
                 double mm_frac, uint8_t** out_blob, uint64_t* out_len) {
  if (k < 1 || k > 16 || L < k || R <= 0 || nk <= 0) return -1;
  const int64_t W = L - k + 1;
  const uint32_t mask = (k == 16) ? 0xffffffffu : ((1u << (2 * k)) - 1u);

  // per-read k-mer postings in (read asc, pos asc) generation order;
  // rolling window with an N counter (bad windows are skipped, matching
  // kmer_codes_np's validity mask)
  std::vector<AsmPost> posts;
  posts.reserve((size_t)R * 8);
  for (int64_t r = 0; r < R; ++r) {
    const int8_t* row = codes + r * L;
    const int64_t wmax = (int64_t)lengths[r] - k;  // pos <= wmax is valid
    uint32_t acc = 0;
    int bad = 0;
    for (int64_t j = 0; j < k - 1; ++j) {
      int8_t c = row[j];
      bool isbad = (c >= 4 || c < 0);
      if (isbad) bad++;
      acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
    }
    for (int64_t j = 0; j < W; ++j) {
      int8_t c = row[j + k - 1];
      bool isbad = (c >= 4 || c < 0);
      if (isbad) bad++;
      acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
      if (j <= wmax && bad == 0)
        posts.push_back({acc, (int32_t)r, (int32_t)j});
      int8_t oc = row[j];
      if (oc >= 4 || oc < 0) bad--;
    }
  }
  // stable sort by code keeps (read, pos) order within each code
  std::stable_sort(posts.begin(), posts.end(),
                   [](const AsmPost& a, const AsmPost& b) {
                     return a.code < b.code;
                   });
  std::unordered_map<uint32_t, std::pair<int64_t, int64_t>> groups;
  groups.reserve(posts.size());
  for (int64_t i = 0; i < (int64_t)posts.size();) {
    int64_t j = i;
    while (j < (int64_t)posts.size() && posts[j].code == posts[i].code) j++;
    groups.emplace(posts[i].code, std::make_pair(i, j));
    i = j;
  }

  std::unordered_set<uint32_t> sample_only;
  sample_only.reserve((size_t)nk);
  for (int64_t i = 0; i < nk; ++i) {
    int64_t v = kmer_values[i];
    if (v >= 0 && v <= 0xffffffffLL) sample_only.insert((uint32_t)v);
  }

  std::unordered_set<uint32_t> kmer_used;
  std::vector<char> read_used((size_t)R, 0);
  std::vector<int64_t> placed_gen((size_t)R, -1);
  int64_t gen = -1;

  std::vector<int64_t> meta, reads_out, kmers_out;
  std::vector<int8_t> cons_out;

  for (int64_t si = 0; si < nk; ++si) {
    int64_t sv = kmer_values[si];
    // values outside uint32 cannot occur in reads or consensus; the
    // Python path just marks them used — observationally identical
    if (sv < 0 || sv > 0xffffffffLL) continue;
    uint32_t seed = (uint32_t)sv;
    if (kmer_used.count(seed)) continue;
    auto git = groups.find(seed);
    int64_t gs = 0, ge = 0, hits = 0;
    if (git != groups.end()) {
      gs = git->second.first;
      ge = git->second.second;
      for (int64_t i = gs; i < ge; ++i)
        if (!read_used[posts[i].read]) hits++;
    }
    if (hits < (int64_t)min_reads) {
      kmer_used.insert(seed);
      continue;
    }
    int64_t fi = gs;
    while (read_used[posts[fi].read]) fi++;

    gen++;
    AsmGrow grow;
    std::vector<std::pair<int32_t, int64_t>> placed;
    std::deque<uint32_t> q;
    std::unordered_set<uint32_t> queued;
    std::unordered_map<uint32_t, int64_t> cons_kpos;
    q.push_back(seed);
    queued.insert(seed);

    auto place = [&](int32_t ridx, int64_t read_kpos,
                     int64_t contig_kpos) -> bool {
      if (placed_gen[ridx] == gen) return false;
      int64_t len = lengths[ridx];
      const int8_t* rc = codes + (int64_t)ridx * L;
      int64_t offset = contig_kpos - read_kpos;
      int64_t clen = grow.cons_len();
      if (clen > 0) {
        int64_t cstart = grow.cons_start();
        const int8_t* cons = grow.cons();
        int64_t c_lo = std::max(cstart, offset);
        int64_t c_hi = std::min(cstart + clen, offset + len);
        if (c_hi > c_lo) {
          int64_t ov = c_hi - c_lo, mm = 0;
          for (int64_t i = c_lo; i < c_hi; ++i) {
            int8_t a = cons[i - cstart], b = rc[i - offset];
            if (a < 4 && b < 4 && b >= 0 && a != b) mm++;
          }
          int64_t thr = std::max((int64_t)2, (int64_t)(mm_frac * (double)ov));
          if (mm > thr) return false;
        }
      }
      grow.add_read(rc, len, offset);
      placed.emplace_back(ridx, offset);
      placed_gen[ridx] = gen;
      return true;
    };

    // consensus k-mer scan: first-occurrence map + enqueue newly
    // reachable sample-only k-mers in scan (position) order
    auto refresh = [&]() {
      cons_kpos.clear();
      int64_t clen = grow.cons_len();
      const int8_t* cons = grow.cons();
      int64_t n = clen - k + 1;
      uint32_t acc = 0;
      int bad = 0;
      for (int64_t j = 0; j < (int64_t)k - 1 && j < clen; ++j) {
        int8_t c = cons[j];
        bool isbad = (c >= 4 || c < 0);
        if (isbad) bad++;
        acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
      }
      for (int64_t j = 0; j < n; ++j) {
        int8_t c = cons[j + k - 1];
        bool isbad = (c >= 4 || c < 0);
        if (isbad) bad++;
        acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
        if (bad == 0) {
          cons_kpos.emplace(acc, j);  // keeps first occurrence
          if (sample_only.count(acc) && !queued.count(acc)) {
            q.push_back(acc);
            queued.insert(acc);
          }
        }
        int8_t oc = cons[j];
        if (oc >= 4 || oc < 0) bad--;
      }
    };

    if (place(posts[fi].read, posts[fi].pos, 0)) refresh();

    while (!q.empty()) {
      uint32_t code = q.front();
      q.pop_front();
      kmer_used.insert(code);
      auto it = cons_kpos.find(code);
      if (it == cons_kpos.end()) continue;
      int64_t contig_kpos = grow.cons_start() + it->second;
      bool added = false;
      auto g2 = groups.find(code);
      if (g2 != groups.end()) {
        for (int64_t i = g2->second.first; i < g2->second.second; ++i) {
          int32_t rr = posts[i].read;
          if (read_used[rr] || placed_gen[rr] == gen) continue;
          if (place(rr, posts[i].pos, contig_kpos)) added = true;
        }
      }
      if (added) refresh();
    }

    int64_t clen = grow.cons_len();
    if ((int64_t)placed.size() >= (int64_t)min_reads &&
        clen >= (int64_t)min_len) {
      for (auto& pr : placed) read_used[pr.first] = 1;
      int64_t base = grow.cons_start();
      const int8_t* cons = grow.cons();
      int64_t nkm0 = (int64_t)kmers_out.size();
      // all sample-only k-mers of the consensus, scan order, dups kept
      int64_t n = clen - k + 1;
      uint32_t acc = 0;
      int bad = 0;
      for (int64_t j = 0; j < (int64_t)k - 1 && j < clen; ++j) {
        int8_t c = cons[j];
        bool isbad = (c >= 4 || c < 0);
        if (isbad) bad++;
        acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
      }
      for (int64_t j = 0; j < n; ++j) {
        int8_t c = cons[j + k - 1];
        bool isbad = (c >= 4 || c < 0);
        if (isbad) bad++;
        acc = ((acc << 2) | (isbad ? 0u : (uint32_t)c)) & mask;
        if (bad == 0 && sample_only.count(acc))
          kmers_out.push_back((int64_t)acc);
        int8_t oc = cons[j];
        if (oc >= 4 || oc < 0) bad--;
      }
      meta.push_back((int64_t)placed.size());
      meta.push_back((int64_t)kmers_out.size() - nkm0);
      meta.push_back(clen);
      for (auto& pr : placed) {
        reads_out.push_back((int64_t)pr.first);
        reads_out.push_back(pr.second - base);
      }
      cons_out.insert(cons_out.end(), cons, cons + clen);
    }
  }

  uint64_t header[4] = {meta.size() / 3, reads_out.size() / 2,
                        kmers_out.size(), cons_out.size()};
  uint64_t total = sizeof(header) + meta.size() * 8 + reads_out.size() * 8 +
                   kmers_out.size() * 8 + cons_out.size();
  uint8_t* blob = (uint8_t*)std::malloc(total ? total : 1);
  if (!blob) return -2;
  uint8_t* p = blob;
  std::memcpy(p, header, sizeof(header));
  p += sizeof(header);
  if (!meta.empty()) {
    std::memcpy(p, meta.data(), meta.size() * 8);
    p += meta.size() * 8;
  }
  if (!reads_out.empty()) {
    std::memcpy(p, reads_out.data(), reads_out.size() * 8);
    p += reads_out.size() * 8;
  }
  if (!kmers_out.empty()) {
    std::memcpy(p, kmers_out.data(), kmers_out.size() * 8);
    p += kmers_out.size() * 8;
  }
  if (!cons_out.empty()) std::memcpy(p, cons_out.data(), cons_out.size());
  *out_blob = blob;
  *out_len = total;
  return 0;
}

}  // extern "C"
