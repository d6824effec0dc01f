// Restart-marker parallel JPEG entropy decode.
//
// Huffman entropy decoding is the irreducibly serial part of JPEG — except
// when the encoder emitted restart markers (DRI > 0): DC predictors reset
// and the bitstream re-aligns at every RSTn, so the segments between
// markers are independently decodable. This module parses the marker
// structure, splits the scan at RSTn boundaries, and decodes the segments
// on worker threads, producing a buffer BYTE-IDENTICAL to
// icstpu_jpeg_coeffs (imgcodec.cpp): [CoeffHeader][per-component int16
// coefficient planes in natural order].
//
// Scope: baseline/extended-sequential Huffman (SOF0/SOF1), 8-bit, 1 or 3
// components, one interleaved scan, DRI > 0. Anything else returns 1 and
// the caller falls back to the serial libjpeg path. On this 1-core build
// host the parallelism is latent; on real serving hosts host entropy
// decode is the binding ingest constraint (docs/benchmarks.md), and it
// scales with threads here.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// zigzag (stream) index -> natural (row-major) index, per the JPEG spec;
// coefficient planes are stored in natural order to match libjpeg's
// jpeg_read_coefficients output exactly.
const uint8_t kNaturalOrder[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  bool present = false;
  uint8_t look_nbits[256];  // 8-bit lookahead: code length (0 = miss)
  uint8_t look_sym[256];
  int32_t maxcode[18];      // largest code of each length, -1 if none
  int32_t valoffset[17];    // huffval index = valoffset[l] + code
  uint8_t huffval[256];
};

bool build_huff(const uint8_t counts[17], const uint8_t *values, int nsym,
                HuffTable *t) {
  uint8_t huffsize[257];
  uint32_t huffcode[257];
  int k = 0;
  for (int l = 1; l <= 16; l++)
    for (int i = 0; i < counts[l]; i++) {
      if (k >= 256) return false;
      huffsize[k++] = uint8_t(l);
    }
  if (k != nsym || k == 0) return false;
  huffsize[k] = 0;
  uint32_t code = 0;
  int si = huffsize[0];
  int p = 0;
  while (huffsize[p]) {
    while (huffsize[p] == si) huffcode[p++] = code++;
    if (code >= (1u << si)) return false;  // oversubscribed table
    code <<= 1;
    si++;
  }
  memcpy(t->huffval, values, nsym);
  p = 0;
  for (int l = 1; l <= 16; l++) {
    if (counts[l]) {
      t->valoffset[l] = p - int32_t(huffcode[p]);
      p += counts[l];
      t->maxcode[l] = int32_t(huffcode[p - 1]);
    } else {
      t->maxcode[l] = -1;
    }
  }
  t->maxcode[17] = 0xFFFFF;
  memset(t->look_nbits, 0, sizeof(t->look_nbits));
  p = 0;
  for (int l = 1; l <= 8; l++)
    for (int i = 0; i < counts[l]; i++, p++) {
      int lookbits = int(huffcode[p]) << (8 - l);
      for (int ctr = 1 << (8 - l); ctr > 0; ctr--, lookbits++) {
        t->look_nbits[lookbits] = uint8_t(l);
        t->look_sym[lookbits] = t->huffval[p];
      }
    }
  t->present = true;
  return true;
}

// Bit reader over one entropy segment: 0xFF00 byte-unstuffing, zero padding
// past the segment end (pad bits are never decoded as data in a well-formed
// stream — lookahead fills only). 64-bit accumulator with a 4-bytes-at-once
// fast refill whenever the next word contains no 0xFF (the common case) —
// the refill loop, not the Huffman walk, dominates entropy-decode time.
struct BitReader {
  const uint8_t *p;
  const uint8_t *end;
  uint64_t acc = 0;
  int cnt = 0;

  BitReader(const uint8_t *begin, const uint8_t *stop) : p(begin), end(stop) {}

  static inline bool has_ff(uint32_t w) {
    // per-byte "== 0xFF" test: any byte of (w ^ 0xFF..FF) equal to zero
    uint32_t x = w ^ 0xFFFFFFFFu;
    return ((x - 0x01010101u) & ~x & 0x80808080u) != 0;
  }

  inline void fill_to(int n) {
    while (cnt < n) {
      if (cnt <= 32 && p + 4 <= end) {
        uint32_t w;
        memcpy(&w, p, 4);
        if (!has_ff(w)) {
          acc = (acc << 32) | uint64_t(__builtin_bswap32(w));
          cnt += 32;
          p += 4;
          continue;
        }
      }
      uint64_t b = 0;
      if (p < end) {
        b = *p;
        if (b == 0xFF) {
          if (p + 1 < end && p[1] == 0x00) {
            p += 2;
          } else {          // marker or truncation: pad with zeros
            b = 0;
            p = end;
          }
        } else {
          p++;
        }
      }
      acc = (acc << 8) | b;
      cnt += 8;
    }
  }

  inline int get_bits(int n) {
    if (!n) return 0;
    fill_to(n);
    cnt -= n;
    return int((acc >> cnt) & ((1u << n) - 1));
  }

  inline int huff_decode(const HuffTable &t) {
    fill_to(16);              // enough for any code (<=16 bits)
    int look = int((acc >> (cnt - 8)) & 0xFF);
    int nb = t.look_nbits[look];
    if (nb) {
      cnt -= nb;
      return t.look_sym[look];
    }
    cnt -= 8;                 // all codes <= 8 bits hit the lookahead
    int32_t code = look;
    for (int l = 9; l <= 16; l++) {
      code = (code << 1) | int((acc >> --cnt) & 1);
      if (code <= t.maxcode[l]) return t.huffval[t.valoffset[l] + code];
    }
    return -1;                // invalid code
  }
};

static inline int extend(int v, int s) {
  return (v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

bool decode_block(BitReader &br, const HuffTable &dc, const HuffTable &ac,
                  int *pred, int16_t *block) {
  int s = br.huff_decode(dc);
  if (s < 0 || s > 15) return false;
  int diff = s ? extend(br.get_bits(s), s) : 0;
  *pred += diff;
  block[0] = int16_t(*pred);
  int k = 1;
  while (k < 64) {
    int rs = br.huff_decode(ac);
    if (rs < 0) return false;
    int r = rs >> 4, sz = rs & 15;
    if (sz == 0) {
      if (r != 15) break;     // EOB
      k += 16;
      continue;
    }
    k += r;
    if (k > 63) return false;
    block[kNaturalOrder[k]] = int16_t(extend(br.get_bits(sz), sz));
    k++;
  }
  return true;
}

// mirrors CoeffHeader in imgcodec.cpp — layouts must stay byte-identical
struct CoeffHeader {
  int num_components;
  int width, height;
  int comp[4][4];             // blocks_w, blocks_h, h_samp, v_samp
  uint16_t quant[4][64];
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0;
  int dc_tbl = 0, ac_tbl = 0;
  int width_in_blocks = 0, height_in_blocks = 0;
};

struct Parsed {
  int width = 0, height = 0, ncomp = 0;
  Component comp[4];
  uint16_t qt[4][64];
  bool qt_present[4] = {false, false, false, false};
  HuffTable dc[4], ac[4];
  int restart_interval = 0;
  const uint8_t *scan_start = nullptr;
};

static inline int rdiv_up(long a, long b) { return int((a + b - 1) / b); }

// returns 0 ok, 1 not-eligible (caller: serial fallback), <0 malformed
int parse_headers(const uint8_t *data, size_t len, Parsed *out) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return -2;
  size_t pos = 2;
  bool have_sof = false;
  while (pos + 4 <= len) {
    if (data[pos] != 0xFF) return -2;
    uint8_t m = data[pos + 1];
    if (m == 0xFF) {          // fill byte
      pos++;
      continue;
    }
    if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {  // standalone markers
      pos += 2;
      continue;
    }
    size_t seglen = (size_t(data[pos + 2]) << 8) | data[pos + 3];
    if (seglen < 2 || pos + 2 + seglen > len) return -2;
    const uint8_t *seg = data + pos + 4;
    size_t body = seglen - 2;
    switch (m) {
      case 0xC0:              // SOF0 baseline
      case 0xC1: {            // SOF1 extended sequential (same entropy form)
        if (body < 6) return -2;
        int precision = seg[0];
        out->height = (seg[1] << 8) | seg[2];
        out->width = (seg[3] << 8) | seg[4];
        out->ncomp = seg[5];
        if (precision != 8) return 1;
        if (out->ncomp != 1 && out->ncomp != 3) return 1;
        if (body < size_t(6 + 3 * out->ncomp)) return -2;
        for (int c = 0; c < out->ncomp; c++) {
          const uint8_t *cs = seg + 6 + 3 * c;
          out->comp[c].id = cs[0];
          out->comp[c].h = cs[1] >> 4;
          out->comp[c].v = cs[1] & 15;
          out->comp[c].tq = cs[2];
          if (out->comp[c].h < 1 || out->comp[c].h > 4 ||
              out->comp[c].v < 1 || out->comp[c].v > 4 ||
              out->comp[c].tq > 3)
            return 1;
        }
        have_sof = true;
        break;
      }
      case 0xC2:              // progressive
      case 0xC3: case 0xC5: case 0xC6: case 0xC7:
      case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
        return 1;             // non-sequential-Huffman SOF: serial path
      case 0xC4: {            // DHT (possibly several tables)
        size_t off = 0;
        while (off + 17 <= body) {
          int tc = seg[off] >> 4, th = seg[off] & 15;
          if (tc > 1 || th > 3) return 1;
          uint8_t counts[17] = {0};
          int nsym = 0;
          for (int l = 1; l <= 16; l++) {
            counts[l] = seg[off + l];
            nsym += counts[l];
          }
          if (off + 17 + nsym > body || nsym > 256) return -2;
          HuffTable *t = tc ? &out->ac[th] : &out->dc[th];
          if (!build_huff(counts, seg + off + 17, nsym, t)) return -2;
          off += 17 + nsym;
        }
        break;
      }
      case 0xDB: {            // DQT (possibly several tables)
        size_t off = 0;
        while (off < body) {
          int pq = seg[off] >> 4, tq = seg[off] & 15;
          if (tq > 3 || pq > 1) return -2;
          size_t n = pq ? 128 : 64;
          if (off + 1 + n > body) return -2;
          for (int i = 0; i < 64; i++) {
            uint16_t v = pq ? ((seg[off + 1 + 2 * i] << 8) |
                               seg[off + 2 + 2 * i])
                            : seg[off + 1 + i];
            out->qt[tq][kNaturalOrder[i]] = v;  // store natural (libjpeg)
          }
          out->qt_present[tq] = true;
          off += 1 + n;
        }
        break;
      }
      case 0xDD:              // DRI
        if (body < 2) return -2;
        out->restart_interval = (seg[0] << 8) | seg[1];
        break;
      case 0xDA: {            // SOS
        if (!have_sof) return -2;
        if (body < 1) return -2;
        int ns = seg[0];
        if (ns != out->ncomp) return 1;  // multi-scan: serial path
        if (body < size_t(1 + 2 * ns + 3)) return -2;
        for (int s = 0; s < ns; s++) {
          int cid = seg[1 + 2 * s];
          int tabs = seg[2 + 2 * s];
          bool found = false;
          for (int c = 0; c < out->ncomp; c++)
            if (out->comp[c].id == cid) {
              out->comp[c].dc_tbl = tabs >> 4;
              out->comp[c].ac_tbl = tabs & 15;
              found = true;
            }
          if (!found) return -2;
        }
        const uint8_t *tail = seg + 1 + 2 * ns;
        if (tail[0] != 0 || tail[1] != 63 || tail[2] != 0) return 1;
        out->scan_start = seg + body;
        return 0;
      }
      case 0xD9:              // EOI before SOS
        return -2;
      default:                // APPn / COM / others: skip
        break;
    }
    pos += 2 + seglen;
  }
  return -2;
}

struct SegmentTask {
  const uint8_t *begin;
  const uint8_t *end;
  long first_mcu;
  long mcu_count;
};

struct ScanGeom {
  int mcu_w, mcu_h;
  long total_mcus;
  // per scan-member: component index, h, v (effective)
  int nmembers;
  int comp_idx[4], mh[4], mv[4];
};

bool decode_segment(const Parsed &P, const ScanGeom &G, const SegmentTask &T,
                    int16_t *planes[4]) {
  BitReader br(T.begin, T.end);
  int pred[4] = {0, 0, 0, 0};
  int16_t dummy[64];
  for (long m = 0; m < T.mcu_count; m++) {
    long mcu = T.first_mcu + m;
    long my = mcu / G.mcu_w, mx = mcu % G.mcu_w;
    for (int s = 0; s < G.nmembers; s++) {
      int ci = G.comp_idx[s];
      const Component &C = P.comp[ci];
      const HuffTable &dc = P.dc[C.dc_tbl];
      const HuffTable &ac = P.ac[C.ac_tbl];
      if (!dc.present || !ac.present) return false;
      for (int by = 0; by < G.mv[s]; by++)
        for (int bx = 0; bx < G.mh[s]; bx++) {
          long row = my * G.mv[s] + by;
          long col = mx * G.mh[s] + bx;
          int16_t *target;
          if (row < C.height_in_blocks && col < C.width_in_blocks) {
            target = planes[ci] + (row * C.width_in_blocks + col) * 64;
          } else {            // dummy block padding the MCU grid
            memset(dummy, 0, sizeof(dummy));
            target = dummy;
          }
          if (!decode_block(br, dc, ac, &pred[ci], target)) return false;
        }
    }
  }
  return true;
}

}  // namespace

extern "C" {

void icstpu_free(uint8_t *p);  // imgcodec.cpp

// Parallel coefficient extraction. Returns 0 on success (buffer layout
// identical to icstpu_jpeg_coeffs), 1 when the file isn't eligible for the
// restart-parallel path (caller should use the serial decoder), negative on
// malformed input.
int icstpu_jpeg_coeffs_mt(const uint8_t *data, size_t len, uint8_t **out,
                          size_t *out_len, int threads) {
  if (threads < 2) return 1;
  if (threads > 64) threads = 64;
  Parsed P;
  int rc = parse_headers(data, len, &P);
  if (rc != 0) return rc;
  if (P.restart_interval <= 0) return 1;
  if (P.width <= 0 || P.height <= 0) return -2;

  int hmax = 1, vmax = 1;
  for (int c = 0; c < P.ncomp; c++) {
    if (P.comp[c].h > hmax) hmax = P.comp[c].h;
    if (P.comp[c].v > vmax) vmax = P.comp[c].v;
    if (!P.qt_present[P.comp[c].tq]) return -2;
  }
  for (int c = 0; c < P.ncomp; c++) {
    P.comp[c].width_in_blocks =
        rdiv_up(long(P.width) * P.comp[c].h, long(hmax) * 8);
    P.comp[c].height_in_blocks =
        rdiv_up(long(P.height) * P.comp[c].v, long(vmax) * 8);
  }

  ScanGeom G;
  if (P.ncomp == 1) {
    // single-component scan is non-interleaved: MCU = 1 block, sampling
    // factors ignored (ITU T.81 A.2.2); grid = the component's block grid
    G.mcu_w = P.comp[0].width_in_blocks;
    G.mcu_h = P.comp[0].height_in_blocks;
    G.nmembers = 1;
    G.comp_idx[0] = 0;
    G.mh[0] = G.mv[0] = 1;
  } else {
    G.mcu_w = rdiv_up(P.width, hmax * 8);
    G.mcu_h = rdiv_up(P.height, vmax * 8);
    G.nmembers = P.ncomp;
    for (int c = 0; c < P.ncomp; c++) {
      G.comp_idx[c] = c;
      G.mh[c] = P.comp[c].h;
      G.mv[c] = P.comp[c].v;
    }
  }
  G.total_mcus = long(G.mcu_w) * G.mcu_h;
  long nseg = (G.total_mcus + P.restart_interval - 1) / P.restart_interval;
  if (nseg < 2) return 1;     // nothing to parallelize

  // split the entropy stream at RSTn markers
  std::vector<const uint8_t *> starts;
  starts.push_back(P.scan_start);
  const uint8_t *pend = data + len;
  const uint8_t *p = P.scan_start;
  while (p + 1 < pend) {
    if (p[0] != 0xFF) {
      p++;
      continue;
    }
    uint8_t m = p[1];
    if (m == 0x00) {
      p += 2;                 // stuffed byte
    } else if (m == 0xFF) {
      p++;                    // fill byte
    } else if (m >= 0xD0 && m <= 0xD7) {
      starts.push_back(p + 2);
      p += 2;
    } else {
      pend = p;               // EOI / next marker: end of scan
      break;
    }
  }
  if (long(starts.size()) != nseg) return 1;  // marker count mismatch

  size_t total = sizeof(CoeffHeader);
  for (int c = 0; c < P.ncomp; c++)
    total += size_t(P.comp[c].width_in_blocks) * P.comp[c].height_in_blocks *
             64 * sizeof(int16_t);
  uint8_t *buffer = static_cast<uint8_t *>(calloc(1, total));
  if (!buffer) return -5;
  CoeffHeader hdr;
  memset(&hdr, 0, sizeof(hdr));
  hdr.num_components = P.ncomp;
  hdr.width = P.width;
  hdr.height = P.height;
  int16_t *planes[4] = {nullptr, nullptr, nullptr, nullptr};
  uint8_t *cursor = buffer + sizeof(hdr);
  for (int c = 0; c < P.ncomp; c++) {
    hdr.comp[c][0] = P.comp[c].width_in_blocks;
    hdr.comp[c][1] = P.comp[c].height_in_blocks;
    hdr.comp[c][2] = P.comp[c].h;
    hdr.comp[c][3] = P.comp[c].v;
    memcpy(hdr.quant[c], P.qt[P.comp[c].tq], sizeof(hdr.quant[c]));
    planes[c] = reinterpret_cast<int16_t *>(cursor);
    cursor += size_t(P.comp[c].width_in_blocks) * P.comp[c].height_in_blocks *
              64 * sizeof(int16_t);
  }
  memcpy(buffer, &hdr, sizeof(hdr));

  std::vector<SegmentTask> tasks;
  tasks.reserve(nseg);
  for (long s = 0; s < nseg; s++) {
    SegmentTask t;
    t.begin = starts[s];
    t.end = (s + 1 < nseg) ? starts[s + 1] - 2 : pend;  // -2: the RST marker
    t.first_mcu = s * P.restart_interval;
    t.mcu_count =
        std::min<long>(P.restart_interval, G.total_mcus - t.first_mcu);
    tasks.push_back(t);
  }

  int T = int(std::min<long>(threads, nseg));
  std::atomic<bool> failed(false);
  std::atomic<long> next(0);
  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= long(tasks.size()) || failed.load(std::memory_order_relaxed))
        return;
      if (!decode_segment(P, G, tasks[i], planes)) failed.store(true);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(T - 1);
  for (int t = 0; t < T - 1; t++) pool.emplace_back(worker);
  worker();
  for (auto &th : pool) th.join();
  if (failed.load()) {
    free(buffer);
    return -6;
  }
  *out = buffer;
  *out_len = total;
  return 0;
}

}  // extern "C"
