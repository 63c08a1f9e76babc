// Native TFRecord engine for cloudaae_tpu.
//
// Replaces the hot host-side record IO with C++: crc32c (slicing-by-8),
// TFRecord framing, and a fused tf.train.Example parser for the fixed
// YCB pose schema {translation f32[3], axisangle f32[3], class_id i64}
// (train_cloudAAE_ycbv.py:57-65).  Python binds via ctypes
// (cloudaae_tpu/data/native.py) with a pure-python fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ----------------------------------------------------------- crc32c

uint32_t crc_table[8][256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82F63B78u;  // Castagnoli, reflected
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ poly : c >> 1;
    crc_table[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = crc_table[0][i];
    for (int t = 1; t < 8; ++t) {
      c = crc_table[0][c & 0xFF] ^ (c >> 8);
      crc_table[t][i] = c;
    }
  }
  crc_init_done = true;
}

uint32_t crc32c_raw(const uint8_t* data, size_t n) {
  crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint32_t lo, hi;
    memcpy(&lo, data, 4);
    memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
          crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][lo >> 24] ^
          crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
          crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c_raw(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// --------------------------------------------------- protobuf wire

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      v |= uint64_t(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
      if (shift > 63) break;
    }
    ok = false;
    return 0;
  }

  void skip(uint32_t wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: { uint64_t n = varint(); p += n; break; }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

// Parse one Example payload for the pose schema; returns true on success.
bool parse_pose_example(const uint8_t* buf, size_t len, float* trans,
                        float* axag, int64_t* cls) {
  Cursor ex{buf, buf + len};
  bool got_t = false, got_a = false, got_c = false;
  while (ex.p < ex.end && ex.ok) {
    uint64_t tag = ex.varint();
    if (tag != ((1 << 3) | 2)) { ex.skip(tag & 7); continue; }
    uint64_t flen = ex.varint();
    Cursor feats{ex.p, ex.p + flen};
    ex.p += flen;
    while (feats.p < feats.end && feats.ok) {
      uint64_t ftag = feats.varint();
      if (ftag != ((1 << 3) | 2)) { feats.skip(ftag & 7); continue; }
      uint64_t elen = feats.varint();
      Cursor entry{feats.p, feats.p + elen};
      feats.p += elen;
      const uint8_t* key = nullptr;
      size_t key_len = 0;
      const uint8_t* fval = nullptr;
      size_t fval_len = 0;
      while (entry.p < entry.end && entry.ok) {
        uint64_t etag = entry.varint();
        uint64_t n = (etag & 7) == 2 ? entry.varint() : 0;
        if (etag == ((1 << 3) | 2)) { key = entry.p; key_len = n; entry.p += n; }
        else if (etag == ((2 << 3) | 2)) { fval = entry.p; fval_len = n; entry.p += n; }
        else entry.skip(etag & 7);
      }
      if (!key || !fval) continue;
      // Feature -> {FloatList=2 {packed floats=1}, Int64List=3 {packed=1}}
      Cursor feat{fval, fval + fval_len};
      while (feat.p < feat.end && feat.ok) {
        uint64_t t2 = feat.varint();
        uint64_t n2 = (t2 & 7) == 2 ? feat.varint() : 0;
        if (t2 == ((2 << 3) | 2)) {  // FloatList
          Cursor fl{feat.p, feat.p + n2};
          feat.p += n2;
          while (fl.p < fl.end && fl.ok) {
            uint64_t t3 = fl.varint();
            if (t3 == ((1 << 3) | 2)) {
              uint64_t bytes = fl.varint();
              if (key_len == 11 && !memcmp(key, "translation", 11) && bytes >= 12) {
                memcpy(trans, fl.p, 12);
                got_t = true;
              } else if (key_len == 9 && !memcmp(key, "axisangle", 9) && bytes >= 12) {
                memcpy(axag, fl.p, 12);
                got_a = true;
              }
              fl.p += bytes;
            } else {
              fl.skip(t3 & 7);
            }
          }
        } else if (t2 == ((3 << 3) | 2)) {  // Int64List
          Cursor il{feat.p, feat.p + n2};
          feat.p += n2;
          while (il.p < il.end && il.ok) {
            uint64_t t3 = il.varint();
            if (t3 == ((1 << 3) | 2)) {
              uint64_t bytes = il.varint();
              Cursor pk{il.p, il.p + bytes};
              il.p += bytes;
              uint64_t v = pk.varint();
              if (key_len == 8 && !memcmp(key, "class_id", 8)) {
                *cls = (int64_t)v;
                got_c = true;
              }
            } else if ((t3 >> 3) == 1 && (t3 & 7) == 0) {
              uint64_t v = il.varint();
              if (key_len == 8 && !memcmp(key, "class_id", 8)) {
                *cls = (int64_t)v;
                got_c = true;
              }
            } else {
              il.skip(t3 & 7);
            }
          }
        } else {
          feat.skip(t2 & 7);
        }
      }
    }
  }
  return got_t && got_a && got_c;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> data;
  FILE* f = fopen(path, "rb");
  if (!f) return data;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  data.resize(size);
  if (size && fread(data.data(), 1, size, f) != (size_t)size) data.clear();
  fclose(f);
  return data;
}

}  // namespace

extern "C" {

uint32_t tfrec_crc32c(const uint8_t* data, size_t n) {
  return crc32c_raw(data, n);
}

uint32_t tfrec_masked_crc(const uint8_t* data, size_t n) {
  return masked_crc(data, n);
}

// Count records in a TFRecord file; -1 on IO/framing error.
int64_t tfrec_count(const char* path) {
  auto data = read_file(path);
  if (data.empty()) return -1;
  size_t pos = 0;
  int64_t n = 0;
  while (pos + 12 <= data.size()) {
    uint64_t len;
    memcpy(&len, data.data() + pos, 8);
    pos += 12;
    if (pos + len + 4 > data.size()) return -1;
    pos += len + 4;
    ++n;
  }
  return n;
}

// Parse a whole pose-record file into caller buffers of capacity `cap`
// records.  Returns the number parsed, or -1 on error.
int64_t tfrec_load_poses(const char* path, float* translations, float* axags,
                         int32_t* class_ids, int64_t cap) {
  auto data = read_file(path);
  if (data.empty()) return -1;
  size_t pos = 0;
  int64_t n = 0;
  while (pos + 12 <= data.size() && n < cap) {
    uint64_t len;
    memcpy(&len, data.data() + pos, 8);
    pos += 12;
    if (pos + len + 4 > data.size()) return -1;
    int64_t cls = 0;
    if (!parse_pose_example(data.data() + pos, len, translations + 3 * n,
                            axags + 3 * n, &cls))
      return -1;
    class_ids[n] = (int32_t)cls;
    pos += len + 4;
    ++n;
  }
  return n;
}

// Frame payloads for writing: compute framing (len+crc, payload crc) for one
// payload into an output buffer of size len+16.  Returns bytes written.
int64_t tfrec_frame_record(const uint8_t* payload, uint64_t len, uint8_t* out) {
  memcpy(out, &len, 8);
  uint32_t hcrc = masked_crc(out, 8);
  memcpy(out + 8, &hcrc, 4);
  memcpy(out + 12, payload, len);
  uint32_t pcrc = masked_crc(payload, len);
  memcpy(out + 12 + len, &pcrc, 4);
  return (int64_t)(len + 16);
}

}  // extern "C"
