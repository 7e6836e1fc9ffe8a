// Native PCD codec — the data-path C++ component of rfnet_tpu.
//
// Role: fast parsing of .pcd point-cloud files (ascii / binary /
// binary_compressed+LZF) into caller-provided float buffers, so the host
// input pipeline feeding the TPU is not bottlenecked on Python float
// parsing. This is the TPU-framework counterpart of the reference's native
// host-side data machinery (tensorpack's compiled loaders + ZMQ prefetch
// fan-out, data_util.py:73-87); the compute-path CUDA ops map to Pallas
// kernels instead (see rfnet_tpu/ops/pallas/).
//
// C ABI (consumed via ctypes from rfnet_tpu/data/native.py):
//   pcd_count(path)                      -> number of points, or -errno
//   pcd_read(path, out, max_pts)         -> points written (xyz f32), or -err
// Errors: -1 open failed, -2 bad header, -3 unsupported format,
//         -4 truncated data, -5 buffer too small.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
  std::vector<std::string> fields;
  std::vector<int> sizes;
  std::vector<char> types;
  std::vector<int> counts;
  long points = -1;
  std::string data;  // ascii | binary | binary_compressed
  long data_offset = 0;
};

bool parse_header(FILE* f, Header* h) {
  char line[4096];
  while (fgets(line, sizeof line, f)) {
    if (line[0] == '#') continue;
    char key[64];
    if (sscanf(line, "%63s", key) != 1) continue;
    std::string k(key);
    const char* rest = line + k.size();
    while (*rest == ' ') ++rest;
    if (k == "FIELDS") {
      char buf[64];
      int off = 0, n;
      h->fields.clear();
      while (sscanf(rest + off, "%63s%n", buf, &n) == 1) {
        h->fields.emplace_back(buf);
        off += n;
      }
    } else if (k == "SIZE" || k == "COUNT") {
      auto* v = (k == "SIZE") ? &h->sizes : &h->counts;
      v->clear();
      int off = 0, n, x;
      while (sscanf(rest + off, "%d%n", &x, &n) == 1) {
        v->push_back(x);
        off += n;
      }
    } else if (k == "TYPE") {
      char buf[8];
      int off = 0, n;
      h->types.clear();
      while (sscanf(rest + off, "%7s%n", buf, &n) == 1) {
        h->types.push_back(buf[0]);
        off += n;
      }
    } else if (k == "POINTS") {
      h->points = atol(rest);
    } else if (k == "DATA") {
      char buf[64];
      if (sscanf(rest, "%63s", buf) == 1) h->data = buf;
      h->data_offset = ftell(f);
      break;
    }
  }
  if (h->points < 0 || h->data.empty() || h->fields.empty()) return false;
  if (h->counts.empty()) h->counts.assign(h->fields.size(), 1);
  return h->sizes.size() == h->fields.size() &&
         h->types.size() == h->fields.size() &&
         h->counts.size() == h->fields.size();
}

// LZF decompression (PCL binary_compressed codec)
long lzf_decompress(const uint8_t* in, long in_len, uint8_t* out, long out_len) {
  long i = 0, o = 0;
  while (i < in_len && o < out_len) {
    unsigned ctrl = in[i++];
    if (ctrl < 32) {
      long run = ctrl + 1;
      if (i + run > in_len || o + run > out_len) return -1;
      memcpy(out + o, in + i, run);
      i += run;
      o += run;
    } else {
      long len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -1;
        len += in[i++];
      }
      if (i >= in_len) return -1;
      long ref = o - ((long)(ctrl & 0x1f) << 8) - in[i++] - 1;
      if (ref < 0 || o + len + 2 > out_len) return -1;
      for (long k = 0; k < len + 2; ++k) out[o + k] = out[ref + k];
      o += len + 2;
    }
  }
  return o;
}

float field_as_float(const uint8_t* p, char type, int size) {
  switch (type) {
    case 'F':
      if (size == 4) { float v; memcpy(&v, p, 4); return v; }
      if (size == 8) { double v; memcpy(&v, p, 8); return (float)v; }
      break;
    case 'I':
      if (size == 1) { int8_t v; memcpy(&v, p, 1); return (float)v; }
      if (size == 2) { int16_t v; memcpy(&v, p, 2); return (float)v; }
      if (size == 4) { int32_t v; memcpy(&v, p, 4); return (float)v; }
      break;
    case 'U':
      if (size == 1) { uint8_t v; memcpy(&v, p, 1); return (float)v; }
      if (size == 2) { uint16_t v; memcpy(&v, p, 2); return (float)v; }
      if (size == 4) { uint32_t v; memcpy(&v, p, 4); return (float)v; }
      break;
  }
  return 0.0f;
}

}  // namespace

extern "C" {

long pcd_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  bool ok = parse_header(f, &h);
  fclose(f);
  return ok ? h.points : -2;
}

long pcd_read(const char* path, float* out, long max_pts) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!parse_header(f, &h)) { fclose(f); return -2; }
  if (h.points > max_pts) { fclose(f); return -5; }

  int xi = -1, yi = -1, zi = -1;
  long stride = 0;
  std::vector<long> offsets(h.fields.size());
  for (size_t i = 0; i < h.fields.size(); ++i) {
    offsets[i] = stride;
    stride += (long)h.sizes[i] * h.counts[i];
    if (h.fields[i] == "x") xi = (int)i;
    if (h.fields[i] == "y") yi = (int)i;
    if (h.fields[i] == "z") zi = (int)i;
  }
  if (xi < 0 || yi < 0 || zi < 0) { fclose(f); return -2; }

  long n = h.points;
  long result = n;
  if (h.data == "ascii") {
    for (long p = 0; p < n; ++p) {
      char line[8192];
      if (!fgets(line, sizeof line, f)) { result = -4; break; }
      const char* s = line;
      char* end;
      int col = 0;
      float vals[3] = {0, 0, 0};
      for (size_t i = 0; i < h.fields.size() && *s; ++i) {
        for (int c = 0; c < h.counts[i]; ++c) {
          double v = strtod(s, &end);
          if (end == s) break;
          s = end;
          if (c == 0) {
            if ((int)i == xi) vals[0] = (float)v;
            else if ((int)i == yi) vals[1] = (float)v;
            else if ((int)i == zi) vals[2] = (float)v;
          }
        }
        ++col;
      }
      out[p * 3 + 0] = vals[0];
      out[p * 3 + 1] = vals[1];
      out[p * 3 + 2] = vals[2];
    }
  } else if (h.data == "binary") {
    std::vector<uint8_t> buf(stride * n);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return -4; }
    for (long p = 0; p < n; ++p) {
      const uint8_t* rec = buf.data() + p * stride;
      out[p * 3 + 0] = field_as_float(rec + offsets[xi], h.types[xi], h.sizes[xi]);
      out[p * 3 + 1] = field_as_float(rec + offsets[yi], h.types[yi], h.sizes[yi]);
      out[p * 3 + 2] = field_as_float(rec + offsets[zi], h.types[zi], h.sizes[zi]);
    }
  } else if (h.data == "binary_compressed") {
    uint32_t comp = 0, uncomp = 0;
    if (fread(&comp, 4, 1, f) != 1 || fread(&uncomp, 4, 1, f) != 1) {
      fclose(f); return -4;
    }
    std::vector<uint8_t> cbuf(comp), ubuf(uncomp);
    if (fread(cbuf.data(), 1, comp, f) != comp) { fclose(f); return -4; }
    // Header-derived sizes are untrusted: require the decompressor to
    // produce exactly `uncomp` bytes, and every field block to lie inside
    // the buffer, before gathering — a truncated/malformed file must fail
    // with -4, never read past ubuf.
    if (lzf_decompress(cbuf.data(), comp, ubuf.data(), uncomp) != (long)uncomp) {
      fclose(f); return -4;
    }
    // compressed PCD is SOA: all of field 0, then field 1, ...
    long soa_off = 0;
    long xo = -1, yo = -1, zo = -1;
    for (size_t i = 0; i < h.fields.size(); ++i) {
      if ((int)i == xi) xo = soa_off;
      if ((int)i == yi) yo = soa_off;
      if ((int)i == zi) zo = soa_off;
      soa_off += (long)h.sizes[i] * h.counts[i] * n;
    }
    if (xo + (long)h.sizes[xi] * n > (long)uncomp ||
        yo + (long)h.sizes[yi] * n > (long)uncomp ||
        zo + (long)h.sizes[zi] * n > (long)uncomp) {
      fclose(f); return -4;
    }
    for (long p = 0; p < n; ++p) {
      out[p * 3 + 0] = field_as_float(ubuf.data() + xo + p * h.sizes[xi], h.types[xi], h.sizes[xi]);
      out[p * 3 + 1] = field_as_float(ubuf.data() + yo + p * h.sizes[yi], h.types[yi], h.sizes[yi]);
      out[p * 3 + 2] = field_as_float(ubuf.data() + zo + p * h.sizes[zi], h.types[zi], h.sizes[zi]);
    }
  } else {
    result = -3;
  }
  fclose(f);
  return result;
}

}  // extern "C"
