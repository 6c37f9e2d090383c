// posetpu native data loader.
//
// The reference's input pipeline does per-sample python work: zipfile reads,
// cv2.imdecode, cv2.warpAffine (lib/utils/zipreader.py:24-47,
// lib/dataset/joints_dataset_compatible.py:127-165). This library provides the
// same primitives natively — zip central-directory parsing with cached
// handles, libjpeg decode straight to BGR, a bilinear affine warp matching
// cv2's dst->src inverse-map semantics — plus a pthread batch API so the host
// input pipeline overlaps with TPU steps without the GIL.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>
#include <csetjmp>

namespace {

// ----------------------------------------------------------------- JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG byte buffer to BGR8. Returns 0 on success.
//
// max_scale_denom > 1 enables DCT-domain downscaling (libjpeg 1/2, 1/4,
// 1/8): the IDCT itself runs on fewer coefficients, cutting decode time
// ~3x per halving — the dominant host cost when a large frame feeds a
// small crop. full_width reports the pre-scale width (flip math needs it).
int decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* width, int* height, int max_scale_denom = 1,
                int* full_width = nullptr) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  if (full_width) *full_width = cinfo.image_width;
  if (max_scale_denom > 1) {
    int denom = 1;
    while (denom * 2 <= max_scale_denom && denom < 8) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_BGR;  // decode straight to cv2's layout
  const int bgr_direct = 1;
#else
  cinfo.out_color_space = JCS_RGB;
  const int bgr_direct = 0;
#endif
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;
  if (c != 3 && c != 1) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  out->resize(static_cast<size_t>(w) * h * 3);
  std::vector<uint8_t> row(static_cast<size_t>(w) * c);
  uint8_t* rp = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out->data() + static_cast<size_t>(y) * w * 3;
    if (c == 1) {
      for (int x = 0; x < w; ++x) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x];
      }
    } else if (bgr_direct) {
      std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
    } else {  // RGB -> BGR swap
      for (int x = 0; x < w; ++x) {
        dst[3 * x + 0] = row[3 * x + 2];
        dst[3 * x + 1] = row[3 * x + 1];
        dst[3 * x + 2] = row[3 * x + 0];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  return 0;
}

// ------------------------------------------------------------------ ZIP

struct ZipEntry {
  uint64_t offset;      // local header offset
  uint32_t comp_size;
  uint32_t uncomp_size;
  uint16_t method;      // 0 stored, 8 deflate
};

struct ZipArchive {
  FILE* fp = nullptr;
  std::map<std::string, ZipEntry> entries;
  std::mutex mu;
};

std::map<std::string, ZipArchive*> g_archives;
std::mutex g_archives_mu;

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

ZipArchive* open_archive(const std::string& path) {
  std::lock_guard<std::mutex> lock(g_archives_mu);
  auto it = g_archives.find(path);
  if (it != g_archives.end()) return it->second;

  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) return nullptr;
  std::fseek(fp, 0, SEEK_END);
  long fsize = std::ftell(fp);
  // find end-of-central-directory (signature 0x06054b50), scan the tail
  const long tail = std::min<long>(fsize, 70000);
  std::vector<uint8_t> buf(tail);
  std::fseek(fp, fsize - tail, SEEK_SET);
  if (std::fread(buf.data(), 1, tail, fp) != static_cast<size_t>(tail)) {
    std::fclose(fp);
    return nullptr;
  }
  long eocd = -1;
  for (long i = tail - 22; i >= 0; --i) {
    if (rd32(&buf[i]) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd < 0) { std::fclose(fp); return nullptr; }
  uint16_t n_entries = rd16(&buf[eocd + 10]);
  uint32_t cd_size = rd32(&buf[eocd + 12]);
  uint32_t cd_off = rd32(&buf[eocd + 16]);

  std::vector<uint8_t> cd(cd_size);
  std::fseek(fp, cd_off, SEEK_SET);
  if (std::fread(cd.data(), 1, cd_size, fp) != cd_size) {
    std::fclose(fp);
    return nullptr;
  }
  auto* ar = new ZipArchive();
  ar->fp = fp;
  size_t p = 0;
  for (int e = 0; e < n_entries && p + 46 <= cd.size(); ++e) {
    if (rd32(&cd[p]) != 0x02014b50) break;
    ZipEntry ent;
    ent.method = rd16(&cd[p + 10]);
    ent.comp_size = rd32(&cd[p + 20]);
    ent.uncomp_size = rd32(&cd[p + 24]);
    uint16_t name_len = rd16(&cd[p + 28]);
    uint16_t extra_len = rd16(&cd[p + 30]);
    uint16_t comment_len = rd16(&cd[p + 32]);
    ent.offset = rd32(&cd[p + 42]);
    std::string name(reinterpret_cast<char*>(&cd[p + 46]), name_len);
    ar->entries[name] = ent;
    p += 46 + name_len + extra_len + comment_len;
  }
  g_archives[path] = ar;
  return ar;
}

int zip_read(const std::string& path, const std::string& inner,
             std::vector<uint8_t>* out) {
  ZipArchive* ar = open_archive(path);
  if (!ar) return -1;
  auto it = ar->entries.find(inner);
  if (it == ar->entries.end()) return -2;
  const ZipEntry& e = it->second;

  std::vector<uint8_t> comp(e.comp_size);
  {
    std::lock_guard<std::mutex> lock(ar->mu);
    // local header: 30 bytes + name + extra (lengths from the local copy)
    uint8_t lh[30];
    std::fseek(ar->fp, static_cast<long>(e.offset), SEEK_SET);
    if (std::fread(lh, 1, 30, ar->fp) != 30 || rd32(lh) != 0x04034b50) return -3;
    uint16_t nlen = rd16(lh + 26), xlen = rd16(lh + 28);
    std::fseek(ar->fp, static_cast<long>(e.offset) + 30 + nlen + xlen, SEEK_SET);
    if (std::fread(comp.data(), 1, e.comp_size, ar->fp) != e.comp_size) return -4;
  }
  if (e.method == 0) {
    *out = std::move(comp);
    return 0;
  }
  if (e.method != 8) return -5;
  out->resize(e.uncomp_size);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  inflateInit2(&zs, -MAX_WBITS);  // raw deflate
  zs.next_in = comp.data();
  zs.avail_in = e.comp_size;
  zs.next_out = out->data();
  zs.avail_out = e.uncomp_size;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return (rc == Z_STREAM_END) ? 0 : -6;
}

// ----------------------------------------------------------------- WARP

// Bilinear warp, dst(x, y) = src(inv_m @ [x, y, 1]), zero border — cv2's
// warpAffine(INTER_LINEAR) semantics with float interpolation.
// s2d != 0 writes the SAME pixels at space-to-depth addresses instead:
// dst viewed as [dh/2, dw/2, 12] with channel ((y&1)*2 + (x&1))*3 + c —
// the serving input contract that lets the device-side s2d stem skip its
// retile (quant.qchain s2d="pre"; byte count unchanged, free on the host).
// estride > 1 additionally multiplies every element offset (batch-minor
// interleaving: the (H, W, C, N) serving contract writes record n's bytes
// at flat_index * N + n, so the device-side u8 affine emits the stem
// conv's preferred N-minor layout directly — no retile on device).
void warp_affine(const uint8_t* src, int sh, int sw, const float* inv_m,
                 uint8_t* dst, int dh, int dw, int s2d = 0,
                 size_t estride = 1) {
  const int dw2 = dw >> 1;
  for (int y = 0; y < dh; ++y) {
    float base_x = inv_m[1] * y + inv_m[2];
    float base_y = inv_m[4] * y + inv_m[5];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3 * estride;
    uint8_t* s2drow =
        dst +
        (static_cast<size_t>(y >> 1) * dw2 * 12 + (y & 1) * 6) * estride;
    for (int x = 0; x < dw; ++x) {
      float sx = inv_m[0] * x + base_x;
      float sy = inv_m[3] * x + base_y;
      float fx0 = std::floor(sx), fy0 = std::floor(sy);
      int x0 = static_cast<int>(fx0), y0 = static_cast<int>(fy0);
      float ax = sx - fx0, ay = sy - fy0;
      float acc[3] = {0.f, 0.f, 0.f};
      for (int dy = 0; dy < 2; ++dy) {
        int yy = y0 + dy;
        if (yy < 0 || yy >= sh) continue;
        float wy = dy ? ay : 1.f - ay;
        for (int dx = 0; dx < 2; ++dx) {
          int xx = x0 + dx;
          if (xx < 0 || xx >= sw) continue;
          float wxy = wy * (dx ? ax : 1.f - ax);
          const uint8_t* p = src + (static_cast<size_t>(yy) * sw + xx) * 3;
          acc[0] += wxy * p[0];
          acc[1] += wxy * p[1];
          acc[2] += wxy * p[2];
        }
      }
      uint8_t* out =
          s2d ? s2drow + (static_cast<size_t>(x >> 1) * 12 + (x & 1) * 3) *
                             estride
              : drow + 3 * estride * x;
      out[0] = static_cast<uint8_t>(acc[0] + 0.5f);
      out[estride] = static_cast<uint8_t>(acc[1] + 0.5f);
      out[2 * estride] = static_cast<uint8_t>(acc[2] + 0.5f);
    }
  }
}

int read_bytes(const char* path, const char* inner,
               std::vector<uint8_t>* bytes) {
  if (inner && inner[0]) {
    return zip_read(path, inner, bytes) == 0 ? 0 : -1;
  }
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  std::fseek(fp, 0, SEEK_END);
  long n = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  bytes->resize(n);
  if (std::fread(bytes->data(), 1, n, fp) != static_cast<size_t>(n)) {
    std::fclose(fp);
    return -1;
  }
  std::fclose(fp);
  return 0;
}

int load_one(const char* path, const char* inner, const float* inv_m,
             uint8_t* dst, int dh, int dw) {
  std::vector<uint8_t> bytes;
  if (read_bytes(path, inner, &bytes) != 0) return -1;
  std::vector<uint8_t> img;
  int w = 0, h = 0;
  if (decode_jpeg(bytes.data(), bytes.size(), &img, &w, &h) != 0) return -2;
  warp_affine(img.data(), h, w, inv_m, dst, dh, dw);
  return 0;
}

// Build the dst->src map for the reference crop (center/scale/rotation ->
// 200*scale px box to [dw, dh], transforms.py:get_affine_transform semantics)
// directly from the geometry, optionally composing a horizontal flip of the
// SOURCE image. Flip needs the raw width, which is only known post-decode —
// that is why this lives here and not in Python.
void geom_to_inv(const float* g /*cx, cy, box_w_px, rot_deg, flip*/,
                 int src_w, int dh, int dw, float* inv /*6*/) {
  const float cx = g[4] != 0.f ? (src_w - 1.f - g[0]) : g[0];
  const float cy = g[1];
  const float s = dw / g[2];
  const float rad = g[3] * 3.14159265358979323846f / 180.f;
  const float cs = std::cos(rad), sn = std::sin(rad);
  // forward: a = [[s*cs, s*sn], [-s*sn, s*cs]], t = out/2 - a*c
  const float a00 = s * cs, a01 = s * sn, a10 = -s * sn, a11 = s * cs;
  const float tx = dw * 0.5f - (a00 * cx + a01 * cy);
  const float ty = dh * 0.5f - (a10 * cx + a11 * cy);
  // inverse: B = a^-1, u = -B*t
  const float det = a00 * a11 - a01 * a10;
  const float b00 = a11 / det, b01 = -a01 / det;
  const float b10 = -a10 / det, b11 = a00 / det;
  float m[6] = {b00, b01, -(b00 * tx + b01 * ty),
                b10, b11, -(b10 * tx + b11 * ty)};
  if (g[4] != 0.f) {
    // sampled the flipped image: src_orig_x = (w-1) - src_flipped_x
    m[0] = -m[0]; m[1] = -m[1]; m[2] = (src_w - 1.f) - m[2];
  }
  std::memcpy(inv, m, sizeof(m));
}

int load_one_geom(const char* path, const char* inner, const float* geom,
                  uint8_t* dst, int* out_w, int dh, int dw, int s2d = 0,
                  size_t estride = 1) {
  std::vector<uint8_t> bytes;
  if (read_bytes(path, inner, &bytes) != 0) return -1;
  std::vector<uint8_t> img;
  int w = 0, h = 0, full_w = 0;
  // The crop samples the source every box_w/dw full-res pixels; when that
  // step is >= 2 a DCT-scaled decode (1/2, 1/4, 1/8) loses nothing the
  // bilinear tap would have kept, and cuts the dominant decode cost.
  const int ratio = static_cast<int>(geom[2] / dw);
  if (decode_jpeg(bytes.data(), bytes.size(), &img, &w, &h,
                  ratio >= 2 ? ratio : 1, &full_w) != 0) {
    return -2;
  }
  float inv[6];
  geom_to_inv(geom, full_w, dh, dw, inv);  // flip math in FULL-res coords
  if (w != full_w) {
    // compose full->scaled pixel-centre map: x_s = (x_f - (k-1)/2) / k
    // (k is the exact power-of-two denom; full_w/w alone rounds up on odd
    // widths, e.g. 1001/501)
    const float k = std::round(static_cast<float>(full_w) / w);
    const float off = (k - 1.f) * 0.5f;
    for (int r = 0; r < 2; ++r) {
      inv[3 * r + 0] /= k;
      inv[3 * r + 1] /= k;
      inv[3 * r + 2] = (inv[3 * r + 2] - off) / k;
    }
  }
  warp_affine(img.data(), h, w, inv, dst, dh, dw, s2d, estride);
  *out_w = full_w;
  return 0;
}

}  // namespace

extern "C" {

// Decode one JPEG file/zip member and warp it into dst [dh, dw, 3] BGR.
// inv_m: 6 floats, the dst->src affine. Returns 0 on success.
int ptpu_load_warp(const char* path, const char* inner, const float* inv_m,
                   uint8_t* dst, int dh, int dw) {
  return load_one(path, inner, inv_m, dst, dh, dw);
}

// Batched threaded variant: n images into dst [n, dh, dw, 3].
// paths/inners: arrays of C strings ('' inner = plain file);
// inv_ms: [n, 6]. Returns number of failures.
int ptpu_load_warp_batch(int n, const char** paths, const char** inners,
                         const float* inv_ms, uint8_t* dst, int dh, int dw,
                         int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> fails(n_threads, 0);
  const size_t stride = static_cast<size_t>(dh) * dw * 3;
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      if (load_one(paths[i], inners[i], inv_ms + 6 * i, dst + stride * i,
                   dh, dw) != 0) {
        fails[tid]++;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

// Geometry-driven threaded batch: the crop matrix (and optional source
// flip) is built natively per record AFTER decode, so flipped training
// samples stay on this path. geom: [n, 5] = (cx, cy, box_w_px, rot_deg,
// flip). out_widths[i] receives the raw image width (for host-side joint
// flipping), or -1 on failure. s2d != 0 writes each record space-to-depth
// packed ([dh/2, dw/2, 12], same byte count — see warp_affine). hwcn != 0
// (requires s2d) interleaves the n records batch-minor: dst viewed as
// [dh/2, dw/2, 12, n] — record i's bytes land at flat_index * n + i, the
// (H, W, C, N) serving contract whose physical order IS the stem conv's
// preferred N-minor layout (kills the device-side input retile). Returns
// the failure count.
int ptpu_load_warp_batch_geom(int n, const char** paths, const char** inners,
                              const float* geom, uint8_t* dst,
                              int* out_widths, int dh, int dw,
                              int n_threads, int s2d, int hwcn) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> fails(n_threads, 0);
  const size_t stride =
      hwcn ? 1 : static_cast<size_t>(dh) * dw * 3;
  const size_t estride = hwcn ? static_cast<size_t>(n) : 1;
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      int w = -1;
      if (load_one_geom(paths[i], inners[i], geom + 5 * i, dst + stride * i,
                        &w, dh, dw, s2d, estride) != 0) {
        out_widths[i] = -1;
        fails[tid]++;
      } else {
        out_widths[i] = w;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

// Raw zip member read (ptpu's zipreader.imread backend): copies up to cap
// bytes into out; returns actual size or <0 on error.
long ptpu_zip_read(const char* zip_path, const char* inner, uint8_t* out,
                   long cap) {
  std::vector<uint8_t> bytes;
  if (zip_read(zip_path, inner, &bytes) != 0) return -1;
  if (static_cast<long>(bytes.size()) > cap) return -static_cast<long>(bytes.size());
  std::memcpy(out, bytes.data(), bytes.size());
  return static_cast<long>(bytes.size());
}

}  // extern "C"
