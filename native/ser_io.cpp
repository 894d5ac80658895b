// Native SER container I/O for the TPU pipeline.
//
// reference equivalent: video_reader.py:12-109 (header parse + buffered
// frame reads).  The Python fast path already memory-maps the file; this
// native layer adds what Python cannot express efficiently:
//   - posix madvise-driven sequential readahead on the scan payload,
//   - an explicit prefetch window that overlaps disk I/O with the
//     host->device transfer of the previous slab,
//   - a single-copy slab read into a caller-provided (pinnable) buffer.
//
// Exposed as a minimal C ABI consumed via ctypes (io/native.py); the
// framework silently falls back to the pure-Python mmap reader when the
// shared library is unavailable.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <new>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kHeaderSize = 178;

struct SerFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  int64_t file_size = 0;
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t pixel_depth = 0;
  uint32_t frame_count = 0;   // clamped to payload
  int64_t frame_bytes = 0;
};

uint32_t read_u32le(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

}  // namespace

extern "C" {

// Error codes: 0 ok, -1 open/stat, -2 short header, -3 bad header, -4 mmap.
int ser_open(const char* path, void** handle_out, uint32_t* width,
             uint32_t* height, uint32_t* pixel_depth, uint32_t* frame_count) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  if (st.st_size < kHeaderSize) {
    close(fd);
    return -2;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return -4;
  }
  const uint8_t* bytes = static_cast<const uint8_t*>(map);
  SerFile* f = new SerFile;
  f->fd = fd;
  f->map = bytes;
  f->file_size = st.st_size;
  f->width = read_u32le(bytes + 26);
  f->height = read_u32le(bytes + 30);
  f->pixel_depth = read_u32le(bytes + 34);
  f->frame_count = read_u32le(bytes + 38);
  if (f->width == 0 || f->height == 0 ||
      (f->pixel_depth != 8 && f->pixel_depth != 16)) {
    munmap(map, st.st_size);
    close(fd);
    delete f;
    return -3;
  }
  f->frame_bytes =
      static_cast<int64_t>(f->width) * f->height * (f->pixel_depth / 8);
  int64_t payload = f->file_size - kHeaderSize;
  int64_t n = payload / f->frame_bytes;
  if (n < static_cast<int64_t>(f->frame_count)) f->frame_count = static_cast<uint32_t>(n);
  // NOTE: deliberately no MADV_SEQUENTIAL here — it marks the pages as
  // preferential reclaim victims, so under page-cache pressure every pass
  // over a multi-pass scan re-reads from (throttled) disk.  Readahead is
  // requested explicitly per window via ser_prefetch instead.
  *handle_out = f;
  *width = f->width;
  *height = f->height;
  *pixel_depth = f->pixel_depth;
  *frame_count = f->frame_count;
  return 0;
}

// Hint the kernel to start paging in [start, start+count) frames.
int ser_prefetch(void* handle, uint32_t start, uint32_t count) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || start >= f->frame_count) return -1;
  if (start + count > f->frame_count) count = f->frame_count - start;
  const uint8_t* p = f->map + kHeaderSize + static_cast<int64_t>(start) * f->frame_bytes;
  // round down to the page for madvise
  uintptr_t addr = reinterpret_cast<uintptr_t>(p);
  uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
  size_t len = static_cast<size_t>(f->frame_bytes) * count + (addr - page);
  madvise(reinterpret_cast<void*>(page), len, MADV_WILLNEED);
  return 0;
}

// Copy frames [start, start+count) into out (count*frame_bytes bytes).
int ser_read(void* handle, uint32_t start, uint32_t count, uint8_t* out) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || start + count > f->frame_count) return -1;
  const uint8_t* src =
      f->map + kHeaderSize + static_cast<int64_t>(start) * f->frame_bytes;
  memcpy(out, src, static_cast<size_t>(f->frame_bytes) * count);
  return 0;
}

}  // extern "C"

namespace {

// Tile-major fused sum+max sweep for one frame group [g0, g1): for each
// 4096-pixel block, visit every frame in the group before moving on.  The
// block's uint32 accumulator (16 KB) + uint16 running max (8 KB) + the 8 KB
// frame slice all sit in L1, so the only sustained memory stream is the
// frame data itself — measured 8.5 GB/s vs 5.0 GB/s for the frame-major
// loop, whose 7.2 MB of L2/L3 accumulator traffic per 1.2 MB frame was the
// real bound (the DRAM read ceiling on this host is ~8-12 GB/s).
// T is the source pixel type (uint16_t or uint8_t widened on load).
template <typename T>
void sweep_tile_major(const uint8_t* base, int64_t frame_bytes, uint32_t g0,
                      uint32_t g1, int64_t px, uint32_t* __restrict acc32,
                      uint16_t* __restrict max_out) {
  // 16384-px blocks (96 KB of acc+max+slice, L2-resident) measured ~5-8%
  // faster than the 4096-px L1-sized blocks on this host — fewer frame-loop
  // restarts per block outweigh the L1->L2 working-set spill (docs/PERF.md)
  constexpr int64_t kBlock = 16384;
  for (int64_t b = 0; b < px; b += kBlock) {
    const int64_t n = (b + kBlock < px) ? kBlock : px - b;
    uint32_t* __restrict a = acc32 + b;
    uint16_t* __restrict m = max_out + b;
    for (uint32_t fr = g0; fr < g1; ++fr) {
      const T* __restrict p = reinterpret_cast<const T*>(
                                  base + static_cast<int64_t>(fr) * frame_bytes) +
                              b;
      for (int64_t i = 0; i < n; ++i) {
        uint16_t v = static_cast<uint16_t>(p[i]);
        a[i] += v;
        m[i] = v > m[i] ? v : m[i];
      }
    }
  }
}

}  // namespace

extern "C" {

// Fused single-pass sum + max + optional band extraction over all frames
// (pass A of the pipeline, reference: solex_util.py:174-188).  NumPy needs
// two reduction passes per chunk (sum, then max) — 2x the host memory
// traffic of this loop, which the autovectoriser turns into one
// widening-add + max sweep.  Accumulates into cache-resident uint32 tiles,
// folding to the uint64 output before overflow; prefetches the next frame
// window so cold reads overlap compute.  Without band extraction the sweep
// runs tile-major per prefetch group (see sweep_tile_major above, ~1.65x);
// with a band copy it stays frame-major so each frame's band rows are
// copied while the frame is cache-hot.
// sum_out: width*height uint64 (raw layout), max_out: width*height uint16
// (8-bit inputs are widened, NOT shifted — scaling is the caller's job).
//
// Band extraction: when band_out != nullptr, the raw-coordinate rectangle
// rows [r0, r1) x cols [c0, c1) of every frame is copied (while the frame
// is hot in cache) into band_out, laid out (frames, r1-r0, c1-c0) in the
// file's pixel type.  This lets pass B (the recon's spectral-column
// gathers, io/hostreduce.py) read from a compact contiguous buffer instead
// of re-sweeping the whole multi-GB scan — the second pass the two-pass
// reference design pays (Solex_recon.py:61-73) disappears.
int ser_mean_max_band(void* handle, uint64_t* sum_out, uint16_t* max_out,
                      uint32_t r0, uint32_t r1, uint32_t c0, uint32_t c1,
                      uint8_t* band_out) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f) return -1;
  if (band_out && (r0 >= r1 || c0 >= c1 || r1 > f->height || c1 > f->width))
    return -3;
  const int64_t px = static_cast<int64_t>(f->width) * f->height;
  uint32_t* acc32 = new (std::nothrow) uint32_t[px]();
  if (!acc32) return -2;
  const int64_t elem = f->pixel_depth / 8;
  const int64_t band_row_bytes = static_cast<int64_t>(c1 - c0) * elem;
  const int64_t band_frame_bytes = band_row_bytes * (r1 - r0);
  for (int64_t i = 0; i < px; ++i) {
    sum_out[i] = 0;
    max_out[i] = 0;
  }
  const uint8_t* base = f->map + kHeaderSize;
  // uint32 accumulator overflow bound: 65535 * 65537 > 2^32
  const uint32_t fold_every = (f->pixel_depth == 16) ? 65000u : 16000000u;
  const uint32_t prefetch_win = 256;
  uint32_t since_fold = 0;
  if (!band_out) {
    // tile-major sweep per prefetch group (no per-frame band copy to keep
    // cache-hot, so the block-major order is free to minimise acc traffic)
    for (uint32_t g0 = 0; g0 < f->frame_count; g0 += prefetch_win) {
      const uint32_t g1 = (g0 + prefetch_win < f->frame_count)
                              ? g0 + prefetch_win
                              : f->frame_count;
      if (g1 < f->frame_count) {
        const uint8_t* p = base + static_cast<int64_t>(g1) * f->frame_bytes;
        uintptr_t addr = reinterpret_cast<uintptr_t>(p);
        uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
        uint32_t nxt = (g1 + prefetch_win < f->frame_count)
                           ? prefetch_win
                           : f->frame_count - g1;
        madvise(reinterpret_cast<void*>(page),
                static_cast<size_t>(f->frame_bytes) * nxt + (addr - page),
                MADV_WILLNEED);
      }
      if (since_fold + (g1 - g0) > fold_every) {
        for (int64_t i = 0; i < px; ++i) {
          sum_out[i] += acc32[i];
          acc32[i] = 0;
        }
        since_fold = 0;
      }
      if (f->pixel_depth == 16) {
        sweep_tile_major<uint16_t>(base, f->frame_bytes, g0, g1, px, acc32,
                                   max_out);
      } else {
        sweep_tile_major<uint8_t>(base, f->frame_bytes, g0, g1, px, acc32,
                                  max_out);
      }
      since_fold += g1 - g0;
    }
    for (int64_t i = 0; i < px; ++i) sum_out[i] += acc32[i];
    delete[] acc32;
    return 0;
  }
  for (uint32_t fr = 0; fr < f->frame_count; ++fr) {
    if (fr % prefetch_win == 0 && fr + prefetch_win < f->frame_count) {
      const uint8_t* p =
          base + static_cast<int64_t>(fr + prefetch_win) * f->frame_bytes;
      uintptr_t addr = reinterpret_cast<uintptr_t>(p);
      uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
      madvise(reinterpret_cast<void*>(page),
              static_cast<size_t>(f->frame_bytes) * prefetch_win +
                  (addr - page),
              MADV_WILLNEED);
    }
    const uint8_t* fp = base + static_cast<int64_t>(fr) * f->frame_bytes;
    if (f->pixel_depth == 16) {
      const uint16_t* p = reinterpret_cast<const uint16_t*>(fp);
      for (int64_t i = 0; i < px; ++i) {
        uint16_t v = p[i];
        acc32[i] += v;
        if (v > max_out[i]) max_out[i] = v;
      }
    } else {
      for (int64_t i = 0; i < px; ++i) {
        uint16_t v = fp[i];
        acc32[i] += v;
        if (v > max_out[i]) max_out[i] = v;
      }
    }
    if (band_out) {
      uint8_t* dst = band_out + static_cast<int64_t>(fr) * band_frame_bytes;
      if (c0 == 0 && c1 == f->width) {
        // full-width row range (wide-stored scans): one contiguous copy
        memcpy(dst, fp + static_cast<int64_t>(r0) * f->width * elem,
               static_cast<size_t>(band_frame_bytes));
      } else {
        for (uint32_t r = r0; r < r1; ++r) {
          memcpy(dst + static_cast<int64_t>(r - r0) * band_row_bytes,
                 fp + (static_cast<int64_t>(r) * f->width + c0) * elem,
                 static_cast<size_t>(band_row_bytes));
        }
      }
    }
    if (++since_fold == fold_every) {
      for (int64_t i = 0; i < px; ++i) {
        sum_out[i] += acc32[i];
        acc32[i] = 0;
      }
      since_fold = 0;
    }
  }
  if (since_fold) {
    for (int64_t i = 0; i < px; ++i) sum_out[i] += acc32[i];
  }
  delete[] acc32;
  return 0;
}

// Back-compat entry: fused sum + max only, no band extraction.
int ser_mean_max(void* handle, uint64_t* sum_out, uint16_t* max_out) {
  return ser_mean_max_band(handle, sum_out, max_out, 0, 0, 0, 0, nullptr);
}

// Subsampled full-frame sum + max: every `step`-th frame only.  The cheap
// leg of the two-step pass A (io/hostreduce.py:fast_passa): ~F/step frames
// locate the spectral band and the sun's vertical extent, then
// ser_band_stats touches ONLY that band at full frame resolution.
// Returns the number of frames accumulated (the mean divisor), or <0 on
// error.  sum_out/max_out are width*height, raw layout.
int ser_sample_stats(void* handle, uint32_t step, uint64_t* sum_out,
                     uint16_t* max_out) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || step == 0) return -1;
  const int64_t px = static_cast<int64_t>(f->width) * f->height;
  for (int64_t i = 0; i < px; ++i) {
    sum_out[i] = 0;
    max_out[i] = 0;
  }
  const uint8_t* base = f->map + kHeaderSize;
  int n = 0;
  for (uint32_t fr = 0; fr < f->frame_count; fr += step, ++n) {
    const uint8_t* fp = base + static_cast<int64_t>(fr) * f->frame_bytes;
    if (f->pixel_depth == 16) {
      const uint16_t* p = reinterpret_cast<const uint16_t*>(fp);
      for (int64_t i = 0; i < px; ++i) {
        uint16_t v = p[i];
        sum_out[i] += v;
        if (v > max_out[i]) max_out[i] = v;
      }
    } else {
      for (int64_t i = 0; i < px; ++i) {
        uint16_t v = fp[i];
        sum_out[i] += v;
        if (v > max_out[i]) max_out[i] = v;
      }
    }
  }
  return n;
}

// Full-frame-count sum + max restricted to the raw-coordinate rectangle
// rows [r0, r1) x cols [c0, c1): the expensive leg of the two-step pass A.
// Reads ONLY the band bytes of every frame (for wide-stored scans the band
// is a contiguous slice of each frame), so a 2.4 GB scan whose recon
// gathers from a ~60-column spectral band costs ~1/5 of a full sweep.
// sum_out/max_out are (r1-r0)*(c1-c0), band-local layout.
int ser_band_stats(void* handle, uint32_t r0, uint32_t r1, uint32_t c0,
                   uint32_t c1, uint64_t* sum_out, uint16_t* max_out) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || r0 >= r1 || c0 >= c1 || r1 > f->height || c1 > f->width)
    return -1;
  const int64_t bw = c1 - c0;
  const int64_t bh = r1 - r0;
  const int64_t bpx = bw * bh;
  uint32_t* acc32 = new (std::nothrow) uint32_t[bpx]();
  if (!acc32) return -2;
  for (int64_t i = 0; i < bpx; ++i) {
    sum_out[i] = 0;
    max_out[i] = 0;
  }
  const uint8_t* base = f->map + kHeaderSize;
  const int64_t elem = f->pixel_depth / 8;
  const uint32_t fold_every = (f->pixel_depth == 16) ? 65000u : 16000000u;
  const uint32_t prefetch_win = 256;
  uint32_t since_fold = 0;
  const bool full_width = (c0 == 0 && c1 == f->width);
  for (uint32_t fr = 0; fr < f->frame_count; ++fr) {
    if (fr % prefetch_win == 0 && fr + prefetch_win < f->frame_count) {
      // hint the next window's BAND slices (not whole frames): on a cold
      // cache the kernel reads in page granularity anyway, and the band
      // slice of a wide-stored scan is one contiguous run per frame
      for (uint32_t g = fr; g < fr + prefetch_win; ++g) {
        const uint8_t* p = base + static_cast<int64_t>(g) * f->frame_bytes +
                           (static_cast<int64_t>(r0) * f->width + c0) * elem;
        uintptr_t addr = reinterpret_cast<uintptr_t>(p);
        uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
        // one run from the band's first to last byte within this frame
        size_t len = static_cast<size_t>((bh - 1) * f->width + bw) * elem;
        madvise(reinterpret_cast<void*>(page), len + (addr - page),
                MADV_WILLNEED);
      }
    }
    const uint8_t* fp = base + static_cast<int64_t>(fr) * f->frame_bytes;
    if (f->pixel_depth == 16) {
      const uint16_t* frame = reinterpret_cast<const uint16_t*>(fp);
      if (full_width) {
        const uint16_t* p = frame + static_cast<int64_t>(r0) * f->width;
        for (int64_t i = 0; i < bpx; ++i) {
          uint16_t v = p[i];
          acc32[i] += v;
          if (v > max_out[i]) max_out[i] = v;
        }
      } else {
        for (int64_t r = 0; r < bh; ++r) {
          const uint16_t* p = frame + (r0 + r) * f->width + c0;
          uint32_t* a = acc32 + r * bw;
          uint16_t* m = max_out + r * bw;
          for (int64_t i = 0; i < bw; ++i) {
            uint16_t v = p[i];
            a[i] += v;
            if (v > m[i]) m[i] = v;
          }
        }
      }
    } else {
      if (full_width) {
        const uint8_t* p = fp + static_cast<int64_t>(r0) * f->width;
        for (int64_t i = 0; i < bpx; ++i) {
          uint16_t v = p[i];
          acc32[i] += v;
          if (v > max_out[i]) max_out[i] = v;
        }
      } else {
        for (int64_t r = 0; r < bh; ++r) {
          const uint8_t* p = fp + (r0 + r) * f->width + c0;
          uint32_t* a = acc32 + r * bw;
          uint16_t* m = max_out + r * bw;
          for (int64_t i = 0; i < bw; ++i) {
            uint16_t v = p[i];
            a[i] += v;
            if (v > m[i]) m[i] = v;
          }
        }
      }
    }
    if (++since_fold == fold_every) {
      for (int64_t i = 0; i < bpx; ++i) {
        sum_out[i] += acc32[i];
        acc32[i] = 0;
      }
      since_fold = 0;
    }
  }
  if (since_fold) {
    for (int64_t i = 0; i < bpx; ++i) sum_out[i] += acc32[i];
  }
  delete[] acc32;
  return 0;
}

// Pass B: multi-shift disk reconstruction gathers, float64, bit-exact to
// the reference's hot loop (solex_util.py:113-134) and to the numpy path
// in io/hostreduce.py: per output pixel
//   v = src[flat_l[si][y]] * w_l[y] + src[flat_l[si][y]+right_off] * w_r[y]
// (two IEEE multiplies then one add, matching numpy's multiply/multiply/add
// sequence), optionally *256 for 8-bit sources (exact power of two), then
// a truncating uint16 store (C cast == numpy's C-style float64->uint16
// assignment for in-range values; v <= 65535 by construction since
// w_l + w_r == 1).
//
// Layout: src points at `frame_count` frames of `frame_stride` BYTES each
// (the mmap payload, or a compact band slab); flat_l is (S, ih) int64
// ELEMENT indices into a frame viewed flat (rotation pre-encoded by the
// caller); out points at the (S, ih, F_total) uint16 disk cube at column
// `0` of THIS call's frame range — out[si][y][fr] lives at
// out[(si*ih + y) * out_stride + fr], so chunked calls pass
// out_base + start and keep out_stride = F_total.
//
// This replaces numpy's per-shift np.take pair (4 temporaries, 2 gather
// passes + 3 arithmetic passes over chunk*ih doubles) with one fused
// sweep: ~2x less host memory traffic, the throttled resource here.
int ser_recon_f64(const uint8_t* src, int64_t frame_stride,
                  uint32_t frame_count, int is_u16, int upscale,
                  const int64_t* flat_l, int64_t right_off,
                  const double* w_l, const double* w_r, uint32_t S,
                  uint32_t ih, uint16_t* out, int64_t out_stride,
                  int do_prefetch) {
  if (!src || !flat_l || !w_l || !w_r || !out) return -1;
  const uint32_t prefetch_win = 256;
  for (uint32_t fr = 0; fr < frame_count; ++fr) {
    if (do_prefetch && fr % prefetch_win == 0 &&
        fr + prefetch_win < frame_count) {
      const uint8_t* p = src + static_cast<int64_t>(fr + prefetch_win) *
                                   frame_stride;
      uintptr_t addr = reinterpret_cast<uintptr_t>(p);
      uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
      madvise(reinterpret_cast<void*>(page),
              static_cast<size_t>(frame_stride) * prefetch_win +
                  (addr - page),
              MADV_WILLNEED);
    }
    const uint8_t* fp = src + static_cast<int64_t>(fr) * frame_stride;
    for (uint32_t si = 0; si < S; ++si) {
      const int64_t* fl = flat_l + static_cast<int64_t>(si) * ih;
      uint16_t* o = out + static_cast<int64_t>(si) * ih * out_stride + fr;
      if (is_u16) {
        const uint16_t* p = reinterpret_cast<const uint16_t*>(fp);
        for (uint32_t y = 0; y < ih; ++y) {
          double v = static_cast<double>(p[fl[y]]) * w_l[y] +
                     static_cast<double>(p[fl[y] + right_off]) * w_r[y];
          o[static_cast<int64_t>(y) * out_stride] = static_cast<uint16_t>(v);
        }
      } else {
        for (uint32_t y = 0; y < ih; ++y) {
          double v = static_cast<double>(fp[fl[y]]) * w_l[y] +
                     static_cast<double>(fp[fl[y] + right_off]) * w_r[y];
          if (upscale) v *= 256.0;
          o[static_cast<int64_t>(y) * out_stride] = static_cast<uint16_t>(v);
        }
      }
    }
  }
  return 0;
}

// Projective bilinear warp, float32, numpy-twin-exact.
//
// Mirrors ops/warp.py:warp_projective_host + warp_to_u16_host STATEMENT FOR
// STATEMENT in float32 (same left-associated coordinate sums, the same
// four masked cval taps weighted in the same multiply order, the same
// *65536 clip-truncate u16 store), so the output is BIT-identical to the
// numpy twin — which itself tracks the device warp to <=1 LSB.  The numpy
// twin pays ~15 full-image float32 temporaries (masks, clipped index
// planes, four gathered tap planes); this loop keeps everything in
// registers — 430 -> ~45 ms on the 2074x2100 bench disk.
//
// fp-contract off: a fused multiply-add rounds differently from numpy's
// separate multiply and add, which would break the bit-exactness contract.
}  // extern "C"

#pragma GCC push_options
#pragma GCC optimize("fp-contract=off")

// src_f32: (h, w_in) C-contiguous; src_u16 variant converts v/65536.0f
// inline (exact power-of-two scale, identical to numpy's astype/divide).
// mat3: 9 doubles, row-major.  out: (out_h, out_w) uint16.
static void warp_body(const float* __restrict srcf,
                      const uint16_t* __restrict srcu, int64_t h,
                      int64_t w_in, const double* mat3, int64_t out_h,
                      int64_t out_w, float cval, uint16_t* __restrict out) {
  const float m00 = static_cast<float>(mat3[0]);
  const float m01 = static_cast<float>(mat3[1]);
  const float m02 = static_cast<float>(mat3[2]);
  const float m10 = static_cast<float>(mat3[3]);
  const float m11 = static_cast<float>(mat3[4]);
  const float m12 = static_cast<float>(mat3[5]);
  const float m20 = static_cast<float>(mat3[6]);
  const float m21 = static_cast<float>(mat3[7]);
  const float m22 = static_cast<float>(mat3[8]);
  for (int64_t y = 0; y < out_h; ++y) {
    const float gy = static_cast<float>(y);
    uint16_t* __restrict orow = out + y * out_w;
    for (int64_t x = 0; x < out_w; ++x) {
      const float gx = static_cast<float>(x);
      const float w = m20 * gx + m21 * gy + m22;
      const float sx = (m00 * gx + m01 * gy + m02) / w;
      const float sy = (m10 * gx + m11 * gy + m12) / w;
      const float x0 = floorf(sx);
      const float y0 = floorf(sy);
      const float dx = sx - x0;
      const float dy = sy - y0;
      const int64_t x0i = static_cast<int64_t>(static_cast<int32_t>(x0));
      const int64_t y0i = static_cast<int64_t>(static_cast<int32_t>(y0));
      float s[4];
      const int64_t ys[2] = {y0i, y0i + 1};
      const int64_t xs[2] = {x0i, x0i + 1};
      for (int ti = 0; ti < 4; ++ti) {
        const int64_t yi = ys[ti >> 1];
        const int64_t xi = xs[ti & 1];
        if (yi >= 0 && yi < h && xi >= 0 && xi < w_in) {
          const int64_t idx = yi * w_in + xi;
          s[ti] = srcf ? srcf[idx]
                       : static_cast<float>(srcu[idx]) / 65536.0f;
        } else {
          s[ti] = cval;
        }
      }
      const float ody = 1.0f - dy;
      const float odx = 1.0f - dx;
      const float t0 = s[0] * ody * odx;
      const float t1 = s[1] * ody * dx;
      const float t2 = s[2] * dy * odx;
      const float t3 = s[3] * dy * dx;
      const float acc = ((t0 + t1) + t2) + t3;
      float v = acc * 65536.0f;
      if (v < 0.0f) v = 0.0f;
      if (v > 65535.0f) v = 65535.0f;
      orow[x] = static_cast<uint16_t>(v);
    }
  }
}

// Batched variant: K uint16 sources warped with ONE shared matrix (the
// Doppler sweep circularises every shift with the same correction matrix,
// Solex_recon.py:120-123).  The per-pixel coordinate math (two divides,
// floors, int casts) depends only on (x, y), so it is hoisted into a
// per-row precompute reused across all K images; the per-tap float math
// is kept statement-for-statement identical to warp_body (same
// left-associated products), so each output plane is BIT-identical to K
// independent warp_u16_u16 calls (asserted by test_native warp-batch).
static void warp_body_batch_u16(const uint16_t* const* __restrict srcs,
                                int64_t k, int64_t h, int64_t w_in,
                                const double* mat3, int64_t out_h,
                                int64_t out_w, const float* cvals,
                                uint16_t* const* __restrict outs) {
  const float m00 = static_cast<float>(mat3[0]);
  const float m01 = static_cast<float>(mat3[1]);
  const float m02 = static_cast<float>(mat3[2]);
  const float m10 = static_cast<float>(mat3[3]);
  const float m11 = static_cast<float>(mat3[4]);
  const float m12 = static_cast<float>(mat3[5]);
  const float m20 = static_cast<float>(mat3[6]);
  const float m21 = static_cast<float>(mat3[7]);
  const float m22 = static_cast<float>(mat3[8]);
  int64_t* idx = new int64_t[out_w * 4];  // element index or -1 per tap
  float* fr = new float[out_w * 4];       // dy, ody, dx, odx per x
  for (int64_t y = 0; y < out_h; ++y) {
    const float gy = static_cast<float>(y);
    for (int64_t x = 0; x < out_w; ++x) {
      const float gx = static_cast<float>(x);
      const float w = m20 * gx + m21 * gy + m22;
      const float sx = (m00 * gx + m01 * gy + m02) / w;
      const float sy = (m10 * gx + m11 * gy + m12) / w;
      const float x0 = floorf(sx);
      const float y0 = floorf(sy);
      const int64_t x0i = static_cast<int64_t>(static_cast<int32_t>(x0));
      const int64_t y0i = static_cast<int64_t>(static_cast<int32_t>(y0));
      const int64_t ys[2] = {y0i, y0i + 1};
      const int64_t xs[2] = {x0i, x0i + 1};
      for (int ti = 0; ti < 4; ++ti) {
        const int64_t yi = ys[ti >> 1];
        const int64_t xi = xs[ti & 1];
        idx[x * 4 + ti] = (yi >= 0 && yi < h && xi >= 0 && xi < w_in)
                              ? yi * w_in + xi
                              : -1;
      }
      const float dy = sy - y0;
      const float dx = sx - x0;
      fr[x * 4 + 0] = dy;
      fr[x * 4 + 1] = 1.0f - dy;
      fr[x * 4 + 2] = dx;
      fr[x * 4 + 3] = 1.0f - dx;
    }
    for (int64_t ki = 0; ki < k; ++ki) {
      const uint16_t* __restrict src = srcs[ki];
      const float cval = cvals[ki];
      uint16_t* __restrict orow = outs[ki] + y * out_w;
      for (int64_t x = 0; x < out_w; ++x) {
        const int64_t* tap = idx + x * 4;
        float s[4];
        for (int ti = 0; ti < 4; ++ti) {
          s[ti] = tap[ti] >= 0
                      ? static_cast<float>(src[tap[ti]]) / 65536.0f
                      : cval;
        }
        const float dy = fr[x * 4 + 0];
        const float ody = fr[x * 4 + 1];
        const float dx = fr[x * 4 + 2];
        const float odx = fr[x * 4 + 3];
        const float t0 = s[0] * ody * odx;
        const float t1 = s[1] * ody * dx;
        const float t2 = s[2] * dy * odx;
        const float t3 = s[3] * dy * dx;
        const float acc = ((t0 + t1) + t2) + t3;
        float v = acc * 65536.0f;
        if (v < 0.0f) v = 0.0f;
        if (v > 65535.0f) v = 65535.0f;
        orow[x] = static_cast<uint16_t>(v);
      }
    }
  }
  delete[] idx;
  delete[] fr;
}

#pragma GCC pop_options

extern "C" {

// Batched numpy-twin-exact warp: K u16 sources, one shared matrix.
// srcs/outs are arrays of K pointers ((h, w_in) / (out_h, out_w) each,
// C-contiguous); cvals one [0,1)-scale fill value per source.
int warp_u16_u16_batch(const uint16_t* const* srcs, int64_t k, int64_t h,
                       int64_t w_in, const double* mat3, int64_t out_h,
                       int64_t out_w, const float* cvals,
                       uint16_t* const* outs) {
  if (!srcs || !mat3 || !outs || !cvals || k <= 0 || h <= 0 || w_in <= 0)
    return -1;
  warp_body_batch_u16(srcs, k, h, w_in, mat3, out_h, out_w, cvals, outs);
  return 0;
}

// numpy-twin-exact warp, float32 [0,1) source -> uint16 output.
int warp_f32_u16(const float* src, int64_t h, int64_t w_in,
                 const double* mat3, int64_t out_h, int64_t out_w,
                 float cval, uint16_t* out) {
  if (!src || !mat3 || !out || h <= 0 || w_in <= 0) return -1;
  warp_body(src, nullptr, h, w_in, mat3, out_h, out_w, cval, out);
  return 0;
}

// Same, uint16 source converted /65536 inline (one less image-sized pass).
int warp_u16_u16(const uint16_t* src, int64_t h, int64_t w_in,
                 const double* mat3, int64_t out_h, int64_t out_w,
                 float cval, uint16_t* out) {
  if (!src || !mat3 || !out || h <= 0 || w_in <= 0) return -1;
  warp_body(nullptr, src, h, w_in, mat3, out_h, out_w, cval, out);
  return 0;
}

}  // extern "C"

extern "C" {

// Zero-copy pointer to frame payload (valid until ser_close).
const uint8_t* ser_data(void* handle) {
  SerFile* f = static_cast<SerFile*>(handle);
  return f ? f->map + kHeaderSize : nullptr;
}

void ser_close(void* handle) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f) return;
  munmap(const_cast<uint8_t*>(f->map), f->file_size);
  close(f->fd);
  delete f;
}

}  // extern "C"
