// pmpu_io — native NIfTI-1 volume loader for the pmpu_tpu data layer.
//
// The reference's data layer is pure-Python nibabel, re-reading whole
// volumes per slice (reference utils/mri_dataset.py:124-127). The Python
// rewrite already loads once; this library makes the load-once startup path
// native: multithreaded NIfTI-1 parsing (.nii and .nii.gz via zlib),
// scl_slope/inter application, float32 conversion, and pad-to-cube directly
// into the caller's stacked (N,S,S,S) buffer — no GIL, one pass, no
// intermediate copies.
//
// C ABI (consumed via ctypes from pmpu_tpu/data/native.py):
//   pmpu_read_header(path, dims[8], &datatype, scl[2], &vox_offset) -> 0/err
//   pmpu_load_volume_f32(path, out, capacity) -> nvox or -err
//     (fills `out` with C-order (row-major) data, scl applied)
//   pmpu_load_dataset_f32(paths, n, cube, out, nthreads) -> 0/err
//     (each volume padded to cube^3 with zeros at the high end — reference
//      mri_dataset.py:85-98 semantics — written into out[n])

#include <zlib.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kHdrSize = 348;

#pragma pack(push, 1)
struct NiftiHeader {
  int32_t sizeof_hdr;        // 0
  char pad0[36];             // 4
  int16_t dim[8];            // 40
  char pad1[14];             // 56
  int16_t datatype;          // 70
  int16_t bitpix;            // 72
  char pad2[2];              // 74
  float pixdim[8];           // 76
  float vox_offset;          // 108
  float scl_slope;           // 112
  float scl_inter;           // 116
  char pad3[224];            // 120
  char magic[4];             // 344
};
#pragma pack(pop)

static_assert(sizeof(NiftiHeader) == kHdrSize, "header layout");

enum ErrorCode {
  kOk = 0,
  kErrOpen = 1,
  kErrHeader = 2,
  kErrMagic = 3,
  kErrDatatype = 4,
  kErrTruncated = 5,
  kErrCapacity = 6,
  kErrShape = 7,
};

int read_header(const char* path, NiftiHeader* hdr) {
  gzFile f = gzopen(path, "rb");  // reads plain files transparently too
  if (!f) return kErrOpen;
  int n = gzread(f, hdr, kHdrSize);
  gzclose(f);
  if (n != kHdrSize) return kErrHeader;
  if (hdr->sizeof_hdr != kHdrSize) return kErrHeader;  // (big-endian unsupported)
  // full 4-byte magic incl. the trailing NUL — same strictness as the
  // Python codec (a corrupt 348th byte must not be silently accepted).
  // "ni1" pair files are rejected too: their data lives in a sibling
  // .img with vox_offset=0, which this single-file loader cannot read
  // (and the vox_offset >= 348 floor below would reject them anyway).
  if (std::memcmp(hdr->magic, "n+1\0", 4) != 0)
    return kErrMagic;
  // vox_offset: NaN is UB when cast to an integer/seek offset; < header
  // size would re-read header bytes as voxel data. Spec minimum is 348.
  if (!std::isfinite(hdr->vox_offset) || hdr->vox_offset < kHdrSize)
    return kErrHeader;
  return kOk;
}

template <typename T>
void convert(const char* raw, float* out, int64_t n, float slope, float inter) {
  const T* src = reinterpret_cast<const T*>(raw);
  if (slope == 0.0f || (slope == 1.0f && inter == 0.0f)) {
    for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(src[i]);
  } else {
    for (int64_t i = 0; i < n; ++i)
      out[i] = static_cast<float>(src[i]) * slope + inter;
  }
}

int dtype_size(int16_t code) {
  switch (code) {
    case 2: case 256: return 1;          // uint8 / int8
    case 4: case 512: return 2;          // int16 / uint16
    case 8: case 768: case 16: return 4; // int32 / uint32 / float32
    case 64: case 1024: case 1280: return 8;  // float64 / int64 / uint64
    default: return 0;
  }
}

int convert_any(int16_t code, const char* raw, float* out, int64_t n, float sl, float in) {
  switch (code) {
    case 2:    convert<uint8_t>(raw, out, n, sl, in); return kOk;
    case 4:    convert<int16_t>(raw, out, n, sl, in); return kOk;
    case 8:    convert<int32_t>(raw, out, n, sl, in); return kOk;
    case 16:   convert<float>(raw, out, n, sl, in); return kOk;
    case 64:   convert<double>(raw, out, n, sl, in); return kOk;
    case 256:  convert<int8_t>(raw, out, n, sl, in); return kOk;
    case 512:  convert<uint16_t>(raw, out, n, sl, in); return kOk;
    case 768:  convert<uint32_t>(raw, out, n, sl, in); return kOk;
    case 1024: convert<int64_t>(raw, out, n, sl, in); return kOk;
    case 1280: convert<uint64_t>(raw, out, n, sl, in); return kOk;
    default:   return kErrDatatype;
  }
}

// Load one volume: returns voxel count (>=0) or -error. Fills `out` in
// C (row-major) order — NIfTI stores Fortran order, so we transpose on the
// fly during the pad-copy (single pass, cache-friendly inner dim).
int64_t load_volume_impl(const char* path, float* out, int64_t capacity,
                         int64_t* shape_out /*3, optional*/) {
  NiftiHeader hdr;
  int rc = read_header(path, &hdr);
  if (rc != kOk) return -rc;
  int nd = hdr.dim[0];
  if (nd < 3 || nd > 7) return -kErrShape;
  int64_t nx = hdr.dim[1], ny = hdr.dim[2], nz = hdr.dim[3];
  // Each dim must be individually positive: two negative int16 dims multiply
  // to a positive voxel count that passes the capacity check while the
  // transpose loops below never execute — a corrupt header would "load"
  // an uninitialized buffer. Reject before computing the product.
  if (nx < 1 || ny < 1 || nz < 1) return -kErrShape;
  // Trailing dims > 1 mean a 4D+ file; loading only the first 3D frame here
  // would silently diverge from the Python codec (which returns the full
  // array) — reject so callers fall back to the Python path.
  for (int d = 4; d <= nd; ++d)
    if (hdr.dim[d] > 1) return -kErrShape;
  int64_t n = nx * ny * nz;
  if (n <= 0 || n > capacity) return -kErrCapacity;
  int esz = dtype_size(hdr.datatype);
  if (!esz) return -kErrDatatype;

  gzFile f = gzopen(path, "rb");
  if (!f) return -kErrOpen;
  if (gzseek(f, static_cast<z_off_t>(hdr.vox_offset), SEEK_SET) < 0) {
    gzclose(f);
    return -kErrTruncated;
  }
  std::vector<char> raw(static_cast<size_t>(n) * esz);
  int64_t want = static_cast<int64_t>(raw.size());
  int64_t got = 0;
  while (got < want) {
    int chunk = static_cast<int>(std::min<int64_t>(want - got, 1 << 26));
    int r = gzread(f, raw.data() + got, chunk);
    if (r <= 0) break;
    got += r;
  }
  gzclose(f);
  if (got != want) return -kErrTruncated;

  // Fortran linear order: index = x + nx*(y + ny*z). Convert to f32 in
  // Fortran order first, then transpose to C order into `out`.
  // Non-finite scl fields mean "scaling unset" (nibabel get_fdata
  // semantics, mirrored by the Python codec): never multiply a NaN/inf
  // into the volume. convert() already treats slope==0 as unset.
  float slope = hdr.scl_slope, inter = hdr.scl_inter;
  if (!std::isfinite(slope) || !std::isfinite(inter)) {
    slope = 0.0f;
    inter = 0.0f;
  }
  std::vector<float> fbuf(static_cast<size_t>(n));
  rc = convert_any(hdr.datatype, raw.data(), fbuf.data(), n, slope, inter);
  if (rc != kOk) return -rc;
  for (int64_t x = 0; x < nx; ++x)
    for (int64_t y = 0; y < ny; ++y) {
      float* dst = out + (x * ny + y) * nz;
      const float* src = fbuf.data() + x + nx * y;  // stride nx*ny over z
      for (int64_t z = 0; z < nz; ++z) dst[z] = src[z * nx * ny];
    }
  if (shape_out) {
    shape_out[0] = nx;
    shape_out[1] = ny;
    shape_out[2] = nz;
  }
  return n;
}

}  // namespace

extern "C" {

int pmpu_read_header(const char* path, int64_t* dims /*8*/, int* datatype,
                     double* scl /*2*/, int64_t* vox_offset) {
  NiftiHeader hdr;
  int rc = read_header(path, &hdr);
  if (rc != kOk) return rc;
  for (int i = 0; i < 8; ++i) dims[i] = hdr.dim[i];
  *datatype = hdr.datatype;
  scl[0] = hdr.scl_slope;
  scl[1] = hdr.scl_inter;
  *vox_offset = static_cast<int64_t>(hdr.vox_offset);
  return kOk;
}

int64_t pmpu_load_volume_f32(const char* path, float* out, int64_t capacity,
                             int64_t* shape_out) {
  return load_volume_impl(path, out, capacity, shape_out);
}

// Parallel stacked load: n volumes, each padded with trailing zeros into a
// cube^3 slot of `out` (C order). Returns 0 or the first error code.
int pmpu_load_dataset_f32(const char** paths, int64_t n, int64_t cube,
                          float* out, int nthreads) {
  std::atomic<int> err{kOk};
  std::atomic<int64_t> next{0};
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads <= 0) nthreads = hw > 0 ? hw : 4;
  if (nthreads > n) nthreads = static_cast<int>(n);
  int64_t slot = cube * cube * cube;

  auto worker = [&]() {
    std::vector<float> tmp(static_cast<size_t>(slot));
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n || err.load() != kOk) return;
      int64_t shape[3];
      int64_t rc = load_volume_impl(paths[i], tmp.data(), slot, shape);
      if (rc < 0) {
        err.store(static_cast<int>(-rc));
        return;
      }
      if (shape[0] > cube || shape[1] > cube || shape[2] > cube) {
        err.store(kErrShape);
        return;
      }
      float* dst = out + i * slot;
      std::memset(dst, 0, static_cast<size_t>(slot) * sizeof(float));
      // tmp holds C-order (nx,ny,nz); scatter into the (cube,cube,cube) slot
      for (int64_t x = 0; x < shape[0]; ++x)
        for (int64_t y = 0; y < shape[1]; ++y)
          std::memcpy(dst + (x * cube + y) * cube,
                      tmp.data() + (x * shape[1] + y) * shape[2],
                      static_cast<size_t>(shape[2]) * sizeof(float));
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return err.load();
}

}  // extern "C"
