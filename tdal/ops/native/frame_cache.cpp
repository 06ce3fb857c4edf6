// Columnar per-frame point cache: the native data-loader core.
//
// The pipeline's host IO reads per-frame Python pickles (points_xyz +
// points_feature) hundreds of thousands of times per epoch; unpickling builds
// Python objects and copies through np arrays. This cache stores each frame's
// point matrix as one flat little-endian float32 blob with a 16-byte header:
//
//   u32 magic 'TDC1' | u32 n_rows | u32 n_cols | u32 reserved | f32 data[n*d]
//
// so a frame loads with a single open+read into a preallocated numpy buffer
// (ctypes bindings in tdal/data/frame_cache.py; pure-python fallback exists).
//
// Capability parity: the role the torch DataLoader's C++ worker pool +
// pin-memory path plays in the reference training stack (reference
// det3d/datasets/loader/build_loader.py).

#include <cstdint>
#include <cstdio>
#include <cstring>

static const uint32_t MAGIC = 0x31434454u;  // "TDC1" little-endian

extern "C" {

// Returns 0 on success, negative on error.
int tdc_write(const char* path, const float* data, uint32_t n, uint32_t d) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    uint32_t header[4] = {MAGIC, n, d, 0};
    size_t ok = fwrite(header, sizeof(uint32_t), 4, f);
    ok += fwrite(data, sizeof(float), (size_t)n * d, f);
    fclose(f);
    return ok == 4 + (size_t)n * d ? 0 : -2;
}

// Reads the header; returns 0 and fills (n, d) on success.
int tdc_peek(const char* path, uint32_t* n, uint32_t* d) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint32_t header[4];
    size_t ok = fread(header, sizeof(uint32_t), 4, f);
    fclose(f);
    if (ok != 4 || header[0] != MAGIC) return -2;
    *n = header[1];
    *d = header[2];
    return 0;
}

// Reads the full blob into out (caller allocates n*d floats).
int tdc_read(const char* path, float* out, uint32_t n, uint32_t d) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, 16, SEEK_SET) != 0) {
        fclose(f);
        return -2;
    }
    size_t want = (size_t)n * d;
    size_t got = fread(out, sizeof(float), want, f);
    fclose(f);
    return got == want ? 0 : -3;
}

}  // extern "C"
