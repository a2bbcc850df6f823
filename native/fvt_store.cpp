// fvt_store: native feature-store row gather.
//
// The training hot path reads windows of rows from per-trial .npy arrays
// (the disk contract of /root/reference/base/dataset.py:603-619).  The
// numpy route (np.load(mmap)[indices]) pays python indexing + a temporary
// per window; this library does the gather with mmap + memcpy and
// multi-threaded copies for large windows, called from Python via ctypes
// (the call releases the GIL, so the loader's thread pool overlaps).
//
// Build: make -C native   (produces libfvt_store.so)

#include <cstdint>
#include <cstring>
#include <cerrno>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

struct MappedFile {
    void* data = nullptr;
    size_t size = 0;
    bool ok = false;
};

MappedFile map_file(const char* path) {
    MappedFile mf;
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return mf;
    struct stat st;
    if (::fstat(fd, &st) != 0) { ::close(fd); return mf; }
    mf.size = static_cast<size_t>(st.st_size);
    mf.data = ::mmap(nullptr, mf.size, PROT_READ, MAP_SHARED, fd, 0);
    ::close(fd);
    if (mf.data == MAP_FAILED) { mf.data = nullptr; return mf; }
    ::madvise(mf.data, mf.size, MADV_WILLNEED);
    mf.ok = true;
    return mf;
}

void copy_range(const uint8_t* base, int64_t header, int64_t row_bytes,
                const int64_t* idx, int64_t begin, int64_t end,
                uint8_t* out) {
    for (int64_t i = begin; i < end; ++i) {
        std::memcpy(out + i * row_bytes,
                    base + header + idx[i] * row_bytes,
                    static_cast<size_t>(row_bytes));
    }
}

}  // namespace

extern "C" {

// Gather n rows of row_bytes each from a .npy file (data starts at
// header_offset) into out.  Returns 0 on success, negative errno-style
// codes on failure (-3: an index would read past the mapped file — e.g.
// a truncated or header-inconsistent file; the Python caller falls back
// to numpy instead of faulting).  Thread-safe; spawns worker threads for
// large copies.
int fvt_gather_rows(const char* path, int64_t header_offset,
                    int64_t row_bytes, const int64_t* idx, int64_t n,
                    uint8_t* out, int num_threads) {
    if (header_offset < 0 || row_bytes <= 0 || n < 0) return -2;
    MappedFile mf = map_file(path);
    if (!mf.ok) return -1;

    const uint8_t* base = static_cast<const uint8_t*>(mf.data);
    const int64_t total = n * row_bytes;
    const int64_t data_bytes = static_cast<int64_t>(mf.size) - header_offset;
    if (row_bytes > data_bytes) {
        ::munmap(mf.data, mf.size);
        return -2;
    }
    const int64_t max_row = data_bytes / row_bytes;  // rows actually on disk
    for (int64_t i = 0; i < n; ++i) {
        if (idx[i] < 0 || idx[i] >= max_row) {
            ::munmap(mf.data, mf.size);
            return -3;
        }
    }

    int nt = num_threads;
    if (nt <= 1 || total < (1 << 20)) {
        copy_range(base, header_offset, row_bytes, idx, 0, n, out);
    } else {
        if (nt > 16) nt = 16;
        std::vector<std::thread> workers;
        int64_t chunk = (n + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            int64_t b = t * chunk;
            int64_t e = b + chunk < n ? b + chunk : n;
            if (b >= e) break;
            workers.emplace_back(copy_range, base, header_offset,
                                 row_bytes, idx, b, e, out);
        }
        for (auto& w : workers) w.join();
    }

    ::munmap(mf.data, mf.size);
    return 0;
}

// Contiguous slice [start, start+n) — the common eval whole-video read.
int fvt_read_slice(const char* path, int64_t header_offset,
                   int64_t row_bytes, int64_t start, int64_t n,
                   uint8_t* out) {
    if (header_offset < 0 || row_bytes <= 0 || start < 0 || n < 0) return -2;
    MappedFile mf = map_file(path);
    if (!mf.ok) return -1;
    if (header_offset + (start + n) * row_bytes >
            static_cast<int64_t>(mf.size)) {
        ::munmap(mf.data, mf.size);
        return -3;
    }
    const uint8_t* base = static_cast<const uint8_t*>(mf.data);
    std::memcpy(out, base + header_offset + start * row_bytes,
                static_cast<size_t>(n * row_bytes));
    ::munmap(mf.data, mf.size);
    return 0;
}

}  // extern "C"
