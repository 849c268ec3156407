// Native TSV writers for the result matrices.
//
// The reference writes its matrices cell-by-cell with fprintf("%.10lg")
// (/root/reference/src/overlap.cc:944-1039); a Python per-cell loop is
// ~75x slower at scale (existence mode emits N1 x R2 cells). These
// writers take the fully post-processed float64 value matrix (MH /
// Jaccard transforms are vectorised in numpy) plus pre-encoded label
// strings and stream the exact same bytes through a large buffer onto
// the caller's file descriptor. %.10lg in C here == %.10lg in the
// reference by construction.

#include <cstdio>
#include <cstring>
#include <cstdint>
#include <cstdlib>
#include <unistd.h>

namespace {

struct OutBuf {
    int fd;
    size_t len = 0;
    bool failed = false;
    static const size_t CAP = 1 << 20;
    char buf[CAP];

    explicit OutBuf(int fd_) : fd(fd_) {}

    bool flush() {
        size_t off = 0;
        while (off < len) {
            ssize_t w = ::write(fd, buf + off, len - off);
            if (w < 0) { failed = true; return false; }
            off += (size_t)w;
        }
        len = 0;
        return true;
    }

    bool put(const char* s, size_t n) {
        if (failed) return false;
        while (n) {
            if (len == CAP && !flush()) return false;
            size_t take = n < CAP - len ? n : CAP - len;
            memcpy(buf + len, s, take);
            len += take;
            s += take;
            n -= take;
        }
        return true;
    }

    bool put_str(const char* s) { return put(s, strlen(s)); }

    bool put_val(double v) {
        char tmp[64];
        int n = snprintf(tmp, sizeof tmp, "%.10lg", v);
        return put(tmp, (size_t)n);
    }
};

}  // namespace

extern "C" {

// Matrix layout writer (overlap.cc:991-1039): optional header line,
// then per row: row_label \t cell \t cell ... \n.
// values is row-major [nrow x ncol], already reordered for output.
// Returns 0 on success, -1 on write error.
int write_matrix_tsv(int fd, const double* values, int64_t nrow,
                     int64_t ncol, const char* const* row_labels,
                     const char* header) {
    OutBuf out(fd);
    if (header) {
        if (!out.put_str(header)) return -1;
    }
    for (int64_t i = 0; i < nrow; i++) {
        if (!out.put_str(row_labels[i])) return -1;
        const double* row = values + i * ncol;
        for (int64_t j = 0; j < ncol; j++) {
            if (!out.put("\t", 1)) return -1;
            if (!out.put_val(row[j])) return -1;
        }
        if (!out.put("\n", 1)) return -1;
    }
    return out.flush() ? 0 : -1;
}

// Alternative 3-column layout (overlap.cc:948-989): header line, then
// per (row, col): row_label \t col_label \t value \n.
int write_threecol_tsv(int fd, const double* values, int64_t nrow,
                       int64_t ncol, const char* const* row_labels,
                       const char* const* col_labels,
                       const char* header) {
    OutBuf out(fd);
    if (header) {
        if (!out.put_str(header)) return -1;
    }
    for (int64_t i = 0; i < nrow; i++) {
        const double* row = values + i * ncol;
        for (int64_t j = 0; j < ncol; j++) {
            if (!out.put_str(row_labels[i])) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_str(col_labels[j])) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_val(row[j])) return -1;
            if (!out.put("\n", 1)) return -1;
        }
    }
    return out.flush() ? 0 : -1;
}

}  // extern "C"
