// Native writer for cluster (-c) output rows.
//
// Emits clusters in the given order (size-descending, stable), members
// walked along the BFS chain:
//   cluster_no \t cluster_size \t repertoire_id \t sequence_id \t
//   duplicate_count \t v_call \t j_call \t sequence
// (/root/reference/src/cluster.cc:427-455). The Python loop in
// modes/cluster.py is the executable specification; this streams the
// same bytes at native speed for multi-million-row runs.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unistd.h>

namespace {

struct OutBuf3 {
    int fd;
    size_t len = 0;
    bool failed = false;
    static const size_t CAP = 1 << 20;
    char buf[CAP];

    explicit OutBuf3(int fd_) : fd(fd_) {}

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

    bool put_i64(int64_t v) {
        char tmp[24];
        int n = snprintf(tmp, sizeof tmp, "%lld", (long long)v);
        return put(tmp, (size_t)n);
    }
};

}  // namespace

extern "C" {

// order/sizes/seeds are per-cluster ([k]); nxt is the intrusive member
// chain ([n], -1 terminates). sid_* may all be null (no sequence_id
// column values -> empty strings).
int write_cluster_tsv(int fd, const int64_t* order, int64_t k,
                      const int64_t* sizes, const int64_t* seeds,
                      const int64_t* nxt, const int32_t* rep_no,
                      const int32_t* v_no, const int32_t* j_no,
                      const int64_t* counts,
                      const char* const* rep_names,
                      const char* const* v_names,
                      const char* const* j_names, const int8_t* seqs,
                      int64_t width, const int32_t* lengths,
                      const char* alphabet, const int64_t* sid_off,
                      const uint8_t* sid_blob, const uint8_t* has_sid) {
    OutBuf3 out(fd);
    char seqbuf[4096];
    for (int64_t c = 0; c < k; c++) {
        int64_t cl = order[c];
        int64_t size = sizes[cl];
        for (int64_t i = seeds[cl]; i >= 0; i = nxt[i]) {
            if (!out.put_i64(c + 1)) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_i64(size)) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_str(rep_names[rep_no[i]])) return -1;
            if (!out.put("\t", 1)) return -1;
            if (sid_blob && (!has_sid || has_sid[i])) {
                if (!out.put((const char*)sid_blob + sid_off[i],
                             (size_t)(sid_off[i + 1] - sid_off[i])))
                    return -1;
            }
            if (!out.put("\t", 1)) return -1;
            if (!out.put_i64(counts[i])) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_str(v_names[v_no[i]])) return -1;
            if (!out.put("\t", 1)) return -1;
            if (!out.put_str(j_names[j_no[i]])) return -1;
            if (!out.put("\t", 1)) return -1;
            int32_t l = lengths[i];
            if (l > (int32_t)sizeof seqbuf) return -1;
            const int8_t* row = seqs + i * width;
            for (int32_t p = 0; p < l; p++) seqbuf[p] = alphabet[row[p]];
            if (!out.put(seqbuf, (size_t)l)) return -1;
            if (!out.put("\n", 1)) return -1;
        }
    }
    return out.flush() ? 0 : -1;
}

}  // extern "C"
