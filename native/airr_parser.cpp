// Native AIRR Rearrangement TSV parser.
//
// Semantics mirror the reference's streaming reader
// (/root/reference/src/db.cc:172-900) and the Python implementation in
// compairr_tpu/io/airr.py: header column discovery, per-line
// validation, residue encoding, per-file repertoire interning and
// session-wide V/J gene interning, -u/-e/-f/-g behaviours. The design
// is different from both: a single pass over a growing buffer with
// column-slice records, arena-packed outputs shaped for zero-copy
// adoption into numpy (fixed-width int8 residue matrix built by the
// Python wrapper from the packed arena).
//
// Exposed as a C ABI for ctypes. Errors are reported as (kind, lineno,
// character) tuples; the Python wrapper renders the exact reference
// message strings so formatting lives in one place.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Interner {
  std::unordered_map<std::string, int32_t> map;
  std::vector<std::string> names;

  int32_t intern(const char* s, size_t len) {
    std::string key(s, len);
    auto it = map.find(key);
    if (it != map.end()) return it->second;
    int32_t no = static_cast<int32_t>(names.size());
    names.push_back(key);
    map.emplace(std::move(key), no);
    return no;
  }
};

// error kinds understood by the Python wrapper
enum ErrKind : int32_t {
  ERR_NONE = 0,
  ERR_OPEN = 1,
  ERR_MISSING_COLUMNS = 2,
  ERR_ILLEGAL_CHAR = 3,
  ERR_ILLEGAL_CHAR_NONPRINT = 4,
  ERR_EMPTY_SEQ = 5,
  ERR_MISSING_SEQUENCE_ID = 6,
  ERR_BAD_DUP_COUNT = 7,
  ERR_MISSING_DUP_COUNT = 8,
  ERR_MISSING_V = 9,
  ERR_MISSING_J = 10,
  ERR_MISSING_SEQ_VALUE = 11,
  ERR_READ = 12,
};

struct Session {
  Interner v_genes;
  Interner j_genes;
};

struct StringArena {
  std::vector<int64_t> offsets{0};
  std::string blob;

  void push(const char* s, size_t len) {
    blob.append(s, len);
    offsets.push_back(static_cast<int64_t>(blob.size()));
  }
  void push_missing() { offsets.push_back(offsets.back()); }
};

struct Result {
  int32_t status = ERR_NONE;
  int64_t err_lineno = 0;
  int32_t err_char = 0;
  std::string err_detail;  // e.g. the offending duplicate_count token
  uint8_t missing_cols = 0;  // bitmask, see wrapper

  int64_t n = 0;
  std::string residues;  // packed encoded residues
  std::vector<uint64_t> row_hash;  // FNV-1a over encoded residues
  std::vector<int32_t> lengths;
  std::vector<int64_t> counts;
  std::vector<int32_t> rep_no, v_no, j_no;
  std::vector<uint8_t> has_sequence_id;
  StringArena sequence_ids;
  StringArena keeps;
  Interner repertoires;
  std::vector<uint8_t> keep_missing_mask;  // per keep column: 1 if absent

  int64_t ignored_unknown = 0, ignored_empty = 0;
  int64_t total_dup = 0;
  int32_t shortest = INT32_MAX, longest = 0;
};

struct Options {
  bool nucleotides, cdr3, ignore_counts, ignore_genes, ignore_unknown,
      ignore_empty, require_sequence_id;
};

void build_map(signed char* tab, bool nt) {
  memset(tab, -1, 256);
  if (nt) {
    const char* chars = "acgt";
    for (int i = 0; i < 4; i++) {
      tab[(unsigned char)chars[i]] = (signed char)i;
      tab[(unsigned char)toupper(chars[i])] = (signed char)i;
    }
    tab[(unsigned char)'u'] = 3;
    tab[(unsigned char)'U'] = 3;
  } else {
    const char* chars = "ACDEFGHIKLMNPQRSTVWY";
    for (int i = 0; i < 20; i++) {
      tab[(unsigned char)chars[i]] = (signed char)i;
      tab[(unsigned char)tolower(chars[i])] = (signed char)i;
    }
  }
}

struct Columns {
  // 1-based column numbers, 0 = absent (like db.cc:159-168)
  int repertoire_id = 0, sequence_id = 0, duplicate_count = 0;
  int v_call = 0, j_call = 0;
  int junction = 0, junction_aa = 0, cdr3 = 0, cdr3_aa = 0;
  std::vector<int> keep;
};

// split line into tab-separated token views
struct Tok {
  const char* p;
  size_t len;
};

size_t split(char* line, size_t len, std::vector<Tok>& out) {
  out.clear();
  const char* start = line;
  const char* end = line + len;
  for (const char* q = line; q <= end; q++) {
    if (q == end || *q == '\t') {
      out.push_back({start, (size_t)(q - start)});
      start = q + 1;
    }
  }
  return out.size();
}

bool tok_eq(const Tok& t, const char* s) {
  size_t n = strlen(s);
  return t.len == n && memcmp(t.p, s, n) == 0;
}

// strtol-style duplicate_count parse: leading whitespace, optional
// sign, digits to end, value >= 1 (db.cc:545-559)
bool parse_count(const Tok& t, int64_t* out) {
  const char* p = t.p;
  const char* end = t.p + t.len;
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r' ||
                     *p == '\v' || *p == '\f'))
    p++;
  bool neg = false;
  if (p < end && (*p == '+' || *p == '-')) {
    neg = (*p == '-');
    p++;
  }
  if (p >= end) return false;
  int64_t v = 0;
  for (; p < end; p++) {
    if (*p < '0' || *p > '9') return false;
    v = v * 10 + (*p - '0');
    if (v > (int64_t)1 << 62) return false;
  }
  if (neg) v = -v;
  if (v < 1) return false;
  *out = v;
  return true;
}

}  // namespace

extern "C" {

void* airr_session_new() { return new Session(); }

void airr_session_free(void* s) { delete static_cast<Session*>(s); }

// parse one file; returns a Result* handle (inspect via getters)
void* airr_parse(void* session_ptr, const char* filename,
                 int nucleotides, int cdr3, int ignore_counts,
                 int ignore_genes, int ignore_unknown, int ignore_empty,
                 int require_sequence_id, const char* default_repertoire_id,
                 const char** keep_names, int n_keep) {
  Session* session = static_cast<Session*>(session_ptr);
  Options opt{(bool)nucleotides, (bool)cdr3,         (bool)ignore_counts,
              (bool)ignore_genes, (bool)ignore_unknown, (bool)ignore_empty,
              (bool)require_sequence_id};
  Result* r = new Result();

  FILE* fp = fopen(filename, "rb");
  if (!fp) {
    r->status = ERR_OPEN;
    return r;
  }

  signed char map[256];
  build_map(map, opt.nucleotides);

  Columns cols;
  cols.keep.assign((size_t)n_keep, 0);
  bool have_header = false;

  char* line = nullptr;
  size_t cap = 0;
  int64_t lineno = 0;
  ssize_t linelen;
  std::vector<Tok> toks;
  std::vector<const Tok*> keep_vals((size_t)n_keep);
  bool any_line = false;

  while ((linelen = getline(&line, &cap, fp)) >= 0) {
    any_line = true;
    lineno++;
    size_t len = (size_t)linelen;
    if (len > 0 && line[len - 1] == '\n') len--;
    if (len > 0 && line[len - 1] == '\r') len--;

    if (!have_header) {
      if (len > 0 && (line[0] == '#' || line[0] == '@')) continue;
      // header (db.cc:172-296)
      split(line, len, toks);
      for (size_t i = 0; i < toks.size(); i++) {
        int no = (int)i + 1;
        const Tok& t = toks[i];
        if (tok_eq(t, "repertoire_id")) cols.repertoire_id = no;
        else if (tok_eq(t, "sequence_id")) cols.sequence_id = no;
        else if (tok_eq(t, "duplicate_count")) cols.duplicate_count = no;
        else if (tok_eq(t, "v_call")) cols.v_call = no;
        else if (tok_eq(t, "j_call")) cols.j_call = no;
        else if (tok_eq(t, "junction")) cols.junction = no;
        else if (tok_eq(t, "junction_aa")) cols.junction_aa = no;
        else if (tok_eq(t, "cdr3")) cols.cdr3 = no;
        else if (tok_eq(t, "cdr3_aa")) cols.cdr3_aa = no;
        for (int k = 0; k < n_keep; k++)
          if (tok_eq(t, keep_names[k])) cols.keep[(size_t)k] = no;
      }
      uint8_t missing = 0;
      if (opt.require_sequence_id && !cols.sequence_id) missing |= 1;
      if (!opt.ignore_counts && !cols.duplicate_count) missing |= 2;
      if (!opt.ignore_genes && !cols.v_call) missing |= 4;
      if (!opt.ignore_genes && !cols.j_call) missing |= 8;
      int seq_col = opt.cdr3 ? (opt.nucleotides ? cols.cdr3 : cols.cdr3_aa)
                             : (opt.nucleotides ? cols.junction
                                                : cols.junction_aa);
      if (!seq_col) missing |= 16;
      if (missing) {
        r->status = ERR_MISSING_COLUMNS;
        r->missing_cols = missing;
        break;
      }
      r->keep_missing_mask.assign((size_t)n_keep, 0);
      for (int k = 0; k < n_keep; k++)
        if (cols.keep[(size_t)k] < 1)
          r->keep_missing_mask[(size_t)k] = 1;
      have_header = true;
      continue;
    }

    split(line, len, toks);
    size_t ntok = toks.size();
    auto get = [&](int col) -> const Tok* {
      return (col >= 1 && (size_t)col <= ntok) ? &toks[(size_t)col - 1]
                                               : nullptr;
    };

    int seq_col = opt.cdr3 ? (opt.nucleotides ? cols.cdr3 : cols.cdr3_aa)
                           : (opt.nucleotides ? cols.junction
                                              : cols.junction_aa);
    const Tok* raw_seq = get(seq_col);

    // scan & encode (db.cc:408-469); the FNV-1a running hash feeds
    // the native exact-grouping passes so they never re-read rows
    size_t start = r->residues.size();
    int32_t seqlen = 0;
    uint64_t rowh = 1469598103934665603ULL;
    bool ignore_seq = false;
    bool fail = false;
    if (raw_seq) {
      for (size_t i = 0; i < raw_seq->len; i++) {
        unsigned char c = (unsigned char)raw_seq->p[i];
        signed char m = map[c];
        if (m >= 0) {
          r->residues.push_back((char)m);
          rowh = (rowh ^ (uint64_t)(uint8_t)m) * 1099511628211ULL;
          seqlen++;
        } else if (c >= 32 && c <= 126) {
          if (opt.ignore_unknown) {
            ignore_seq = true;
            r->ignored_unknown++;
          } else {
            r->status = ERR_ILLEGAL_CHAR;
            r->err_lineno = lineno;
            r->err_char = (int32_t)c;
            fail = true;
            break;
          }
        } else {
          r->status = ERR_ILLEGAL_CHAR_NONPRINT;
          r->err_lineno = lineno;
          r->err_char = (int32_t)c;
          fail = true;
          break;
        }
      }
    }
    if (fail) break;

    if (seqlen == 0) {
      if (opt.ignore_empty) {
        ignore_seq = true;
        r->ignored_empty++;
      } else {
        r->status = ERR_EMPTY_SEQ;
        r->err_lineno = lineno;
        break;
      }
    }

    if (ignore_seq) {
      r->residues.resize(start);
      continue;
    }

    if (seqlen > r->longest) r->longest = seqlen;
    if (seqlen < r->shortest) r->shortest = seqlen;

    // repertoire_id (db.cc:503-520)
    const Tok* rep = get(cols.repertoire_id);
    int32_t rep_id;
    if (rep)
      rep_id = r->repertoires.intern(rep->p, rep->len);
    else
      rep_id = r->repertoires.intern(default_repertoire_id,
                                     strlen(default_repertoire_id));

    // sequence_id (db.cc:523-540)
    const Tok* sid = get(cols.sequence_id);
    if (sid && sid->len > 0) {
      r->sequence_ids.push(sid->p, sid->len);
      r->has_sequence_id.push_back(1);
    } else if (opt.require_sequence_id) {
      r->status = ERR_MISSING_SEQUENCE_ID;
      r->err_lineno = lineno;
      break;
    } else {
      r->sequence_ids.push_missing();
      r->has_sequence_id.push_back(0);
    }

    // duplicate_count (db.cc:543-573)
    const Tok* dc = get(cols.duplicate_count);
    int64_t count;
    if (dc && dc->len > 0) {
      if (!parse_count(*dc, &count)) {
        r->status = ERR_BAD_DUP_COUNT;
        r->err_lineno = lineno;
        r->err_detail.assign(dc->p, dc->len);
        break;
      }
    } else if (opt.ignore_counts) {
      count = 1;
    } else {
      r->status = ERR_MISSING_DUP_COUNT;
      r->err_lineno = lineno;
      break;
    }
    r->total_dup += count;

    // v_call / j_call (db.cc:576-631)
    const Tok* v = get(cols.v_call);
    if (!opt.ignore_genes && (!v || v->len == 0)) {
      r->status = ERR_MISSING_V;
      r->err_lineno = lineno;
      break;
    }
    const Tok* j = get(cols.j_call);
    if (!opt.ignore_genes && (!j || j->len == 0)) {
      r->status = ERR_MISSING_J;
      r->err_lineno = lineno;
      break;
    }
    int32_t vno = v ? session->v_genes.intern(v->p, v->len)
                    : session->v_genes.intern("", 0);
    int32_t jno = j ? session->j_genes.intern(j->p, j->len)
                    : session->j_genes.intern("", 0);

    // sequence field must have been present & non-empty (db.cc:634-668)
    if (!raw_seq || raw_seq->len == 0) {
      r->status = ERR_MISSING_SEQ_VALUE;
      r->err_lineno = lineno;
      break;
    }

    // keep columns (db.cc:671-701)
    if (n_keep > 0) {
      std::string joined;
      for (int k = 0; k < n_keep; k++) {
        if (k) joined.push_back('\t');
        const Tok* kv = get(cols.keep[(size_t)k]);
        if (kv) joined.append(kv->p, kv->len);
      }
      r->keeps.push(joined.data(), joined.size());
    }

    r->row_hash.push_back(rowh);
    r->lengths.push_back(seqlen);
    r->counts.push_back(count);
    r->rep_no.push_back(rep_id);
    r->v_no.push_back(vno);
    r->j_no.push_back(jno);
    r->n++;
  }

  free(line);
  fclose(fp);
  if (!any_line && r->status == ERR_NONE) r->status = ERR_READ;
  return r;
}

// ---- result getters ----

int32_t airr_status(void* rp) { return static_cast<Result*>(rp)->status; }
int64_t airr_err_lineno(void* rp) {
  return static_cast<Result*>(rp)->err_lineno;
}
int32_t airr_err_char(void* rp) { return static_cast<Result*>(rp)->err_char; }
const char* airr_err_detail(void* rp) {
  return static_cast<Result*>(rp)->err_detail.c_str();
}
int32_t airr_missing_cols(void* rp) {
  return static_cast<Result*>(rp)->missing_cols;
}
int64_t airr_n(void* rp) { return static_cast<Result*>(rp)->n; }
int64_t airr_residues_size(void* rp) {
  return (int64_t)static_cast<Result*>(rp)->residues.size();
}
const uint64_t* airr_row_hash(void* rp) {
  return static_cast<Result*>(rp)->row_hash.data();
}
const char* airr_residues(void* rp) {
  return static_cast<Result*>(rp)->residues.data();
}
const int32_t* airr_lengths(void* rp) {
  return static_cast<Result*>(rp)->lengths.data();
}
const int64_t* airr_counts(void* rp) {
  return static_cast<Result*>(rp)->counts.data();
}
const int32_t* airr_rep_no(void* rp) {
  return static_cast<Result*>(rp)->rep_no.data();
}
const int32_t* airr_v_no(void* rp) {
  return static_cast<Result*>(rp)->v_no.data();
}
const int32_t* airr_j_no(void* rp) {
  return static_cast<Result*>(rp)->j_no.data();
}
const uint8_t* airr_has_sequence_id(void* rp) {
  return static_cast<Result*>(rp)->has_sequence_id.data();
}
const int64_t* airr_sequence_id_offsets(void* rp) {
  return static_cast<Result*>(rp)->sequence_ids.offsets.data();
}
const char* airr_sequence_id_blob(void* rp) {
  return static_cast<Result*>(rp)->sequence_ids.blob.data();
}
const int64_t* airr_keep_offsets(void* rp) {
  return static_cast<Result*>(rp)->keeps.offsets.data();
}
const char* airr_keep_blob(void* rp) {
  return static_cast<Result*>(rp)->keeps.blob.data();
}
const uint8_t* airr_keep_missing(void* rp) {
  return static_cast<Result*>(rp)->keep_missing_mask.data();
}
int64_t airr_ignored_unknown(void* rp) {
  return static_cast<Result*>(rp)->ignored_unknown;
}
int64_t airr_ignored_empty(void* rp) {
  return static_cast<Result*>(rp)->ignored_empty;
}
int64_t airr_total_dup(void* rp) {
  return static_cast<Result*>(rp)->total_dup;
}
int32_t airr_shortest(void* rp) {
  Result* r = static_cast<Result*>(rp);
  return r->n ? r->shortest : 0;
}
int32_t airr_longest(void* rp) { return static_cast<Result*>(rp)->longest; }

int32_t airr_rep_count(void* rp) {
  return (int32_t)static_cast<Result*>(rp)->repertoires.names.size();
}
const char* airr_rep_name(void* rp, int32_t i) {
  return static_cast<Result*>(rp)->repertoires.names[(size_t)i].c_str();
}

int32_t airr_v_count(void* sp) {
  return (int32_t)static_cast<Session*>(sp)->v_genes.names.size();
}
const char* airr_v_name(void* sp, int32_t i) {
  return static_cast<Session*>(sp)->v_genes.names[(size_t)i].c_str();
}
int32_t airr_j_count(void* sp) {
  return (int32_t)static_cast<Session*>(sp)->j_genes.names.size();
}
const char* airr_j_name(void* sp, int32_t i) {
  return static_cast<Session*>(sp)->j_genes.names[(size_t)i].c_str();
}

void airr_result_free(void* rp) { delete static_cast<Result*>(rp); }

}  // extern "C"
