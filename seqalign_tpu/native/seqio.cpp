// Native sequence reader — C++ equivalent of the reference's bundled
// seq_file submodule (L1a): streaming FASTA/FASTQ/plain records with
// transparent gzip, exposed through a C ABI consumed via ctypes
// (seqalign_tpu/io/native.py).  Semantics mirror seqalign_tpu/io/seqio.py
// (which mirrors the call-site contract in alignment_cmdline.c:570-640).
//
// Batch-oriented API: records are returned in blocks of packed bytes +
// offsets so the Python side does one ctypes call per thousands of
// records, not per record.

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  gzFile gz = nullptr;
  int pushback = -1;  // one pushed-back char
  // block staging buffers
  std::vector<char> seq_bytes;
  std::vector<char> name_bytes;
  std::vector<int64_t> seq_offsets;   // n+1 offsets
  std::vector<int64_t> name_offsets;  // n+1 offsets; -1 len => no name
  std::vector<int8_t> has_name;
};

int rd_getc(Reader* r) {
  if (r->pushback != -1) {
    int c = r->pushback;
    r->pushback = -1;
    return c;
  }
  return gzgetc(r->gz);
}

// read one line (no newline, \r stripped) into out; returns false at EOF
// with nothing read
bool rd_line(Reader* r, std::string* out) {
  out->clear();
  int c;
  bool any = false;
  while ((c = rd_getc(r)) != -1) {
    any = true;
    if (c == '\n') return true;
    if (c != '\r') out->push_back(static_cast<char>(c));
  }
  return any;
}

// Read one record. Returns: 1 = record, 0 = EOF.
int rd_record(Reader* r, std::string* name, bool* named, std::string* seq) {
  name->clear();
  seq->clear();
  *named = false;
  int c;
  while ((c = rd_getc(r)) != -1 && (c == '\n' || c == '\r')) {
  }
  if (c == -1) return 0;
  if (c == '>') {
    rd_line(r, name);
    *named = true;
    std::string line;
    while ((c = rd_getc(r)) != -1) {
      if (c == '>' || c == '@') {
        r->pushback = c;
        break;
      }
      if (c == '\n' || c == '\r') continue;
      seq->push_back(static_cast<char>(c));
      while ((c = rd_getc(r)) != -1 && c != '\n')
        if (c != '\r') seq->push_back(static_cast<char>(c));
      if (c == -1) break;
    }
    return 1;
  }
  if (c == '@') {
    rd_line(r, name);
    *named = true;
    rd_line(r, seq);
    std::string skip;
    rd_line(r, &skip);  // '+'
    rd_line(r, &skip);  // quals
    return 1;
  }
  // plain line
  seq->push_back(static_cast<char>(c));
  while ((c = rd_getc(r)) != -1 && c != '\n')
    if (c != '\r') seq->push_back(static_cast<char>(c));
  return 1;
}

}  // namespace

extern "C" {

void* seqio_open(const char* path) {
  gzFile gz = std::strcmp(path, "-") == 0 ? gzdopen(0, "r") : gzopen(path, "r");
  if (gz == nullptr) return nullptr;
  auto* r = new Reader();
  r->gz = gz;
  return r;
}

void seqio_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  gzclose(r->gz);
  delete r;
}

// Read up to max_records records into the handle's staging buffers.
// Returns the number of records read (0 at EOF).
int64_t seqio_read_block(void* h, int64_t max_records) {
  auto* r = static_cast<Reader*>(h);
  r->seq_bytes.clear();
  r->name_bytes.clear();
  r->seq_offsets.assign(1, 0);
  r->name_offsets.assign(1, 0);
  r->has_name.clear();
  std::string name, seq;
  bool named;
  int64_t n = 0;
  while (n < max_records && rd_record(r, &name, &named, &seq) == 1) {
    r->seq_bytes.insert(r->seq_bytes.end(), seq.begin(), seq.end());
    r->seq_offsets.push_back(static_cast<int64_t>(r->seq_bytes.size()));
    r->name_bytes.insert(r->name_bytes.end(), name.begin(), name.end());
    r->name_offsets.push_back(static_cast<int64_t>(r->name_bytes.size()));
    r->has_name.push_back(named ? 1 : 0);
    n++;
  }
  return n;
}

// Accessors for the staged block (valid until the next read_block call).
const char* seqio_seq_bytes(void* h) {
  return static_cast<Reader*>(h)->seq_bytes.data();
}
const int64_t* seqio_seq_offsets(void* h) {
  return static_cast<Reader*>(h)->seq_offsets.data();
}
const char* seqio_name_bytes(void* h) {
  return static_cast<Reader*>(h)->name_bytes.data();
}
const int64_t* seqio_name_offsets(void* h) {
  return static_cast<Reader*>(h)->name_offsets.data();
}
const int8_t* seqio_has_name(void* h) {
  return static_cast<Reader*>(h)->has_name.data();
}

}  // extern "C"
