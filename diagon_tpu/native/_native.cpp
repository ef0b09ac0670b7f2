// diagon_tpu native host tier: tokenizer + in-memory postings accumulator.
//
// The ingestion hot path of the framework, mirroring the role of the
// reference's C++ FreqProxTermsWriter + StandardTokenizer ASCII fast path
// (reference: src/core/include/diagon/util/StandardTokenizer.h:113-152,
// FreqProxTermsWriter.h:24-120) — re-implemented from scratch for this
// framework's CSR output layout (the packed-postings builder consumes
// whole arrays, not per-term linked blocks).
//
// Exposed via the CPython C API (no pybind11 in this environment):
//   _native.standard_tokenize_ascii(text: str) -> list[str]
//   _native.FreqProx()             — per-field postings accumulator
//     .add_document(doc_id, text, with_positions) -> token_count
//     .finish() -> tuple of bytes blobs (see finish() below)
//
// Build: diagon_tpu/native/__init__.py invokes g++ -O3 -shared -fPIC.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

inline bool is_alnum(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
           (c >= '0' && c <= '9');
}
inline bool is_token_char(unsigned char c) {
    return is_alnum(c) || c == '\'';
}
inline char lower(unsigned char c) {
    return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                  : static_cast<char>(c);
}

// Tokenize ASCII text: token starts at alnum, continues over alnum+'\'',
// lowercased. Calls `fn(start, len)` per token with a scratch buffer
// holding the lowercased token.
template <typename Fn>
void tokenize_ascii(const char* data, Py_ssize_t len, std::string& scratch,
                    Fn&& fn) {
    Py_ssize_t i = 0;
    while (i < len) {
        unsigned char c = static_cast<unsigned char>(data[i]);
        if (!is_alnum(c)) {
            i++;
            continue;
        }
        Py_ssize_t start = i;
        i++;
        while (i < len && is_token_char(static_cast<unsigned char>(data[i])))
            i++;
        scratch.clear();
        scratch.reserve(i - start);
        for (Py_ssize_t j = start; j < i; j++)
            scratch.push_back(lower(static_cast<unsigned char>(data[j])));
        fn(scratch);
    }
}

inline uint64_t hash_token_bytes(const char* p, size_t n) {
    uint64_t h = 0x9E3779B97F4A7C15ull ^ n;
    size_t rem = n;
    while (rem >= 8) {
        uint64_t k;
        std::memcpy(&k, p, 8);
        h = (h ^ k) * 0x9DDFEA08EB382D69ull;
        h ^= h >> 29;
        p += 8;
        rem -= 8;
    }
    uint64_t k = 0;
    for (size_t i = 0; i < rem; i++)
        k = (k << 8) | static_cast<unsigned char>(p[i]);
    h = (h ^ k) * 0x9DDFEA08EB382D69ull;
    return h ^ (h >> 32);
}

// 256-entry character classes + lowercase table: one load per byte in the
// hot scan instead of 3-4 range compares (the ingest loop is THE
// throughput path, reference FastTokenizer role).
struct CharTables {
    unsigned char cls[256];   // 0 = separator, 1 = alnum, 2 = '
    char low[256];
    CharTables() {
        for (int c = 0; c < 256; c++) {
            unsigned char u = static_cast<unsigned char>(c);
            cls[c] = is_alnum(u) ? 1 : (u == '\'' ? 2 : 0);
            low[c] = lower(u);
        }
    }
};
const CharTables kTables;

// Zero-copy tokenize for the accumulate path: lowercases each token into
// a stack buffer and hashes it in the same pass, so the hot loop never
// touches a std::string (no clear/reserve/capacity checks per token).
// Calls fn(lowered_bytes, len, hash). Tokens longer than the stack buffer
// (vanishingly rare in real text) go through the std::string path.
template <typename Fn>
void tokenize_ascii_fast(const char* data, Py_ssize_t len,
                         std::string& scratch, Fn&& fn) {
    constexpr Py_ssize_t kBuf = 256;
    char buf[kBuf];
    Py_ssize_t i = 0;
    while (i < len) {
        if (kTables.cls[static_cast<unsigned char>(data[i])] != 1) {
            i++;
            continue;
        }
        Py_ssize_t start = i;
        i++;
        while (i < len && kTables.cls[static_cast<unsigned char>(data[i])])
            i++;
        Py_ssize_t n = i - start;
        if (n <= kBuf) {
            uint64_t h = 0x9E3779B97F4A7C15ull ^ static_cast<uint64_t>(n);
            Py_ssize_t j = start, w = 0;
            while (j + 8 <= i) {
                uint64_t k = 0;
                for (int b = 0; b < 8; b++)
                    buf[w + b] =
                        kTables.low[static_cast<unsigned char>(data[j + b])];
                std::memcpy(&k, buf + w, 8);
                h = (h ^ k) * 0x9DDFEA08EB382D69ull;
                h ^= h >> 29;
                j += 8;
                w += 8;
            }
            uint64_t k = 0;
            for (; j < i; j++, w++) {
                buf[w] = kTables.low[static_cast<unsigned char>(data[j])];
                k = (k << 8) | static_cast<unsigned char>(buf[w]);
            }
            h = (h ^ k) * 0x9DDFEA08EB382D69ull;
            fn(buf, static_cast<size_t>(n), h ^ (h >> 32));
        } else {
            scratch.clear();
            for (Py_ssize_t j = start; j < i; j++)
                scratch.push_back(
                    kTables.low[static_cast<unsigned char>(data[j])]);
            fn(scratch.data(), scratch.size(),
               hash_token_bytes(scratch.data(), scratch.size()));
        }
    }
}

// ---------------------------------------------------------------------
// standard_tokenize_ascii
// ---------------------------------------------------------------------

PyObject* standard_tokenize_ascii(PyObject*, PyObject* arg) {
    Py_ssize_t len = 0;
    const char* data = PyUnicode_AsUTF8AndSize(arg, &len);
    if (data == nullptr) return nullptr;

    PyObject* list = PyList_New(0);
    if (!list) return nullptr;
    std::string tok;
    bool failed = false;
    tokenize_ascii(data, len, tok, [&](const std::string& t) {
        if (failed) return;
        PyObject* s = PyUnicode_FromStringAndSize(t.data(), t.size());
        if (!s || PyList_Append(list, s) < 0) failed = true;
        Py_XDECREF(s);
    });
    if (failed) {
        Py_DECREF(list);
        return nullptr;
    }
    return list;
}

// ---------------------------------------------------------------------
// FreqProx: per-field postings accumulator
// ---------------------------------------------------------------------

struct TermPostings {
    std::vector<int32_t> docs;
    std::vector<int32_t> freqs;
    std::vector<int64_t> pos_start;   // per-entry start into positions
    std::vector<int32_t> positions;
};

// Open-addressing term table: the per-token lookup is THE indexing hot
// loop (65% of ingest time when this was a node-based unordered_map —
// one heap node + chain walk per probe). Slots hold (hash, idx+1); term
// bytes live in one arena so a probe is one contiguous compare, and
// postings live in a parallel vector indexed by term id.
struct TermStore {
    std::vector<uint64_t> slot_hash;
    std::vector<uint32_t> slot_idx;   // 0 = empty, else term idx + 1
    std::string arena;                // concatenated term bytes
    std::vector<uint64_t> offs;       // [T+1] arena offsets
    std::vector<TermPostings> posts;  // [T]
    // deferred per-term tail entry: the hot loop touches only these flat
    // arrays (one line each); docs/freqs vectors are written once per
    // (term, doc) transition instead of once per token
    // positions as ONE sequential (term_idx << 32 | pos) stream — the
    // per-token push into per-term vectors was a random cache miss per
    // token; the stream distributes into CSR in one pass at finish()
    // (pos_start falls out of the freqs cumsum)
    std::vector<uint64_t> pos_stream;
    // packed pending entry per term: (doc+1) << 32 | freq, 0 = none —
    // ONE cache line per token for the doc-match check + freq bump
    // instead of two parallel arrays
    std::vector<uint64_t> pending;    // [T]
    size_t mask;

    TermStore() : slot_hash(1u << 12, 0), slot_idx(1u << 12, 0),
                  offs(1, 0), mask((1u << 12) - 1) {}

    void flush_entry(uint32_t idx) {
        TermPostings& tp = posts[idx];
        uint64_t e = pending[idx];
        tp.docs.push_back(static_cast<int32_t>((e >> 32) - 1));
        tp.freqs.push_back(static_cast<int32_t>(e & 0xffffffffu));
        pending[idx] = 0;
    }

    size_t size() const { return posts.size(); }

    static uint64_t hash_bytes(const char* p, size_t n) {
        return hash_token_bytes(p, n);
    }

    void grow() {
        size_t cap = (mask + 1) * 2;
        std::vector<uint64_t> nh(cap, 0);
        std::vector<uint32_t> ni(cap, 0);
        size_t nm = cap - 1;
        for (size_t s = 0; s <= mask; s++) {
            if (!slot_idx[s]) continue;
            size_t d = slot_hash[s] & nm;
            while (ni[d]) d = (d + 1) & nm;
            nh[d] = slot_hash[s];
            ni[d] = slot_idx[s];
        }
        slot_hash.swap(nh);
        slot_idx.swap(ni);
        mask = nm;
    }

    uint32_t find_or_insert(const std::string& t, int64_t* ram_bytes) {
        return find_or_insert_h(t.data(), t.size(),
                                hash_token_bytes(t.data(), t.size()),
                                ram_bytes);
    }

    // raw-bytes + precomputed-hash form: the bulk tokenizer hashes while
    // lowercasing, so the hot loop does zero string construction
    uint32_t find_or_insert_h(const char* p, size_t n, uint64_t h,
                              int64_t* ram_bytes) {
        if ((size() + 1) * 10 >= (mask + 1) * 7) grow();  // 0.7 load max
        size_t s = h & mask;
        while (slot_idx[s]) {
            if (slot_hash[s] == h) {
                uint32_t idx = slot_idx[s] - 1;
                uint64_t o = offs[idx];
                if (offs[idx + 1] - o == n &&
                    std::memcmp(arena.data() + o, p, n) == 0)
                    return idx;
            }
            s = (s + 1) & mask;
        }
        uint32_t idx = static_cast<uint32_t>(size());
        slot_hash[s] = h;
        slot_idx[s] = idx + 1;
        arena.append(p, n);
        offs.push_back(arena.size());
        posts.emplace_back();
        pending.push_back(0);
        *ram_bytes += 64 + static_cast<int64_t>(n);
        return idx;
    }
};

struct FreqProxObject {
    PyObject_HEAD
    TermStore* terms;
    std::vector<std::pair<int32_t, int32_t>>* field_lengths;  // (doc, len)
    int64_t sum_total_tf;
    int64_t ram_bytes;
};

PyObject* FreqProx_new(PyTypeObject* type, PyObject*, PyObject*) {
    FreqProxObject* self =
        reinterpret_cast<FreqProxObject*>(type->tp_alloc(type, 0));
    if (!self) return nullptr;
    self->terms = new TermStore();
    self->field_lengths = new std::vector<std::pair<int32_t, int32_t>>();
    self->sum_total_tf = 0;
    self->ram_bytes = 0;
    return reinterpret_cast<PyObject*>(self);
}

void FreqProx_dealloc(FreqProxObject* self) {
    delete self->terms;
    delete self->field_lengths;
    Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

// add_document(doc_id: int, text: str, with_positions: bool) -> int
PyObject* FreqProx_add_document(FreqProxObject* self, PyObject* args) {
    int doc_id;
    PyObject* text_obj;
    int with_positions;
    if (!PyArg_ParseTuple(args, "iUp", &doc_id, &text_obj, &with_positions))
        return nullptr;
    Py_ssize_t len = 0;
    const char* data = PyUnicode_AsUTF8AndSize(text_obj, &len);
    if (!data) return nullptr;

    std::string tok;
    int32_t pos = 0;
    auto& terms = *self->terms;
    tokenize_ascii_fast(data, len, tok, [&](const char* tp, size_t tn,
                                            uint64_t th) {
        uint32_t idx = terms.find_or_insert_h(tp, tn, th, &self->ram_bytes);
        uint64_t e = terms.pending[idx];
        if ((e >> 32) == static_cast<uint64_t>(doc_id) + 1) {
            terms.pending[idx] = e + 1;
        } else {
            if (e) terms.flush_entry(idx);
            terms.pending[idx] =
                ((static_cast<uint64_t>(doc_id) + 1) << 32) | 1u;
        }
        if (with_positions)
            terms.pos_stream.push_back(
                (static_cast<uint64_t>(idx) << 32) |
                static_cast<uint32_t>(pos));
        self->ram_bytes += 12;
        pos++;
    });
    self->sum_total_tf += pos;
    if (pos > 0) self->field_lengths->emplace_back(doc_id, pos);
    return PyLong_FromLong(pos);
}

// finish(with_positions) ->
//   (term_blob: bytes           — concatenated utf-8 terms, sorted
//    term_offsets: bytes int64[T+1]
//    entry_start: bytes int64[T+1]  — CSR into docs/freqs
//    docs:   bytes int32[NE]
//    freqs:  bytes int32[NE]
//    pos_start: bytes int64[NE+1]   — CSR into positions (empty if !pos)
//    positions: bytes int32[NP]
//    field_docs: bytes int32[ND]    — docs with this field
//    field_lens: bytes int32[ND])
PyObject* FreqProx_finish(FreqProxObject* self, PyObject* args) {
    int with_positions;
    if (!PyArg_ParseTuple(args, "p", &with_positions)) return nullptr;

    TermStore& terms = *self->terms;
    size_t T = terms.size();
    for (size_t t = 0; t < T; t++)  // flush deferred tail entries
        if (terms.pending[t])
            terms.flush_entry(static_cast<uint32_t>(t));
    const char* ar = terms.arena.data();
    std::vector<uint32_t> order(T);
    for (size_t i = 0; i < T; i++) order[i] = static_cast<uint32_t>(i);
    std::sort(order.begin(), order.end(), [&](uint32_t a, uint32_t b) {
        size_t la = terms.offs[a + 1] - terms.offs[a];
        size_t lb = terms.offs[b + 1] - terms.offs[b];
        int c = std::memcmp(ar + terms.offs[a], ar + terms.offs[b],
                            la < lb ? la : lb);
        return c < 0 || (c == 0 && la < lb);
    });

    std::string term_blob;
    std::vector<int64_t> term_offsets(T + 1, 0);
    std::vector<int64_t> entry_start(T + 1, 0);
    size_t total_entries = 0;
    for (size_t t = 0; t < T; t++)
        total_entries += terms.posts[t].docs.size();
    size_t total_positions = terms.pos_stream.size();
    term_blob.reserve(terms.arena.size());

    std::vector<int32_t> docs(total_entries), freqs(total_entries);
    std::vector<int64_t> pos_start;
    std::vector<int32_t> positions;
    std::vector<uint64_t> pos_cursor;  // per ORIGINAL term id
    if (with_positions) {
        pos_start.resize(total_entries + 1);
        positions.resize(total_positions);
        pos_cursor.assign(T, 0);
    }

    size_t e = 0, p = 0;
    for (size_t t = 0; t < T; t++) {
        uint32_t id = order[t];
        term_offsets[t] = static_cast<int64_t>(term_blob.size());
        term_blob.append(ar + terms.offs[id],
                         terms.offs[id + 1] - terms.offs[id]);
        entry_start[t] = static_cast<int64_t>(e);
        const TermPostings& tp = terms.posts[id];
        std::memcpy(docs.data() + e, tp.docs.data(),
                    tp.docs.size() * sizeof(int32_t));
        std::memcpy(freqs.data() + e, tp.freqs.data(),
                    tp.freqs.size() * sizeof(int32_t));
        if (with_positions) {
            // pos_start = running freqs cumsum; the stream then lands
            // each term's positions contiguously in (doc, pos) order
            pos_cursor[id] = p;
            for (size_t j = 0; j < tp.docs.size(); j++) {
                pos_start[e + j] = static_cast<int64_t>(p);
                p += static_cast<size_t>(tp.freqs[j]);
            }
        }
        e += tp.docs.size();
    }
    term_offsets[T] = static_cast<int64_t>(term_blob.size());
    entry_start[T] = static_cast<int64_t>(e);
    if (with_positions) {
        pos_start[total_entries] = static_cast<int64_t>(p);
        for (uint64_t s : terms.pos_stream)
            positions[pos_cursor[s >> 32]++] =
                static_cast<int32_t>(s & 0xffffffffu);
    }

    std::vector<int32_t> fdocs(self->field_lengths->size());
    std::vector<int32_t> flens(self->field_lengths->size());
    for (size_t i = 0; i < self->field_lengths->size(); i++) {
        fdocs[i] = (*self->field_lengths)[i].first;
        flens[i] = (*self->field_lengths)[i].second;
    }

    auto mk = [](const void* data, size_t nbytes) {
        return PyBytes_FromStringAndSize(
            static_cast<const char*>(data), static_cast<Py_ssize_t>(nbytes));
    };
    PyObject* out = Py_BuildValue(
        "(NNNNNNNNN)",
        mk(term_blob.data(), term_blob.size()),
        mk(term_offsets.data(), term_offsets.size() * 8),
        mk(entry_start.data(), entry_start.size() * 8),
        mk(docs.data(), docs.size() * 4),
        mk(freqs.data(), freqs.size() * 4),
        mk(pos_start.data(), pos_start.size() * 8),
        mk(positions.data(), positions.size() * 4),
        mk(fdocs.data(), fdocs.size() * 4),
        mk(flens.data(), flens.size() * 4));
    return out;
}

// add_documents(doc_id0: int, texts: sequence[str], with_positions: bool)
//   -> bytes i32[len(texts)] per-document token counts
// Batch ingest: one Python call per (field, batch) instead of per
// document — the per-call interpreter overhead is most of the gap to the
// reference's 43k docs/s addDocument loop (README.md:50).
PyObject* FreqProx_add_documents(FreqProxObject* self, PyObject* args) {
    int doc_id0;
    PyObject* seq;
    int with_positions;
    if (!PyArg_ParseTuple(args, "iOp", &doc_id0, &seq, &with_positions))
        return nullptr;
    PyObject* fast = PySequence_Fast(seq, "texts must be a sequence");
    if (!fast) return nullptr;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    std::vector<int32_t> counts(static_cast<size_t>(n), 0);
    std::string tok;
    auto& terms = *self->terms;
    for (Py_ssize_t k = 0; k < n; k++) {
        PyObject* text_obj = PySequence_Fast_GET_ITEM(fast, k);
        Py_ssize_t len = 0;
        const char* data = PyUnicode_AsUTF8AndSize(text_obj, &len);
        if (!data) {
            Py_DECREF(fast);
            return nullptr;
        }
        int doc_id = doc_id0 + static_cast<int>(k);
        int32_t pos = 0;
        tokenize_ascii_fast(data, len, tok, [&](const char* tp, size_t tn,
                                                uint64_t th) {
            uint32_t idx =
                terms.find_or_insert_h(tp, tn, th, &self->ram_bytes);
            uint64_t e = terms.pending[idx];
            if ((e >> 32) == static_cast<uint64_t>(doc_id) + 1) {
                terms.pending[idx] = e + 1;
            } else {
                if (e) terms.flush_entry(idx);
                terms.pending[idx] =
                    ((static_cast<uint64_t>(doc_id) + 1) << 32) | 1u;
            }
            if (with_positions)
                terms.pos_stream.push_back(
                    (static_cast<uint64_t>(idx) << 32) |
                    static_cast<uint32_t>(pos));
            self->ram_bytes += 12;
            pos++;
        });
        counts[static_cast<size_t>(k)] = pos;
        self->sum_total_tf += pos;
        if (pos > 0) self->field_lengths->emplace_back(doc_id, pos);
    }
    Py_DECREF(fast);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(counts.data()),
        static_cast<Py_ssize_t>(counts.size() * 4));
}

// add_keywords(doc_id0: int, values: sequence[str | None]) -> int
// Bulk keyword-field ingest (StringField: one case-SENSITIVE term per
// doc, no tokenization, no positions). None/empty slots mean the doc
// lacks the field. Returns the number of docs that had the field.
PyObject* FreqProx_add_keywords(FreqProxObject* self, PyObject* args) {
    int doc_id0;
    PyObject* seq;
    if (!PyArg_ParseTuple(args, "iO", &doc_id0, &seq)) return nullptr;
    PyObject* fast = PySequence_Fast(seq, "values must be a sequence");
    if (!fast) return nullptr;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    auto& terms = *self->terms;
    long with_field = 0;
    for (Py_ssize_t k = 0; k < n; k++) {
        PyObject* v = PySequence_Fast_GET_ITEM(fast, k);
        if (v == Py_None) continue;
        Py_ssize_t len = 0;
        const char* data = PyUnicode_AsUTF8AndSize(v, &len);
        if (!data) {
            Py_DECREF(fast);
            return nullptr;
        }
        if (len == 0) continue;
        int doc_id = doc_id0 + static_cast<int>(k);
        uint32_t idx = terms.find_or_insert_h(
            data, static_cast<size_t>(len),
            hash_token_bytes(data, static_cast<size_t>(len)),
            &self->ram_bytes);
        uint64_t e = terms.pending[idx];
        if ((e >> 32) == static_cast<uint64_t>(doc_id) + 1) {
            terms.pending[idx] = e + 1;
        } else {
            if (e) terms.flush_entry(idx);
            terms.pending[idx] =
                ((static_cast<uint64_t>(doc_id) + 1) << 32) | 1u;
        }
        self->ram_bytes += 12;
        self->sum_total_tf += 1;
        with_field++;
        self->field_lengths->emplace_back(doc_id, 1);
    }
    Py_DECREF(fast);
    return PyLong_FromLong(with_field);
}

PyObject* FreqProx_ram_bytes(FreqProxObject* self, PyObject*) {
    return PyLong_FromLongLong(self->ram_bytes);
}

PyObject* FreqProx_num_terms(FreqProxObject* self, PyObject*) {
    return PyLong_FromSize_t(self->terms->size());
}

PyMethodDef FreqProx_methods[] = {
    {"add_document", reinterpret_cast<PyCFunction>(FreqProx_add_document),
     METH_VARARGS, "tokenize + accumulate one document's field text"},
    {"add_keywords", reinterpret_cast<PyCFunction>(FreqProx_add_keywords),
     METH_VARARGS, "bulk keyword-field ingest"},
    {"add_documents", reinterpret_cast<PyCFunction>(FreqProx_add_documents),
     METH_VARARGS, "batch tokenize + accumulate many documents' field text"},
    {"finish", reinterpret_cast<PyCFunction>(FreqProx_finish), METH_VARARGS,
     "emit sorted CSR arrays as bytes"},
    {"ram_bytes", reinterpret_cast<PyCFunction>(FreqProx_ram_bytes),
     METH_NOARGS, "approximate RAM usage"},
    {"num_terms", reinterpret_cast<PyCFunction>(FreqProx_num_terms),
     METH_NOARGS, "distinct term count"},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject FreqProxType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
    "diagon_tpu.native._native.FreqProx",   /* tp_name */
    sizeof(FreqProxObject),                 /* tp_basicsize */
};

// ---------------------------------------------------------------------
// pack_blocks: CSR postings -> bit-packed 128-doc block arrays
// ---------------------------------------------------------------------
//
// One C++ pass replacing the numpy scatter/bincount packer
// (codecs/postings.py build_packed_postings_csr): this host has a single
// slow core, and the vectorized-numpy version dominates segment flush.
// Output arrays are BIT-IDENTICAL to the numpy packer (tests compare).
//
// pack_blocks(entry_start: bytes int64[T+1], docs: bytes int32[NE],
//             freqs: bytes int32[NE], norms: bytes uint8[D] or b"") ->
//   (block_start i32[T+1], block_term i32[NB], block_base i32[NB],
//    block_count i32[NB], doc_bits i32[NB], freq_bits i32[NB],
//    word_off i32[NB], max_freq i32[NB], max_norm i32[NB],
//    block_entry_start i64[NB+1], packed u32[W], max_window: int,
//    doc_freq i32[T], total_tf i64[T])

constexpr int kBlock = 128;

inline int bits_for(int64_t v) {
    if (v <= 0) return 1;
    int b = 0;
    while (v) { b++; v >>= 1; }
    return b;
}

PyObject* pack_blocks(PyObject*, PyObject* args) {
    Py_buffer eb, db, fb, nb;
    if (!PyArg_ParseTuple(args, "y*y*y*y*", &eb, &db, &fb, &nb))
        return nullptr;
    const int64_t* entry_start = static_cast<const int64_t*>(eb.buf);
    const int32_t* docs = static_cast<const int32_t*>(db.buf);
    const int32_t* freqs = static_cast<const int32_t*>(fb.buf);
    const uint8_t* norms =
        nb.len > 0 ? static_cast<const uint8_t*>(nb.buf) : nullptr;
    size_t T = static_cast<size_t>(eb.len / 8) - 1;
    size_t NE = static_cast<size_t>(db.len / 4);

    std::vector<int32_t> block_start(T + 1);
    std::vector<int32_t> doc_freq(T);
    std::vector<int64_t> total_tf(T, 0);

    size_t NB = 0;
    for (size_t t = 0; t < T; t++) {
        block_start[t] = static_cast<int32_t>(NB);
        int64_t df = entry_start[t + 1] - entry_start[t];
        doc_freq[t] = static_cast<int32_t>(df);
        NB += static_cast<size_t>((df + kBlock - 1) / kBlock);
    }
    block_start[T] = static_cast<int32_t>(NB);

    std::vector<int32_t> b_term(NB), b_base(NB), b_count(NB), b_dbits(NB),
        b_fbits(NB), b_woff(NB), b_maxf(NB), b_maxn(NB);
    std::vector<int64_t> b_estart(NB + 1);

    // pass 1: per-block metadata + word layout
    int64_t word_off = 0;
    int64_t max_window = 1;
    size_t nb_i = 0;
    for (size_t t = 0; t < T; t++) {
        int64_t s = entry_start[t], e = entry_start[t + 1];
        for (int64_t bs = s; bs < e; bs += kBlock, nb_i++) {
            int64_t be = bs + kBlock < e ? bs + kBlock : e;
            int count = static_cast<int>(be - bs);
            int64_t max_delta = 0, max_freq = 0;
            int max_norm = norms ? 0 : 127;
            int64_t prev = docs[bs];
            int64_t tf = 0;
            for (int64_t j = bs; j < be; j++) {
                int64_t d = docs[j] - prev;
                prev = docs[j];
                if (j == bs) d = 0;
                if (d > max_delta) max_delta = d;
                if (freqs[j] > max_freq) max_freq = freqs[j];
                tf += freqs[j];
                if (norms) {
                    int n = norms[docs[j]];
                    if (n > max_norm) max_norm = n;
                }
            }
            total_tf[t] += tf;
            int dbits = bits_for(max_delta);
            // fbits == 0 encodes an all-freq-1 block: the freq section is
            // omitted entirely (most blocks of light terms qualify)
            int fbits = (max_freq == 1) ? 0 : bits_for(max_freq);
            b_term[nb_i] = static_cast<int32_t>(t);
            b_base[nb_i] = docs[bs];
            b_count[nb_i] = count;
            b_dbits[nb_i] = dbits;
            b_fbits[nb_i] = fbits;
            b_woff[nb_i] = static_cast<int32_t>(word_off);
            b_maxf[nb_i] = static_cast<int32_t>(max_freq);
            b_maxn[nb_i] = max_norm;
            b_estart[nb_i] = bs;
            int64_t dwords = (int64_t(count) * dbits + 31) >> 5;
            int64_t fwords = (int64_t(count) * fbits + 31) >> 5;
            word_off += dwords + fwords;
            int64_t window = ((int64_t(kBlock) * dbits + 31) >> 5) +
                             ((int64_t(kBlock) * fbits + 31) >> 5);
            if (window > max_window) max_window = window;
        }
    }
    b_estart[NB] = static_cast<int64_t>(NE);

    // pass 2: bit packing (little-endian within u32 words, value i at
    // bitpos i*bits — identical layout to codecs/bitpack.pack_u32)
    std::vector<uint32_t> packed(
        static_cast<size_t>(word_off + max_window + 1), 0);
    for (size_t b = 0; b < NB; b++) {
        int64_t bs = b_estart[b];
        int count = b_count[b];
        int dbits = b_dbits[b];
        int fbits = b_fbits[b];
        uint32_t* dw = packed.data() + b_woff[b];
        int64_t prev = docs[bs];
        for (int i = 0; i < count; i++) {
            uint64_t v = 0;
            if (i > 0) {
                v = static_cast<uint64_t>(docs[bs + i] - prev);
            }
            prev = docs[bs + i];
            int64_t bitpos = int64_t(i) * dbits;
            dw[bitpos >> 5] |= static_cast<uint32_t>(v << (bitpos & 31));
            int sh = static_cast<int>(bitpos & 31);
            if (sh) dw[(bitpos >> 5) + 1] |=
                static_cast<uint32_t>(v >> (32 - sh));
        }
        if (fbits > 0) {
            uint32_t* fw = dw + ((int64_t(count) * dbits + 31) >> 5);
            for (int i = 0; i < count; i++) {
                uint64_t v = static_cast<uint64_t>(freqs[bs + i]);
                int64_t bitpos = int64_t(i) * fbits;
                fw[bitpos >> 5] |= static_cast<uint32_t>(v << (bitpos & 31));
                int sh = static_cast<int>(bitpos & 31);
                if (sh) fw[(bitpos >> 5) + 1] |=
                    static_cast<uint32_t>(v >> (32 - sh));
            }
        }
    }

    PyBuffer_Release(&eb);
    PyBuffer_Release(&db);
    PyBuffer_Release(&fb);
    PyBuffer_Release(&nb);

    auto mk = [](const void* data, size_t nbytes) {
        return PyBytes_FromStringAndSize(
            static_cast<const char*>(data), static_cast<Py_ssize_t>(nbytes));
    };
    return Py_BuildValue(
        "(NNNNNNNNNNNlNN)",
        mk(block_start.data(), block_start.size() * 4),
        mk(b_term.data(), NB * 4),
        mk(b_base.data(), NB * 4),
        mk(b_count.data(), NB * 4),
        mk(b_dbits.data(), NB * 4),
        mk(b_fbits.data(), NB * 4),
        mk(b_woff.data(), NB * 4),
        mk(b_maxf.data(), NB * 4),
        mk(b_maxn.data(), NB * 4),
        mk(b_estart.data(), (NB + 1) * 8),
        mk(packed.data(), packed.size() * 4),
        static_cast<long>(max_window),
        mk(doc_freq.data(), T * 4),
        mk(total_tf.data(), T * 8));
}

// pack_bits(values: bytes int32[N], bits: int) -> bytes u32 words
// (the pack_u32 layout; used for the on-disk positions section)
PyObject* pack_bits_fn(PyObject*, PyObject* args) {
    Py_buffer vb;
    int bits;
    if (!PyArg_ParseTuple(args, "y*i", &vb, &bits)) return nullptr;
    const int32_t* vals = static_cast<const int32_t*>(vb.buf);
    size_t N = static_cast<size_t>(vb.len / 4);
    size_t W = (N * static_cast<size_t>(bits) + 31) / 32;
    std::vector<uint32_t> out(W ? W : 0, 0);
    for (size_t i = 0; i < N; i++) {
        uint64_t v = static_cast<uint64_t>(static_cast<uint32_t>(vals[i]));
        size_t bitpos = i * static_cast<size_t>(bits);
        out[bitpos >> 5] |= static_cast<uint32_t>(v << (bitpos & 31));
        int sh = static_cast<int>(bitpos & 31);
        // spill word: always in range when its bits are nonzero, because
        // W*32 >= N*bits covers every value's bit span
        if (sh && (bitpos >> 5) + 1 < out.size())
            out[(bitpos >> 5) + 1] |= static_cast<uint32_t>(v >> (32 - sh));
    }
    PyBuffer_Release(&vb);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size() * 4));
}

// decode_freqs(count: bytes i32[NB], doc_bits: bytes i32[NB],
//              freq_bits: bytes i32[NB], word_off: bytes i32[NB],
//              packed: bytes u32[W]) -> bytes i32[NE]
// Decodes every block's freq section (fbits==0 -> all 1s). Read-path
// counterpart of pack_blocks (pos_start = cumsum of these freqs).
PyObject* decode_freqs(PyObject*, PyObject* args) {
    Py_buffer cb, dbb, fbb, wob, pb;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*", &cb, &dbb, &fbb, &wob, &pb))
        return nullptr;
    const int32_t* count = static_cast<const int32_t*>(cb.buf);
    const int32_t* dbits = static_cast<const int32_t*>(dbb.buf);
    const int32_t* fbits = static_cast<const int32_t*>(fbb.buf);
    const int32_t* woff = static_cast<const int32_t*>(wob.buf);
    const uint32_t* packed = static_cast<const uint32_t*>(pb.buf);
    size_t NB = static_cast<size_t>(cb.len / 4);
    size_t NE = 0;
    for (size_t b = 0; b < NB; b++) NE += static_cast<size_t>(count[b]);
    std::vector<int32_t> freqs(NE);
    size_t e = 0;
    for (size_t b = 0; b < NB; b++) {
        int c = count[b];
        int fb = fbits[b];
        if (fb == 0) {
            for (int i = 0; i < c; i++) freqs[e + i] = 1;
        } else {
            const uint32_t* fw =
                packed + woff[b] + ((int64_t(c) * dbits[b] + 31) >> 5);
            for (int i = 0; i < c; i++) {
                int64_t bitpos = int64_t(i) * fb;
                uint64_t w = fw[bitpos >> 5];
                int sh = static_cast<int>(bitpos & 31);
                uint64_t v = w >> sh;
                if (sh) v |= static_cast<uint64_t>(fw[(bitpos >> 5) + 1])
                             << (32 - sh);
                freqs[e + i] =
                    static_cast<int32_t>(v & ((uint64_t(1) << fb) - 1));
            }
        }
        e += static_cast<size_t>(c);
    }
    PyBuffer_Release(&cb);
    PyBuffer_Release(&dbb);
    PyBuffer_Release(&fbb);
    PyBuffer_Release(&wob);
    PyBuffer_Release(&pb);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(freqs.data()),
        static_cast<Py_ssize_t>(freqs.size() * 4));
}

// positions_from_deltas(lo: bytes u8[NP], hi: bytes u8[NP],
//                       freqs: bytes i32[NE]) -> bytes i32[NP]
// Rebuild absolute positions from per-entry deltas (first-of-entry is
// the absolute position; byte-plane split u16 deltas).
PyObject* positions_from_deltas(PyObject*, PyObject* args) {
    Py_buffer lob, hib, fqb;
    if (!PyArg_ParseTuple(args, "y*y*y*", &lob, &hib, &fqb)) return nullptr;
    const uint8_t* lo = static_cast<const uint8_t*>(lob.buf);
    const uint8_t* hi = static_cast<const uint8_t*>(hib.buf);
    const int32_t* freqs = static_cast<const int32_t*>(fqb.buf);
    size_t NP = static_cast<size_t>(lob.len);
    size_t NE = static_cast<size_t>(fqb.len / 4);
    std::vector<int32_t> pos(NP);
    size_t i = 0;
    for (size_t e = 0; e < NE; e++) {
        int32_t cur = 0;
        for (int32_t j = 0; j < freqs[e]; j++, i++) {
            int32_t d = static_cast<int32_t>(lo[i]) |
                        (static_cast<int32_t>(hi[i]) << 8);
            cur = (j == 0) ? d : cur + d;
            pos[i] = cur;
        }
    }
    PyBuffer_Release(&lob);
    PyBuffer_Release(&hib);
    PyBuffer_Release(&fqb);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(pos.data()),
        static_cast<Py_ssize_t>(pos.size() * 4));
}

// ---------------------------------------------------------------------
// Bulk (vectorized) index build: token sampling + postings inversion
// ---------------------------------------------------------------------
//
// The reference ingests 10M synthetic docs in minutes on a 64-vCPU box
// (benchmarks/java/ScaleBenchmark, RUN_SCALE_TEST.sh); this host has ONE
// core, so the per-document Python loop (~600 docs/s at 10M) is replaced
// by a columnar build: sample the whole token stream, invert it with a
// counting sort, and feed the CSR straight to pack_blocks. SURVEY.md
// section 7 step 2 ("index builder -> packed artifacts, segmented sort").

struct SplitMix64 {
    uint64_t s;
    explicit SplitMix64(uint64_t seed) : s(seed) {}
    uint64_t next() {
        uint64_t z = (s += 0x9E3779B97F4A7C15ull);
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
        return z ^ (z >> 31);
    }
    double next_double() {  // uniform [0, 1)
        return static_cast<double>(next() >> 11) * 0x1.0p-53;
    }
    // uniform integer in [0, n) (n < 2^32; modulo bias negligible here)
    uint32_t next_below(uint32_t n) {
        return static_cast<uint32_t>(next() % n);
    }
};

// Walker alias table for O(1) categorical sampling from `probs`.
struct AliasTable {
    std::vector<double> prob;    // acceptance threshold per bucket
    std::vector<int32_t> alias;  // fallback bucket

    explicit AliasTable(const double* p, size_t n) : prob(n), alias(n) {
        std::vector<double> scaled(n);
        double sum = 0.0;
        for (size_t i = 0; i < n; i++) sum += p[i];
        std::vector<int32_t> small, large;
        small.reserve(n);
        large.reserve(n);
        for (size_t i = 0; i < n; i++) {
            scaled[i] = p[i] / sum * static_cast<double>(n);
            (scaled[i] < 1.0 ? small : large).push_back(
                static_cast<int32_t>(i));
        }
        while (!small.empty() && !large.empty()) {
            int32_t s = small.back(); small.pop_back();
            int32_t l = large.back(); large.pop_back();
            prob[s] = scaled[s];
            alias[s] = l;
            scaled[l] = (scaled[l] + scaled[s]) - 1.0;
            (scaled[l] < 1.0 ? small : large).push_back(l);
        }
        for (int32_t s : small) { prob[s] = 1.0; alias[s] = s; }
        for (int32_t l : large) { prob[l] = 1.0; alias[l] = l; }
    }

    int32_t sample(SplitMix64& rng, size_t n) const {
        uint32_t b = rng.next_below(static_cast<uint32_t>(n));
        return rng.next_double() < prob[b] ? static_cast<int32_t>(b)
                                           : alias[b];
    }
};

// synth_tokens(num_docs, seed, probs: bytes f64[V], len_kind, len_a,
//              len_b, min_len, phrase_flat: bytes i32, phrase_start:
//              bytes i32[P+1], phrase_prob, remap: bytes i32[V] or b"")
//   -> (doc_len: bytes i32[N], token_ids: bytes i32[sum(doc_len)])
//
// len_kind 0: lognormal(mu=len_a, sigma=len_b) clamped to >= min_len;
// len_kind 1: uniform integer in [len_a, len_b). With probability
// phrase_prob a document gets 1-3 occurrences of one phrase (benchmark
// bigrams) written at random offsets. Token ids are remapped through
// `remap` (rank-space -> sorted-term-space) before return.
PyObject* synth_tokens(PyObject*, PyObject* args) {
    long num_docs, min_len;
    unsigned long long seed;
    Py_buffer probs_b, pflat_b, pstart_b, remap_b;
    int len_kind;
    double len_a, len_b, phrase_prob;
    if (!PyArg_ParseTuple(args, "lKy*iddly*y*dy*", &num_docs, &seed,
                          &probs_b, &len_kind, &len_a, &len_b, &min_len,
                          &pflat_b, &pstart_b, &phrase_prob, &remap_b))
        return nullptr;
    const double* probs = static_cast<const double*>(probs_b.buf);
    size_t V = static_cast<size_t>(probs_b.len / 8);
    const int32_t* pflat = static_cast<const int32_t*>(pflat_b.buf);
    const int32_t* pstart = static_cast<const int32_t*>(pstart_b.buf);
    size_t n_phrases =
        pstart_b.len >= 8 ? static_cast<size_t>(pstart_b.len / 4) - 1 : 0;
    const int32_t* remap = remap_b.len > 0
                               ? static_cast<const int32_t*>(remap_b.buf)
                               : nullptr;

    AliasTable alias(probs, V);
    SplitMix64 rng(seed);

    std::vector<int32_t> doc_len(static_cast<size_t>(num_docs));
    std::vector<int32_t> tokens;
    double mean_est = len_kind == 0 ? std::exp(len_a + len_b * len_b / 2.0)
                                    : (len_a + len_b) / 2.0;
    tokens.reserve(static_cast<size_t>(num_docs * mean_est * 1.05) + 1024);

    for (long d = 0; d < num_docs; d++) {
        long L;
        if (len_kind == 0) {
            // Box-Muller normal -> lognormal
            double u1 = rng.next_double(), u2 = rng.next_double();
            if (u1 < 1e-300) u1 = 1e-300;
            double z = std::sqrt(-2.0 * std::log(u1)) *
                       std::cos(6.283185307179586 * u2);
            L = static_cast<long>(std::exp(len_a + len_b * z));
        } else {
            L = static_cast<long>(len_a) +
                static_cast<long>(rng.next_below(
                    static_cast<uint32_t>(len_b - len_a)));
        }
        if (L < min_len) L = min_len;
        if (L > 60000) L = 60000;  // keep positions < 2^16 (disk format)
        doc_len[static_cast<size_t>(d)] = static_cast<int32_t>(L);
        size_t base = tokens.size();
        tokens.resize(base + static_cast<size_t>(L));
        for (long j = 0; j < L; j++)
            tokens[base + static_cast<size_t>(j)] = alias.sample(rng, V);
        if (n_phrases > 0 && rng.next_double() < phrase_prob) {
            const int32_t pi = static_cast<int32_t>(
                rng.next_below(static_cast<uint32_t>(n_phrases)));
            int32_t ps = pstart[pi], pe = pstart[pi + 1];
            long plen = pe - ps;
            long n_occ = 1 + static_cast<long>(rng.next_below(3));
            for (long o = 0; o < n_occ; o++) {
                if (L > plen + 1) {
                    long off = static_cast<long>(rng.next_below(
                        static_cast<uint32_t>(L - plen)));
                    for (long j = 0; j < plen; j++)
                        tokens[base + static_cast<size_t>(off + j)] =
                            pflat[ps + j];
                }
            }
        }
    }
    if (remap)
        for (size_t i = 0; i < tokens.size(); i++)
            tokens[i] = remap[tokens[i]];

    PyBuffer_Release(&probs_b);
    PyBuffer_Release(&pflat_b);
    PyBuffer_Release(&pstart_b);
    PyBuffer_Release(&remap_b);

    auto mk = [](const void* data, size_t nbytes) {
        return PyBytes_FromStringAndSize(
            static_cast<const char*>(data), static_cast<Py_ssize_t>(nbytes));
    };
    return Py_BuildValue("(NN)", mk(doc_len.data(), doc_len.size() * 4),
                         mk(tokens.data(), tokens.size() * 4));
}

// invert_tokens(doc_len: bytes i32[N], token_ids: bytes i32[T],
//               vocab_size, with_positions)
//   -> (entry_start: bytes i64[V+1], docs: bytes i32[NE],
//       freqs: bytes i32[NE], positions: bytes i32[T] or b"")
//
// Counting sort of the doc-major token stream into term-major postings:
// histogram -> per-term regions -> scatter (doc, pos) -> per-region RLE
// into (doc, freq) entries. Because the scan is doc-major/pos-major,
// each term region comes out sorted by (doc, pos), and the scattered
// position array IS the flat per-entry positions CSR (pos_start =
// cumsum(freqs), computed by the caller). Terms with zero occurrences
// get empty entry ranges (callers pass a dense vocab).
PyObject* invert_tokens(PyObject*, PyObject* args) {
    Py_buffer dl_b, tok_b;
    long vocab_size;
    int with_positions;
    if (!PyArg_ParseTuple(args, "y*y*lp", &dl_b, &tok_b, &vocab_size,
                          &with_positions))
        return nullptr;
    const int32_t* doc_len = static_cast<const int32_t*>(dl_b.buf);
    const int32_t* tok = static_cast<const int32_t*>(tok_b.buf);
    size_t N = static_cast<size_t>(dl_b.len / 4);
    size_t T = static_cast<size_t>(tok_b.len / 4);
    size_t V = static_cast<size_t>(vocab_size);

    // pass 1: histogram -> per-term token regions
    std::vector<int64_t> tok_off(V + 1, 0);
    for (size_t i = 0; i < T; i++) tok_off[tok[i] + 1]++;
    for (size_t v = 0; v < V; v++) tok_off[v + 1] += tok_off[v];

    // pass 2: scatter (doc, pos) into term regions (doc-major scan keeps
    // each region sorted); cursors fit L2 so hot-term writes stream
    std::vector<int32_t> doc_sc(T);
    std::vector<int32_t> pos_sc(with_positions ? T : 0);
    {
        std::vector<int64_t> cur(tok_off.begin(), tok_off.end() - 1);
        size_t i = 0;
        for (size_t d = 0; d < N; d++) {
            int32_t L = doc_len[d];
            for (int32_t p = 0; p < L; p++, i++) {
                int64_t slot = cur[tok[i]]++;
                doc_sc[static_cast<size_t>(slot)] = static_cast<int32_t>(d);
                if (with_positions)
                    pos_sc[static_cast<size_t>(slot)] = p;
            }
        }
    }

    // pass 3: count (term, doc) entries per term
    std::vector<int64_t> entry_start(V + 1, 0);
    for (size_t v = 0; v < V; v++) {
        int64_t s = tok_off[v], e = tok_off[v + 1];
        int64_t ne = 0;
        int32_t prev = -1;
        for (int64_t j = s; j < e; j++) {
            if (doc_sc[static_cast<size_t>(j)] != prev) {
                ne++;
                prev = doc_sc[static_cast<size_t>(j)];
            }
        }
        entry_start[v + 1] = entry_start[v] + ne;
    }
    size_t NE = static_cast<size_t>(entry_start[V]);

    // pass 4: emit (doc, freq) runs
    std::vector<int32_t> docs(NE), freqs(NE);
    {
        size_t e = 0;
        for (size_t v = 0; v < V; v++) {
            int64_t s = tok_off[v], end = tok_off[v + 1];
            int32_t prev = -1;
            for (int64_t j = s; j < end; j++) {
                int32_t d = doc_sc[static_cast<size_t>(j)];
                if (d != prev) {
                    docs[e] = d;
                    freqs[e] = 1;
                    e++;
                    prev = d;
                } else {
                    freqs[e - 1]++;
                }
            }
        }
    }

    PyBuffer_Release(&dl_b);
    PyBuffer_Release(&tok_b);

    auto mk = [](const void* data, size_t nbytes) {
        return PyBytes_FromStringAndSize(
            static_cast<const char*>(data), static_cast<Py_ssize_t>(nbytes));
    };
    return Py_BuildValue(
        "(NNNN)", mk(entry_start.data(), entry_start.size() * 8),
        mk(docs.data(), docs.size() * 4), mk(freqs.data(), freqs.size() * 4),
        mk(pos_sc.data(), pos_sc.size() * 4));
}

// ---- LZ4 block format (reference compression/CompressionCodecs.h
// LZ4Codec role, which wraps liblz4 behind HAVE_LZ4). liblz4 is not in
// this image, so the block format is implemented here from its public
// spec: sequences of [token][lit-ext*][literals][offset LE16][match-ext*],
// token = (lit_len<<4)|(match_len-4) with 15 -> 255-run extension bytes,
// matches are >= 4 bytes at offsets <= 65535, the final sequence is
// literals-only, the last 5 bytes are always literals, and the last
// match starts >= 12 bytes before the end. ----

constexpr size_t LZ4_MINMATCH = 4;

inline uint32_t lz4_load32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint32_t lz4_hash(uint32_t seq) {
    return (seq * 2654435761u) >> 16;  // 16-bit bucket
}

void lz4_emit_len(std::vector<uint8_t>& out, size_t rest) {
    for (; rest >= 255; rest -= 255) out.push_back(255);
    out.push_back(static_cast<uint8_t>(rest));
}

// lz4_compress(data: bytes) -> bytes (raw LZ4 block)
PyObject* lz4_compress_fn(PyObject*, PyObject* arg) {
    Py_buffer buf;
    if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) < 0) return nullptr;
    const uint8_t* src = static_cast<const uint8_t*>(buf.buf);
    const size_t n = static_cast<size_t>(buf.len);
    std::vector<uint8_t> out;
    out.reserve(n + n / 128 + 16);
    std::vector<uint32_t> table(1u << 16, 0);  // position + 1; 0 = empty

    auto emit_seq = [&](size_t anchor, size_t ip, size_t mlen,
                        size_t offset) {
        const size_t lit = ip - anchor;
        const size_t mrest = mlen - LZ4_MINMATCH;
        out.push_back(static_cast<uint8_t>(
            (std::min<size_t>(lit, 15) << 4) | std::min<size_t>(mrest, 15)));
        if (lit >= 15) lz4_emit_len(out, lit - 15);
        out.insert(out.end(), src + anchor, src + anchor + lit);
        out.push_back(static_cast<uint8_t>(offset & 0xFF));
        out.push_back(static_cast<uint8_t>(offset >> 8));
        if (mrest >= 15) lz4_emit_len(out, mrest - 15);
    };

    size_t anchor = 0;
    if (n > 12) {
        const size_t mflimit = n - 12;   // last match starts before this
        const size_t matchlimit = n - 5; // last 5 bytes stay literal
        size_t ip = 0;
        while (ip < mflimit) {
            const uint32_t seq = lz4_load32(src + ip);
            const uint32_t h = lz4_hash(seq);
            const uint32_t cand = table[h];
            table[h] = static_cast<uint32_t>(ip + 1);
            if (cand != 0 && ip + 1 - cand <= 65535 &&
                lz4_load32(src + (cand - 1)) == seq) {
                size_t mpos = cand - 1;
                size_t mlen = LZ4_MINMATCH;
                while (ip + mlen < matchlimit &&
                       src[mpos + mlen] == src[ip + mlen])
                    mlen++;
                // fold preceding literals into the match where they agree
                while (ip > anchor && mpos > 0 &&
                       src[ip - 1] == src[mpos - 1]) {
                    ip--; mpos--; mlen++;
                }
                emit_seq(anchor, ip, mlen, ip - mpos);
                ip += mlen;
                anchor = ip;
            } else {
                ip++;
            }
        }
    }
    // final literals-only sequence (no offset follows, per the spec)
    const size_t lit = n - anchor;
    out.push_back(static_cast<uint8_t>(std::min<size_t>(lit, 15) << 4));
    if (lit >= 15) lz4_emit_len(out, lit - 15);
    out.insert(out.end(), src + anchor, src + n);
    PyBuffer_Release(&buf);
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
}

// lz4_decompress(block: bytes, out_size: int) -> bytes
PyObject* lz4_decompress_fn(PyObject*, PyObject* args) {
    Py_buffer buf;
    Py_ssize_t out_size;
    if (!PyArg_ParseTuple(args, "y*n", &buf, &out_size)) return nullptr;
    const uint8_t* src = static_cast<const uint8_t*>(buf.buf);
    const size_t n = static_cast<size_t>(buf.len);
    std::vector<uint8_t> out;
    out.reserve(static_cast<size_t>(out_size));
    size_t ip = 0;
    bool ok = true;
    auto read_len = [&](size_t base) -> size_t {
        size_t len = base;
        if (base == 15) {
            uint8_t b;
            do {
                if (ip >= n) { ok = false; return len; }
                b = src[ip++];
                len += b;
            } while (b == 255);
        }
        return len;
    };
    while (ip < n && ok) {
        const uint8_t token = src[ip++];
        const size_t lit = read_len(token >> 4);
        if (!ok || ip + lit > n) { ok = false; break; }
        out.insert(out.end(), src + ip, src + ip + lit);
        ip += lit;
        if (ip >= n) break;  // literals-only final sequence
        if (ip + 2 > n) { ok = false; break; }
        const size_t offset = src[ip] | (static_cast<size_t>(src[ip + 1]) << 8);
        ip += 2;
        if (offset == 0 || offset > out.size()) { ok = false; break; }
        const size_t mlen = read_len(token & 0x0F) + LZ4_MINMATCH;
        if (!ok) break;
        size_t from = out.size() - offset;
        for (size_t i = 0; i < mlen; i++)  // overlap-safe byte copy
            out.push_back(out[from + i]);
    }
    PyBuffer_Release(&buf);
    if (!ok || out.size() != static_cast<size_t>(out_size)) {
        PyErr_Format(PyExc_ValueError,
                     "lz4_decompress: corrupt block (got %zu of %zd bytes)",
                     out.size(), out_size);
        return nullptr;
    }
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
}

PyMethodDef module_methods[] = {
    {"lz4_compress", lz4_compress_fn, METH_O,
     "compress bytes into one raw LZ4 block"},
    {"lz4_decompress", lz4_decompress_fn, METH_VARARGS,
     "decompress one raw LZ4 block given the decoded size"},
    {"standard_tokenize_ascii", standard_tokenize_ascii, METH_O,
     "ASCII StandardTokenizer (alnum runs + apostrophes, lowercased)"},
    {"synth_tokens", synth_tokens, METH_VARARGS,
     "sample a synthetic token stream (alias-method categorical)"},
    {"invert_tokens", invert_tokens, METH_VARARGS,
     "counting-sort a doc-major token stream into CSR postings"},
    {"pack_blocks", pack_blocks, METH_VARARGS,
     "CSR postings -> bit-packed 128-doc block arrays"},
    {"pack_bits", pack_bits_fn, METH_VARARGS,
     "bit-pack int32 values at a fixed width (pack_u32 layout)"},
    {"decode_freqs", decode_freqs, METH_VARARGS,
     "decode every block's freq section -> i32[NE]"},
    {"positions_from_deltas", positions_from_deltas, METH_VARARGS,
     "rebuild absolute positions from byte-plane u16 entry deltas"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef native_module = {
    PyModuleDef_HEAD_INIT, "_native",
    "diagon_tpu native host tier (tokenizer + postings accumulator)", -1,
    module_methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
    FreqProxType.tp_dealloc =
        reinterpret_cast<destructor>(FreqProx_dealloc);
    FreqProxType.tp_flags = Py_TPFLAGS_DEFAULT;
    FreqProxType.tp_methods = FreqProx_methods;
    FreqProxType.tp_new = FreqProx_new;
    if (PyType_Ready(&FreqProxType) < 0) return nullptr;

    PyObject* m = PyModule_Create(&native_module);
    if (!m) return nullptr;
    Py_INCREF(&FreqProxType);
    if (PyModule_AddObject(m, "FreqProx",
                           reinterpret_cast<PyObject*>(&FreqProxType)) < 0) {
        Py_DECREF(&FreqProxType);
        Py_DECREF(m);
        return nullptr;
    }
    return m;
}
