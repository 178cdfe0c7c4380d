// Fast Amber prmtop section parser.
//
// Native analog of the hot host-side loader path (models/amber.py
// parse_prmtop): the reference delegates topology parsing to
// openmm.app.AmberPrmtopFile (C++-backed); here a small C++ library parses
// the %FLAG/%FORMAT sectioned fixed-width format directly into flat
// arrays, exposed through a C ABI consumed via ctypes (no pybind11 in this
// image). The Python implementation remains the fallback and the oracle.
//
// Format reference: Amber file formats specification (public), e.g.
//   %FLAG POINTERS
//   %FORMAT(10I8)
//   <fixed-width records...>
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Section {
    int kind = -1;          // 0 = int, 1 = double, 2 = string
    int width = 0;          // field width for strings
    std::vector<long long> ints;
    std::vector<double> doubles;
    std::string strings;    // concatenated fixed-width fields
    long long n_strings = 0;
};

struct Prmtop {
    std::unordered_map<std::string, Section> sections;
};

// parse "%FORMAT(20a4)" / "(10I8)" / "(5E16.8)" -> (kind, width)
bool parse_format(const char* fmt, int* kind, int* width) {
    const char* p = strchr(fmt, '(');
    if (!p) return false;
    ++p;
    while (*p && isdigit(*p)) ++p;  // repeat count
    char c = tolower(*p);
    ++p;
    int w = atoi(p);
    if (c == 'i') { *kind = 0; }
    else if (c == 'e' || c == 'f' || c == 'g') { *kind = 1; }
    else if (c == 'a') { *kind = 2; }
    else return false;
    *width = w > 0 ? w : 80;
    return true;
}

void parse_data_line(Section& sec, const char* line, size_t len) {
    // strip trailing newline/CR
    while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) --len;
    if (sec.kind == 2) {
        for (size_t off = 0; off < len; off += sec.width) {
            size_t n = len - off < (size_t)sec.width ? len - off
                                                     : (size_t)sec.width;
            std::string field(line + off, n);
            field.resize(sec.width, ' ');
            sec.strings += field;
            ++sec.n_strings;
        }
        return;
    }
    // numeric: whitespace-separated tokens (fixed width but strtod skips
    // leading spaces, and Amber always space-separates numeric fields)
    const char* p = line;
    const char* end = line + len;
    char* next = nullptr;
    while (p < end) {
        while (p < end && isspace(*p)) ++p;
        if (p >= end) break;
        if (sec.kind == 0) {
            long long v = strtoll(p, &next, 10);
            if (next == p) break;
            sec.ints.push_back(v);
        } else {
            double v = strtod(p, &next);
            if (next == p) break;
            sec.doubles.push_back(v);
        }
        p = next;
    }
}

}  // namespace

extern "C" {

void* prmtop_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* top = new Prmtop();
    char* line = nullptr;
    size_t cap = 0;
    ssize_t n;
    Section* current = nullptr;
    std::string flag;
    while ((n = getline(&line, &cap, f)) >= 0) {
        if (line[0] == '%') {
            if (!strncmp(line, "%FLAG", 5)) {
                const char* p = line + 5;
                while (*p && isspace(*p)) ++p;
                const char* q = p;
                while (*q && !isspace(*q)) ++q;
                flag.assign(p, q - p);
                current = &top->sections[flag];
            } else if (!strncmp(line, "%FORMAT", 7) && current) {
                parse_format(line, &current->kind, &current->width);
            }
            // %VERSION / %COMMENT ignored
            continue;
        }
        if (current && current->kind >= 0)
            parse_data_line(*current, line, (size_t)n);
    }
    free(line);
    fclose(f);
    return top;
}

void prmtop_close(void* h) { delete static_cast<Prmtop*>(h); }

// kind: 0 int, 1 double, 2 string; -1 = missing
int prmtop_section_kind(void* h, const char* flag) {
    auto& secs = static_cast<Prmtop*>(h)->sections;
    auto it = secs.find(flag);
    return it == secs.end() ? -1 : it->second.kind;
}

long long prmtop_section_len(void* h, const char* flag) {
    auto& secs = static_cast<Prmtop*>(h)->sections;
    auto it = secs.find(flag);
    if (it == secs.end()) return 0;
    const Section& s = it->second;
    if (s.kind == 0) return (long long)s.ints.size();
    if (s.kind == 1) return (long long)s.doubles.size();
    return s.n_strings;
}

int prmtop_string_width(void* h, const char* flag) {
    auto& secs = static_cast<Prmtop*>(h)->sections;
    auto it = secs.find(flag);
    return it == secs.end() ? 0 : it->second.width;
}

long long prmtop_n_sections(void* h) {
    return (long long)static_cast<Prmtop*>(h)->sections.size();
}

// iterate section names: copies name idx into buf (<=127 chars)
void prmtop_section_name(void* h, long long idx, char* buf) {
    auto& secs = static_cast<Prmtop*>(h)->sections;
    long long i = 0;
    for (auto& kv : secs) {
        if (i++ == idx) {
            strncpy(buf, kv.first.c_str(), 127);
            buf[127] = 0;
            return;
        }
    }
    buf[0] = 0;
}

void prmtop_copy_longs(void* h, const char* flag, long long* out) {
    auto& s = static_cast<Prmtop*>(h)->sections[flag];
    memcpy(out, s.ints.data(), s.ints.size() * sizeof(long long));
}

void prmtop_copy_doubles(void* h, const char* flag, double* out) {
    auto& s = static_cast<Prmtop*>(h)->sections[flag];
    memcpy(out, s.doubles.data(), s.doubles.size() * sizeof(double));
}

void prmtop_copy_strings(void* h, const char* flag, char* out) {
    auto& s = static_cast<Prmtop*>(h)->sections[flag];
    memcpy(out, s.strings.data(), s.strings.size());
}

}  // extern "C"
