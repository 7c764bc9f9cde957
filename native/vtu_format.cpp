// Fast ASCII table formatter for VTU/PVTU output.
//
// The reference's output path (src/output.c) is native C writing
// tab-separated %e tables per rank; Python's per-value "%e" formatting is
// ~20x slower and dominates VTU wall-clock at production grid sizes.  This
// tiny library formats a (rows x cols) double/int table into a caller-
// provided byte buffer using the same printf formats as the reference
// (%01.6e for points/displ, %e for strain/stress, %f for cost, %d ints).
//
// Exposed C ABI (loaded via ctypes from macroc_tpu/io/native.py):
//   long format_doubles(const double* vals, long rows, long cols,
//                       const char* fmt, int row_newline,
//                       char* out, long cap);
//   long format_longs(const long long* vals, long rows, long cols,
//                     const char* fmt, int row_newline, char* out, long cap);
// Both return the number of bytes written, or -1 if `cap` was too small
// (caller retries with a larger buffer).

#include <cstdio>
#include <cstring>

extern "C" {

long format_doubles(const double* vals, long rows, long cols,
                    const char* fmt, int row_newline, char* out, long cap) {
    char* p = out;
    char* end = out + cap;
    for (long r = 0; r < rows; ++r) {
        for (long c = 0; c < cols; ++c) {
            if (end - p < 64) return -1;
            int n = snprintf(p, (size_t)(end - p), fmt, vals[r * cols + c]);
            if (n < 0) return -1;
            p += n;
            *p++ = '\t';
        }
        if (row_newline) {
            // replace the trailing tab with newline (matches the
            // reference's "%e\t...%e\n" row layout for 3/6-wide tables)
            p[-1] = '\n';
        }
    }
    return (long)(p - out);
}

long format_longs(const long long* vals, long rows, long cols,
                  const char* fmt, int row_newline, char* out, long cap) {
    char* p = out;
    char* end = out + cap;
    for (long r = 0; r < rows; ++r) {
        for (long c = 0; c < cols; ++c) {
            if (end - p < 32) return -1;
            int k = snprintf(p, (size_t)(end - p), fmt, vals[r * cols + c]);
            if (k < 0) return -1;
            p += k;
            *p++ = '\t';
        }
        if (row_newline) p[-1] = '\n';
    }
    return (long)(p - out);
}

}  // extern "C"
