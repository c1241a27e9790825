/* Optional C kernel for the token-level Myers diff.
 *
 * EXACTLY the algorithm of functions/diffs.py:_diff_ints /
 * _middle_snake (linear-space middle-snake divide & conquer over
 * dictionary-encoded int tokens, written from E. Myers, "An O(ND)
 * Difference Algorithm and Its Variations", Algorithmica 1986), with
 * the same tie-breaks, the same first-overlap return order, and the
 * same deterministic _MAX_D effort cap — so its output ranges are
 * byte-identical to the pure-Python path (fuzz-asserted in
 * tests/test_diffs.py).  The Python implementation remains the
 * reference and the fallback; this kernel only removes the
 * O(D^2)-iteration interpreter overhead that dominates markup-dense
 * corpora.  Compiled on demand by functions/native.py via the system
 * toolchain; never required.
 *
 * No code from the reference repo (which vendors diff-match-patch) is
 * used here.
 */

#include <stdint.h>
#include <string.h>

#define ACT_DELETE (-1)
#define ACT_EQUAL 0
#define ACT_INSERT 1

typedef struct {
    int32_t *out;   /* triples: act, i0, i1 */
    int32_t cap;    /* max triples */
    int32_t len;    /* triples written */
    int32_t ovf;    /* overflow flag */
} emit_t;

static void emit(emit_t *e, int32_t act, int32_t i0, int32_t i1) {
    if (e->len >= e->cap) { e->ovf = 1; return; }
    int32_t *p = e->out + 3 * (int64_t)e->len;
    p[0] = act; p[1] = i0; p[2] = i1;
    e->len++;
}

/* middle snake search; returns 1 and sets (*sx, *sy) when found, 0 when
 * the effort cap was hit (Python returns None), -1 on the unreachable
 * malformed-input case (Python raises). */
static int middle_snake(const int32_t *a, int32_t a0, int32_t a1,
                        const int32_t *b, int32_t b0, int32_t b1,
                        int32_t max_d_cap, int32_t *vf, int32_t *vb,
                        int32_t *sx, int32_t *sy) {
    int32_t n = a1 - a0, m = b1 - b0;
    int32_t max_d = (n + m + 1) / 2;
    int capped = max_d > max_d_cap;
    if (capped) max_d = max_d_cap;
    int32_t delta = n - m;
    int32_t size = 2 * max_d + 2;
    int32_t off = max_d;
    memset(vf, 0, (size_t)size * sizeof(int32_t));
    memset(vb, 0, (size_t)size * sizeof(int32_t));
    int odd = (delta & 1) != 0;
    for (int32_t d = 0; d <= max_d; d++) {
        for (int32_t k = -d; k <= d; k += 2) {
            int32_t ko = k + off;
            int32_t x;
            if (k == -d || (k != d && vf[ko - 1] < vf[ko + 1]))
                x = vf[ko + 1];
            else
                x = vf[ko - 1] + 1;
            int32_t y = x - k;
            while (x < n && y < m && a[a0 + x] == b[b0 + y]) { x++; y++; }
            vf[ko] = x;
            if (odd && k - delta >= -(d - 1) && k - delta <= d - 1) {
                if (x + vb[delta - k + off] >= n) {
                    *sx = a0 + x; *sy = b0 + y;
                    return 1;
                }
            }
        }
        for (int32_t k = -d; k <= d; k += 2) {
            int32_t ko = k + off;
            int32_t x;
            if (k == -d || (k != d && vb[ko - 1] < vb[ko + 1]))
                x = vb[ko + 1];
            else
                x = vb[ko - 1] + 1;
            int32_t y = x - k;
            while (x < n && y < m && a[a1 - 1 - x] == b[b1 - 1 - y]) { x++; y++; }
            vb[ko] = x;
            if (!odd && delta - k >= -d && delta - k <= d) {
                if (x + vf[delta - k + off] >= n) {
                    *sx = a1 - x; *sy = b1 - y;
                    return 1;
                }
            }
        }
    }
    return capped ? 0 : -1;
}

static int diff_rec(const int32_t *a, int32_t a0, int32_t a1,
                    const int32_t *b, int32_t b0, int32_t b1,
                    int32_t max_d_cap, int32_t *vf, int32_t *vb, emit_t *e) {
    /* strip common prefix/suffix (Python's _run_fwd/_run_back — the
     * chunked slice tricks exist only to reach C speed from Python;
     * here a plain loop IS that speed and computes the same maximal
     * run lengths) */
    int32_t p0 = a0;
    while (a0 < a1 && b0 < b1 && a[a0] == b[b0]) { a0++; b0++; }
    if (a0 > p0) emit(e, ACT_EQUAL, p0, a0);
    int32_t s1 = a1;
    while (a1 > a0 && b1 > b0 && a[a1 - 1] == b[b1 - 1]) { a1--; b1--; }
    int has_suffix = s1 > a1;
    if (a0 == a1) {
        if (b0 != b1) emit(e, ACT_INSERT, b0, b1);
    } else if (b0 == b1) {
        emit(e, ACT_DELETE, a0, a1);
    } else {
        int32_t x, y;
        int r = middle_snake(a, a0, a1, b, b0, b1, max_d_cap, vf, vb, &x, &y);
        if (r < 0) return -1;
        if (r == 0 || (x == a0 && y == b0) || (x == a1 && y == b1)) {
            emit(e, ACT_DELETE, a0, a1);
            emit(e, ACT_INSERT, b0, b1);
        } else {
            if (diff_rec(a, a0, x, b, b0, y, max_d_cap, vf, vb, e) < 0)
                return -1;
            if (diff_rec(a, x, a1, b, y, b1, max_d_cap, vf, vb, e) < 0)
                return -1;
        }
    }
    if (has_suffix) emit(e, ACT_EQUAL, a1, s1);
    return 0;
}

/* Entry point.  out must hold 3*out_cap int32s.  Returns the number of
 * (act, i0, i1) triples written, or -1 on output overflow / internal
 * error (caller falls back to the Python path).  vf/vb scratch must
 * hold 2*max_d_cap+2 int32s each; pass max_d_cap == Python _MAX_D. */
int wh_diff_ints(const int32_t *a, int32_t n, const int32_t *b, int32_t m,
                 int32_t max_d_cap, int32_t *vf, int32_t *vb,
                 int32_t *out, int32_t out_cap) {
    emit_t e = {out, out_cap, 0, 0};
    if (n < 0 || m < 0 || max_d_cap <= 0) return -1;
    if (diff_rec(a, 0, n, b, 0, m, max_d_cap, vf, vb, &e) < 0) return -1;
    if (e.ovf) return -1;
    return e.len;
}
