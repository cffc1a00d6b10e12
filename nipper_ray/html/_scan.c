/* Byte-space HTML macro-tokenizer: the data/tag/comment/doctype scanner
 * hot path, compiled at runtime (see cscan.py) and driven from
 * ctokenizer.py over the UTF-8 encoding of the document.
 *
 * Contract (mirrors tokenizer.py, the pure-Python reference
 * implementation — the differential test pins them identical):
 *   - scans from `pos`, APPENDING flat int32 records to `out` until the
 *     buffer fills, EOF, or a construct Python must arbitrate;
 *   - all offsets are byte offsets into `s`; every span boundary falls
 *     on an ASCII delimiter, so slicing the byte string at record
 *     offsets and UTF-8-decoding the slice is exact;
 *   - a start tag whose (case-folded) name can switch the tokenizer
 *     into a raw mode (script/style/title/...) is always the LAST
 *     record of a call, so the sink's synchronous set_raw contract is
 *     preserved by re-entering after dispatch;
 *   - <![CDATA[ needs the sink's foreign-content flag: the scanner
 *     stops AT the '<' (REASON_CDATA) and Python decides.
 *
 * Record layouts (int32 each):
 *   TEXT     0, start, end, has_amp
 *   START    1, name_start, name_end, self_closing, n_attrs,
 *            then per attr: a_start, a_end, v_start, v_end, v_has_amp
 *            (v_start = -1: attribute without a value)
 *   END      2, name_start, name_end
 *   COMMENT  3, start, end
 *   DOCTYPE  4, name_start, name_end
 *   BOGUS    5, start, end          (parse_error + comment in Python)
 *   LT       6                      (emit a literal "<" character)
 */
#define _GNU_SOURCE
#include <stdint.h>
#include <string.h>

#define R_TEXT 0
#define R_START 1
#define R_END 2
#define R_COMMENT 3
#define R_DOCTYPE 4
#define R_BOGUS 5
#define R_LT 6

#define REASON_EOF 0
#define REASON_RAW 1
#define REASON_CDATA 2
#define REASON_BUF 3
#define REASON_BAIL 4

static int is_ws(uint8_t c) { return c == '\t' || c == '\n' || c == '\f' || c == ' '; }
static uint8_t lc(uint8_t c) { return (c >= 'A' && c <= 'Z') ? (uint8_t)(c + 32) : c; }
static int is_alpha(uint8_t c) { return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'); }
/* attribute name chars: [^\t\n\f /=>] ; unquoted value: [^\t\n\f >] */
static int attr_name_ch(uint8_t c) { return !(is_ws(c) || c == '/' || c == '=' || c == '>'); }
static int unquoted_ch(uint8_t c) { return !(is_ws(c) || c == '>'); }

/* start tags that may switch the tokenizer into a raw mode (the sink
 * decides; the scanner only guarantees they terminate a call) */
static const char *RAW_TAGS[] = {"title", "textarea", "style", "xmp",
    "iframe", "noembed", "noframes", "noscript", "script", "plaintext", 0};

static int is_raw_tag(const uint8_t *s, int64_t a, int64_t b)
{
    int64_t len = b - a, i;
    int t;
    if (len < 3 || len > 9)
        return 0;
    for (t = 0; RAW_TAGS[t]; t++) {
        const char *name = RAW_TAGS[t];
        if ((int64_t)strlen(name) != len)
            continue;
        for (i = 0; i < len; i++)
            if (lc(s[a + i]) != (uint8_t)name[i])
                break;
        if (i == len)
            return 1;
    }
    return 0;
}

/* Scan one tag; name_start points at the first (ASCII letter) name char.
 * Writes one record at out[*w] on success and returns the new position.
 * Returns -1 on EOF-in-tag (whole tag dropped, caller consumes to EOF),
 * -2 when the record does not fit the remaining buffer. */
static int64_t scan_tag(const uint8_t *s, int64_t n, int64_t name_start,
                        int end_tag, int32_t *out, int64_t cap, int64_t *w)
{
    int64_t i = name_start;
    int64_t base = *w, wp, ne;
    int32_t nattrs = 0;
    int self_closing = 0;

    while (i < n && !(is_ws(s[i]) || s[i] == '/' || s[i] == '>'))
        i++;
    ne = i;
    wp = base + (end_tag ? 3 : 5);

    for (;;) {
        uint8_t c;
        int64_t ans, ane, vs = -1, ve = -1;
        int32_t vflag = 0;
        while (i < n && is_ws(s[i]))
            i++;
        if (i >= n)
            return -1;
        c = s[i];
        if (c == '>') { i++; break; }
        if (c == '/') {
            if (i + 1 < n && s[i + 1] == '>') { self_closing = 1; i += 2; break; }
            i++;
            continue;
        }
        ans = i;
        if (c == '=')
            i++;                      /* '=' folds into the name */
        while (i < n && attr_name_ch(s[i]))
            i++;
        ane = i;
        while (i < n && is_ws(s[i]))
            i++;
        if (i < n && s[i] == '=') {
            uint8_t q;
            i++;
            while (i < n && is_ws(s[i]))
                i++;
            if (i >= n)
                return -1;
            q = s[i];
            if (q == '"' || q == '\'') {
                const uint8_t *j = memchr(s + i + 1, q, n - i - 1);
                if (!j)
                    return -1;       /* EOF in quoted value: drop tag */
                vs = i + 1;
                ve = j - s;
                i = ve + 1;
            } else {
                vs = i;
                while (i < n && unquoted_ch(s[i]))
                    i++;
                ve = i;
                if (i >= n)
                    return -1;       /* EOF right after unquoted value */
            }
            if (ve > vs && memchr(s + vs, '&', ve - vs))
                vflag = 1;
        } else if (i >= n) {
            return -1;               /* EOF after attribute name */
        }
        if (!end_tag) {
            if (wp + 5 > cap)
                return -2;
            out[wp] = (int32_t)ans;
            out[wp + 1] = (int32_t)ane;
            out[wp + 2] = (int32_t)vs;
            out[wp + 3] = (int32_t)ve;
            out[wp + 4] = vflag;
            wp += 5;
            nattrs++;
        }
    }
    if (wp > cap || base + (end_tag ? 3 : 5) > cap)
        return -2;
    if (end_tag) {
        out[base] = R_END;
        out[base + 1] = (int32_t)name_start;
        out[base + 2] = (int32_t)ne;
        *w = base + 3;
    } else {
        out[base] = R_START;
        out[base + 1] = (int32_t)name_start;
        out[base + 2] = (int32_t)ne;
        out[base + 3] = self_closing;
        out[base + 4] = nattrs;
        *w = wp;
    }
    return i;
}

static int64_t emit3(int32_t *out, int64_t cap, int64_t *w,
                     int32_t t, int64_t a, int64_t b)
{
    if (*w + 3 > cap)
        return -2;
    out[*w] = t;
    out[*w + 1] = (int32_t)a;
    out[*w + 2] = (int32_t)b;
    *w += 3;
    return 0;
}

static int64_t scan_comment(const uint8_t *s, int64_t n, int64_t start,
                            int32_t *out, int64_t cap, int64_t *w)
{
    const uint8_t *p1, *p2;
    int64_t i1, j1;
    if (start < n && s[start] == '>') {
        if (emit3(out, cap, w, R_COMMENT, start, start) < 0) return -2;
        return start + 1;
    }
    if (start + 1 < n && s[start] == '-' && s[start + 1] == '>') {
        if (emit3(out, cap, w, R_COMMENT, start, start) < 0) return -2;
        return start + 2;
    }
    p1 = memmem(s + start, n - start, "-->", 3);
    p2 = memmem(s + start, n - start, "--!>", 4);
    i1 = p1 ? p1 - s : -1;
    j1 = p2 ? p2 - s : -1;
    if (j1 != -1 && (i1 == -1 || j1 < i1)) {
        if (emit3(out, cap, w, R_COMMENT, start, j1) < 0) return -2;
        return j1 + 4;
    }
    if (i1 != -1) {
        if (emit3(out, cap, w, R_COMMENT, start, i1) < 0) return -2;
        return i1 + 3;
    }
    if (emit3(out, cap, w, R_COMMENT, start, n) < 0) return -2;
    return n;
}

static int64_t scan_doctype(const uint8_t *s, int64_t n, int64_t start,
                            int32_t *out, int64_t cap, int64_t *w)
{
    int64_t k = start, ns, ne;
    const uint8_t *e;
    while (k < n && is_ws(s[k]))
        k++;
    ns = k;
    while (k < n && !is_ws(s[k]) && s[k] != '>')
        k++;
    ne = k;
    if (emit3(out, cap, w, R_DOCTYPE, ns, ne) < 0)
        return -2;
    e = memchr(s + ne, '>', n - ne);
    return e ? (e - s) + 1 : n;
}

static int64_t scan_bogus(const uint8_t *s, int64_t n, int64_t start,
                          int32_t *out, int64_t cap, int64_t *w)
{
    const uint8_t *e = memchr(s + start, '>', n - start);
    int64_t end = e ? e - s : n;
    if (emit3(out, cap, w, R_BOGUS, start, end) < 0)
        return -2;
    return e ? end + 1 : n;
}

int64_t nr_scan(const uint8_t *s, int64_t n, int64_t pos,
                int32_t *out, int64_t cap,
                int64_t *out_count, int32_t *out_reason)
{
    int64_t w = 0;
    while (pos < n) {
        const uint8_t *ltp = memchr(s + pos, '<', n - pos);
        int64_t lt = ltp ? (int64_t)(ltp - s) : n;
        int64_t mark, i, r;
        uint8_t c;
        if (lt > pos) {
            if (w + 4 > cap)
                goto full;
            out[w] = R_TEXT;
            out[w + 1] = (int32_t)pos;
            out[w + 2] = (int32_t)lt;
            out[w + 3] = memchr(s + pos, '&', lt - pos) ? 1 : 0;
            w += 4;
            pos = lt;
        }
        if (!ltp) {
            pos = n;
            break;
        }
        mark = pos;              /* the '<' — resume point on refill */
        i = pos + 1;
        if (i >= n) {
            if (w + 1 > cap)
                goto full;
            out[w++] = R_LT;
            pos = n;
            break;
        }
        c = s[i];
        if (c == '/') {
            int64_t j = i + 1;
            if (j < n && is_alpha(s[j])) {
                r = scan_tag(s, n, j, 1, out, cap, &w);
                if (r == -1) { pos = n; break; }
                if (r == -2) { pos = mark; goto full; }
                pos = r;
                continue;
            }
            if (j < n && s[j] == '>') { pos = j + 1; continue; }
            r = scan_bogus(s, n, i, out, cap, &w);
            if (r == -2) { pos = mark; goto full; }
            pos = r;
            continue;
        }
        if (is_alpha(c)) {
            int64_t tag_base = w;
            r = scan_tag(s, n, i, 0, out, cap, &w);
            if (r == -1) { pos = n; break; }
            if (r == -2) { pos = mark; goto full; }
            pos = r;
            if (is_raw_tag(s, out[tag_base + 1], out[tag_base + 2])) {
                *out_count = w;
                *out_reason = REASON_RAW;
                return pos;
            }
            continue;
        }
        if (c == '!') {
            if (i + 2 < n && s[i + 1] == '-' && s[i + 2] == '-') {
                r = scan_comment(s, n, i + 3, out, cap, &w);
            } else if (i + 8 <= n && lc(s[i + 1]) == 'd' && lc(s[i + 2]) == 'o'
                       && lc(s[i + 3]) == 'c' && lc(s[i + 4]) == 't'
                       && lc(s[i + 5]) == 'y' && lc(s[i + 6]) == 'p'
                       && lc(s[i + 7]) == 'e') {
                r = scan_doctype(s, n, i + 8, out, cap, &w);
            } else if (i + 8 <= n && memcmp(s + i + 1, "[CDATA[", 7) == 0) {
                *out_count = w;
                *out_reason = REASON_CDATA;
                return mark;
            } else {
                r = scan_bogus(s, n, i + 1, out, cap, &w);
            }
            if (r == -2) { pos = mark; goto full; }
            pos = r;
            continue;
        }
        if (c == '?') {
            r = scan_bogus(s, n, i, out, cap, &w);
            if (r == -2) { pos = mark; goto full; }
            pos = r;
            continue;
        }
        /* '<' followed by anything else: literal '<', char stays in data */
        if (w + 1 > cap)
            goto full;
        out[w++] = R_LT;
        pos = i;
    }
    *out_count = w;
    *out_reason = REASON_EOF;
    return pos;

full:
    *out_count = w;
    *out_reason = (w == 0) ? REASON_BAIL : REASON_BUF;
    return pos;
}
