/* Whole-document C fast lane: integrated byte-space tokenizer (the
 * _scan.c macro-tokenizer core, inlined) + a subset of the WHATWG
 * insertion-mode machine (treebuilder.py is the reference), building
 * the arena DOM natively as CNode objects (attribute-compatible with
 * dom.Node).
 *
 * Contract: for any input, parse() either returns (arena list, errors
 * list) that is node-for-node IDENTICAL (ids, kinds, names, attrs,
 * linkage, text) to what TreeBuilder().parse() produces — with the
 * SAME accumulated Tree.errors strings in order — or returns None and
 * the caller falls back to the pure-Python machine.  The subset is the
 * common path plus the misnested-formatting error paths (the full
 * WHATWG adoption agency, stray-end-tag recovery, FOSTER PARENTING
 * — fostered text/elements, reconstruction-under-foster and the
 * agency's foster arm — and FOREIGN CONTENT — svg/mathml ns'd
 * inserts, tag/attr case adjustment, xlink/xml attrs, CDATA
 * sections, breakout tags, integration points — plus select modes,
 * applet/marquee/object afe markers, plaintext, TEMPLATES (contents
 * documents, the template-modes stack, form/html/body pointer gates,
 * foster/agency template arms) and frameset w/ exact frameset_ok
 * tracking: EVERY insertion mode — and every tokenizer recovery path,
 * including per-context NUL-byte replacement/drop rules, bogus
 * comments and late doctypes — runs natively.  Remaining aborts are
 * resource caps only (name-cache saturation, >64-deep templates,
 * non-ascii foreign end tags, oversized tag names, >MAX_ATTRS).
 * Differential tests (tests/test_fastlane_differential.py) pin the
 * equivalence.
 *
 * Reference for observable semantics: /root/reference/src/document.rs
 * (TreeSink impl) and tests/html-dom.rs goldens, via treebuilder.py.
 */
#define _GNU_SOURCE
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

/* ---------------- node kinds (mirror dom.py) ---------------- */
#define K_DOCUMENT 0
#define K_DOCTYPE 1
#define K_TEXT 2
#define K_COMMENT 3
#define K_ELEMENT 4

/* ---------------- modes (mirror treebuilder.py) ---------------- */
#define M_INITIAL 0
#define M_BEFORE_HTML 1
#define M_BEFORE_HEAD 2
#define M_IN_HEAD 3
#define M_AFTER_HEAD 4
#define M_IN_BODY 5
#define M_TEXT 6
#define M_IN_TABLE 7
#define M_IN_TABLE_TEXT 8
#define M_IN_CAPTION 9
#define M_IN_COLUMN_GROUP 10
#define M_IN_TABLE_BODY 11
#define M_IN_ROW 12
#define M_IN_CELL 13
#define M_IN_SELECT 14
#define M_IN_SELECT_IN_TABLE 15
#define M_IN_TEMPLATE 16
#define M_IN_FRAMESET 18
#define M_AFTER_FRAMESET 19
#define M_AFTER_AFTER_FRAMESET 21
#define M_AFTER_BODY 17
#define M_AFTER_AFTER_BODY 20

/* ---------------- name table ---------------- */
#define F_SP 0x0001u      /* SPECIAL_HTML */
#define F_FMT 0x0002u     /* FORMATTING */
#define F_HD 0x0004u      /* heading */
#define F_BC 0x0008u      /* BLOCK_CLOSERS */
#define F_IH 0x0010u      /* IN_HEAD_START */
#define F_IMP 0x0020u     /* IMPLIED_END */
/* 0x0040 free (was F_ABS: every insertion mode now runs natively) */
#define F_IGB 0x0080u     /* ignored start tag in body */
#define F_LSC 0x0100u     /* ol/ul: list-item scope boundary */
#define F_ADP 0x0200u     /* address/div/p (li/dd/dt walk exception) */
#define F_NS_SVG 0x0800u     /* open entry: element in the SVG ns */
#define F_NS_MATHML 0x1000u  /* open entry: element in the MathML ns */
#define F_MTEXT_IP 0x2000u   /* mathml text integration pt (mi/mo/mn/ms/mtext) */
#define F_HTML_IP 0x4000u    /* html integration pt (svg fO/desc/title,
                              * annotation-xml w/ html encoding) */
#define F_ANNOT_XML 0x8000u  /* mathml annotation-xml (svg-start exception) */
#define F_FBRK 0x10000u      /* NameEnt: FOREIGN_BREAKOUT member */
#define F_NS_FOREIGN (F_NS_SVG | F_NS_MATHML)
#define F_SCOPEB 0x0400u  /* DEFAULT_SCOPE boundary reachable in the
                           * subset: html, table, td, th, caption */

enum {
    T_OTHER = 0, T_HTML, T_HEAD, T_BODY, T_P, T_A, T_NOBR, T_BUTTON,
    T_FORM, T_LI, T_DD, T_DT, T_PRELIST, T_HR, T_IMAGE, T_VOIDB, T_BR,
    T_INPUT, T_PST, T_TEXTAREA, T_XMP, T_IFRAME, T_NOEMBED, T_NOSCRIPT,
    T_SCRIPT, T_STYLE, T_NOFRAMES, T_TITLE, T_HEADVOID, T_OPTION,
    T_OPTGROUP, T_RB, T_RTC, T_RPRT, T_RUBY, T_APPLETG, T_TEMPLATE,
    T_FMTG, T_TABLE, T_CAPTION, T_COL, T_COLGROUP, T_TBTFTH, T_TDTH,
    T_TR, T_MATH, T_SVG, T_SELECT, T_PLAINTEXT, T_FRAMESET, T_FRAME,
    T_FOREIGN,  /* open-entry tok for foreign-ns elements: matches no
                 * html tok, mirroring the ns == HTML_NS guards on every
                 * Python scope/pop/implied-end name comparison */
};

typedef struct { const char *name; uint8_t len; uint8_t tok; uint32_t flags; } NameEnt;

/* alphabetically sorted for bsearch */
static const NameEnt NAMES[] = {
    {"a", 1, T_A, F_FMT},
    {"address", 7, T_OTHER, F_SP | F_BC | F_ADP},
    {"applet", 6, T_APPLETG, F_SP | F_SCOPEB},
    {"area", 4, T_VOIDB, F_SP},
    {"article", 7, T_OTHER, F_SP | F_BC},
    {"aside", 5, T_OTHER, F_SP | F_BC},
    {"b", 1, T_FMTG, F_FMT | F_FBRK},
    {"base", 4, T_HEADVOID, F_SP | F_IH},
    {"basefont", 8, T_HEADVOID, F_SP | F_IH},
    {"bgsound", 7, T_HEADVOID, F_SP | F_IH},
    {"big", 3, T_FMTG, F_FMT | F_FBRK},
    {"blockquote", 10, T_OTHER, F_SP | F_BC | F_FBRK},
    {"body", 4, T_BODY, F_SP | F_FBRK},
    {"br", 2, T_BR, F_SP | F_FBRK},
    {"button", 6, T_BUTTON, F_SP},
    {"caption", 7, T_CAPTION, F_SP | F_IGB | F_SCOPEB},
    {"center", 6, T_OTHER, F_SP | F_BC | F_FBRK},
    {"code", 4, T_FMTG, F_FMT | F_FBRK},
    {"col", 3, T_COL, F_SP | F_IGB},
    {"colgroup", 8, T_COLGROUP, F_SP | F_IGB},
    {"dd", 2, T_DD, F_SP | F_IMP | F_FBRK},
    {"details", 7, T_OTHER, F_SP | F_BC},
    {"dialog", 6, T_OTHER, F_BC},
    {"dir", 3, T_OTHER, F_SP | F_BC},
    {"div", 3, T_OTHER, F_SP | F_BC | F_ADP | F_FBRK},
    {"dl", 2, T_OTHER, F_SP | F_BC | F_FBRK},
    {"dt", 2, T_DT, F_SP | F_IMP | F_FBRK},
    {"em", 2, T_FMTG, F_FMT | F_FBRK},
    {"embed", 5, T_VOIDB, F_SP | F_FBRK},
    {"fieldset", 8, T_OTHER, F_SP | F_BC},
    {"figcaption", 10, T_OTHER, F_SP | F_BC},
    {"figure", 6, T_OTHER, F_SP | F_BC},
    {"font", 4, T_FMTG, F_FMT},
    {"footer", 6, T_OTHER, F_SP | F_BC},
    {"form", 4, T_FORM, F_SP},
    {"frame", 5, T_FRAME, F_SP | F_IGB},
    {"frameset", 8, T_FRAMESET, F_SP},
    {"h1", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"h2", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"h3", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"h4", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"h5", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"h6", 2, T_OTHER, F_SP | F_HD | F_FBRK},
    {"head", 4, T_HEAD, F_SP | F_IGB | F_FBRK},
    {"header", 6, T_OTHER, F_SP | F_BC},
    {"hgroup", 6, T_OTHER, F_SP | F_BC},
    {"hr", 2, T_HR, F_SP | F_FBRK},
    {"html", 4, T_HTML, F_SP | F_SCOPEB},
    {"i", 1, T_FMTG, F_FMT | F_FBRK},
    {"iframe", 6, T_IFRAME, F_SP},
    {"image", 5, T_IMAGE, 0},
    {"img", 3, T_VOIDB, F_SP | F_FBRK},
    {"input", 5, T_INPUT, F_SP},
    {"keygen", 6, T_VOIDB, F_SP},
    {"li", 2, T_LI, F_SP | F_IMP | F_FBRK},
    {"link", 4, T_HEADVOID, F_SP | F_IH},
    {"listing", 7, T_PRELIST, F_SP | F_FBRK},
    {"main", 4, T_OTHER, F_SP | F_BC},
    {"marquee", 7, T_APPLETG, F_SP | F_SCOPEB},
    {"math", 4, T_MATH, 0},
    {"menu", 4, T_OTHER, F_SP | F_BC | F_FBRK},
    {"meta", 4, T_HEADVOID, F_SP | F_IH | F_FBRK},
    {"nav", 3, T_OTHER, F_SP | F_BC},
    {"nobr", 4, T_NOBR, F_FMT | F_FBRK},
    {"noembed", 7, T_NOEMBED, F_SP},
    {"noframes", 8, T_NOFRAMES, F_SP | F_IH},
    {"noscript", 8, T_NOSCRIPT, F_SP},
    {"object", 6, T_APPLETG, F_SP | F_SCOPEB},
    {"ol", 2, T_OTHER, F_SP | F_BC | F_LSC | F_FBRK},
    {"optgroup", 8, T_OPTGROUP, F_IMP},
    {"option", 6, T_OPTION, F_IMP},
    {"p", 1, T_P, F_SP | F_BC | F_IMP | F_ADP | F_FBRK},
    {"param", 5, T_PST, F_SP},
    {"plaintext", 9, T_PLAINTEXT, F_SP},
    {"pre", 3, T_PRELIST, F_SP | F_FBRK},
    {"rb", 2, T_RB, F_IMP},
    {"rp", 2, T_RPRT, F_IMP},
    {"rt", 2, T_RPRT, F_IMP},
    {"rtc", 3, T_RTC, F_IMP},
    {"ruby", 4, T_RUBY, F_FBRK},
    {"s", 1, T_FMTG, F_FMT | F_FBRK},
    {"script", 6, T_SCRIPT, F_SP | F_IH},
    {"section", 7, T_OTHER, F_SP | F_BC},
    {"select", 6, T_SELECT, F_SP},
    {"small", 5, T_FMTG, F_FMT | F_FBRK},
    {"source", 6, T_PST, F_SP},
    {"span", 4, T_OTHER, F_FBRK},
    {"strike", 6, T_FMTG, F_FMT | F_FBRK},
    {"strong", 6, T_FMTG, F_FMT | F_FBRK},
    {"style", 5, T_STYLE, F_SP | F_IH},
    {"sub", 3, T_OTHER, F_FBRK},
    {"summary", 7, T_OTHER, F_SP | F_BC},
    {"sup", 3, T_OTHER, F_FBRK},
    {"svg", 3, T_SVG, 0},
    {"table", 5, T_TABLE, F_SP | F_SCOPEB | F_FBRK},
    {"tbody", 5, T_TBTFTH, F_SP | F_IGB},
    {"td", 2, T_TDTH, F_SP | F_IGB | F_SCOPEB},
    {"template", 8, T_TEMPLATE, F_SP | F_IH | F_SCOPEB},
    {"textarea", 8, T_TEXTAREA, F_SP},
    {"tfoot", 5, T_TBTFTH, F_SP | F_IGB},
    {"th", 2, T_TDTH, F_SP | F_IGB | F_SCOPEB},
    {"thead", 5, T_TBTFTH, F_SP | F_IGB},
    {"title", 5, T_TITLE, F_SP | F_IH},
    {"tr", 2, T_TR, F_SP | F_IGB},
    {"track", 5, T_PST, F_SP},
    {"tt", 2, T_FMTG, F_FMT | F_FBRK},
    {"u", 1, T_FMTG, F_FMT | F_FBRK},
    {"ul", 2, T_OTHER, F_SP | F_BC | F_LSC | F_FBRK},
    {"var", 3, T_OTHER, F_FBRK},
    {"wbr", 3, T_VOIDB, F_SP},
    {"xmp", 3, T_XMP, F_SP},
};
#define N_NAMES ((int)(sizeof(NAMES) / sizeof(NAMES[0])))

static const NameEnt *name_lookup(const uint8_t *s, Py_ssize_t len)
{
    int lo = 0, hi = N_NAMES - 1;
    if (len > 10)
        return NULL;
    while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const NameEnt *e = &NAMES[mid];
        Py_ssize_t cl = len < e->len ? len : e->len;
        int c = memcmp(s, e->name, cl);
        if (c == 0)
            c = (int)(len - e->len);
        if (c == 0)
            return e;
        if (c < 0)
            hi = mid - 1;
        else
            lo = mid + 1;
    }
    return NULL;
}

/* ---------------- CNode type ---------------- */
typedef struct {
    PyObject_HEAD
    int32_t id, kind, parent, first_child, last_child, prev, next, tc;
    PyObject *name, *ns, *attrs, *data, *data2, *aip;
} CNode;

static void cnode_dealloc(PyObject *self)
{
    CNode *n = (CNode *)self;
    Py_XDECREF(n->name);
    Py_XDECREF(n->ns);
    Py_XDECREF(n->attrs);
    Py_XDECREF(n->data);
    Py_XDECREF(n->data2);
    Py_XDECREF(n->aip);
    Py_TYPE(self)->tp_free(self);
}

static PyMemberDef cnode_members[] = {
    {"id", T_INT, offsetof(CNode, id), 0, NULL},
    {"kind", T_INT, offsetof(CNode, kind), 0, NULL},
    {"parent", T_INT, offsetof(CNode, parent), 0, NULL},
    {"first_child", T_INT, offsetof(CNode, first_child), 0, NULL},
    {"last_child", T_INT, offsetof(CNode, last_child), 0, NULL},
    {"prev", T_INT, offsetof(CNode, prev), 0, NULL},
    {"next", T_INT, offsetof(CNode, next), 0, NULL},
    {"template_contents", T_INT, offsetof(CNode, tc), 0, NULL},
    {"name", T_OBJECT, offsetof(CNode, name), 0, NULL},
    {"ns", T_OBJECT, offsetof(CNode, ns), 0, NULL},
    {"attrs", T_OBJECT, offsetof(CNode, attrs), 0, NULL},
    {"data", T_OBJECT, offsetof(CNode, data), 0, NULL},
    {"data2", T_OBJECT, offsetof(CNode, data2), 0, NULL},
    {"mathml_aip", T_OBJECT, offsetof(CNode, aip), 0, NULL},
    {NULL, 0, 0, 0, NULL},
};

static PyObject *g_node_from_state = NULL;  /* dom._node_from_state */

static PyObject *cnode_reduce(PyObject *self, PyObject *noarg)
{
    CNode *n = (CNode *)self;
    (void)noarg;
    if (g_node_from_state == NULL) {
        PyErr_SetString(PyExc_RuntimeError, "fastlane not set up");
        return NULL;
    }
    return Py_BuildValue(
        "O((iiiiiiii)OOOOOO)", g_node_from_state,
        n->id, n->kind, n->parent, n->first_child, n->last_child,
        n->prev, n->next, n->tc,
        n->name ? n->name : Py_None, n->ns ? n->ns : Py_None,
        n->attrs ? n->attrs : Py_None, n->data ? n->data : Py_None,
        n->data2 ? n->data2 : Py_None, n->aip ? n->aip : Py_False);
}

static PyMethodDef cnode_methods[] = {
    {"__reduce__", cnode_reduce, METH_NOARGS, NULL},
    {NULL, NULL, 0, NULL},
};

static PyTypeObject CNodeType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "nr_fastlane.CNode",
    .tp_basicsize = sizeof(CNode),
    .tp_dealloc = cnode_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_members = cnode_members,
    .tp_methods = cnode_methods,
    .tp_doc = "arena DOM node built by the C fast lane "
              "(attribute-compatible with dom.Node)",
};

/* ---------------- interned-name cache ---------------- */
#define NCACHE_SLOTS 4096  /* power of two */
typedef struct { uint8_t *key; uint32_t len; PyObject *str; } NCEnt;
static NCEnt g_ncache[NCACHE_SLOTS];
static int g_ncache_count = 0;

static PyObject *intern_name(const uint8_t *s, Py_ssize_t len)
{
    uint32_t h = 2166136261u;
    Py_ssize_t i;
    uint32_t slot;
    for (i = 0; i < len; i++)
        h = (h ^ s[i]) * 16777619u;
    slot = h & (NCACHE_SLOTS - 1);
    while (g_ncache[slot].key != NULL) {
        if (g_ncache[slot].len == (uint32_t)len
            && memcmp(g_ncache[slot].key, s, len) == 0)
            return g_ncache[slot].str;
        slot = (slot + 1) & (NCACHE_SLOTS - 1);
    }
    if (g_ncache_count >= NCACHE_SLOTS - NCACHE_SLOTS / 4)
        return NULL;  /* cache saturated: caller aborts to Python */
    {
        PyObject *str = PyUnicode_DecodeUTF8((const char *)s, len,
                                             "surrogatepass");
        if (str == NULL)
            return NULL;
        PyUnicode_InternInPlace(&str);
        g_ncache[slot].key = (uint8_t *)PyMem_Malloc(len ? len : 1);
        if (g_ncache[slot].key == NULL) {
            Py_DECREF(str);
            return NULL;
        }
        memcpy(g_ncache[slot].key, s, len);
        g_ncache[slot].len = (uint32_t)len;
        g_ncache[slot].str = str;  /* cache owns one ref, forever */
        g_ncache_count++;
        return str;
    }
}

/* ---------------- parser state ---------------- */
typedef struct { int32_t id; int32_t tok; uint32_t flags; } OpenEnt;
typedef struct { int32_t el; int32_t tok; PyObject *name; PyObject *attrs; } AfeEnt;

typedef struct {
    const uint8_t *b;
    Py_ssize_t n;

    PyObject **nodes;
    int n_nodes, cap_nodes;

    OpenEnt *open;
    int n_open, cap_open;

    AfeEnt *afe;
    int n_afe, cap_afe;

    int mode, original_mode;
    int tmpl[64];              /* template_modes stack (ints: M_*) */
    int n_tmpl;
    int frameset_ok;
    int head_id, form_id;
    int ignore_lf;
    int done;

    int raw_kind;              /* 0 none, 1 rcdata, 2 rawtext, 3 script,
                                * 4 plaintext */
    const NameEnt *raw_ne;     /* raw element entry (close-tag search) */

    /* pending text run */
    PyObject *pend;            /* list of str chunks, or NULL */
    int pend_parent;
    int pend_before;           /* insert before this sibling (-1 append) —
                                * set by fostered text runs */
    int pend_merge;            /* existing TEXT node id to merge into, or -1 */

    int foster;                /* table anything-else delegation: an
                                * insert whose target is tableish
                                * foster-parents (a parse error),
                                * mirroring treebuilder._insertion_point */
    PyObject *tt;              /* pending table text chunks, or NULL */

    PyObject *errors;          /* accumulated parse errors (lazy list;
                                * mirrors treebuilder.parse_error) */

    /* quirks decision inputs from the first INITIAL-mode doctype (the
     * only one that can set the mode); the DECISION itself runs in
     * Python (treebuilder.doctype_quirks) on these, so the two lanes
     * share one implementation */
    PyObject *quirks_name;     /* lowered name, or NULL = no doctype */
    PyObject *quirks_rest;     /* raw post-name declaration text */
    int quirks_eof;            /* unterminated (no '>') */

    int aborted;
} P;

/* shared singletons, set in setup() */
static PyObject *g_html_ns = NULL;
static PyObject *g_svg_ns = NULL;          /* dom.SVG_NS */
static PyObject *g_mathml_ns = NULL;       /* dom.MATHML_NS */
static PyObject *g_svg_tag_adj = NULL;     /* treebuilder.SVG_TAG_ADJUST */
static PyObject *g_svg_attr_adj = NULL;    /* treebuilder.SVG_ATTR_ADJUST */
static PyObject *g_foreign_attr_adj = NULL;  /* FOREIGN_ATTR_ADJUST */
static PyObject *NM_definitionURL = NULL;
static PyObject *g_nul_str = NULL;         /* "\x00" */
static PyObject *g_fffd_str = NULL;        /* U+FFFD */
static PyObject *g_decode = NULL;          /* entities.decode_charrefs */
static PyObject *g_lt_str = NULL;          /* "<" */
static PyObject *g_empty_str = NULL;       /* "" */
static PyObject *NM_html, *NM_head, *NM_body, *NM_p, *NM_img, *NM_rtc;
static PyObject *NM_colgroup, *NM_tbody, *NM_tr, *NM_type;

#define ABORT(p) do { (p)->aborted = 1; return -1; } while (0)
#define CHECK(x) do { if ((x) < 0) return -1; } while (0)

/* treebuilder.parse_error: append "<pfx></name>" to the error list.
 * Recovery is unchanged — errors are observational (Tree.errors). */
static int parse_error_tag(P *p, const char *pfx, PyObject *name)
{
    PyObject *msg;
    int r;
    if (p->errors == NULL) {
        p->errors = PyList_New(0);
        if (p->errors == NULL)
            return -1;
    }
    msg = PyUnicode_FromFormat("%s</%U>", pfx, name);
    if (msg == NULL)
        return -1;
    r = PyList_Append(p->errors, msg);
    Py_DECREF(msg);
    return r;
}

/* treebuilder.parse_error with a fixed message string */
static int parse_error_str(P *p, const char *msg)
{
    PyObject *m;
    int r;
    if (p->errors == NULL) {
        p->errors = PyList_New(0);
        if (p->errors == NULL)
            return -1;
    }
    m = PyUnicode_FromString(msg);
    if (m == NULL)
        return -1;
    r = PyList_Append(p->errors, m);
    Py_DECREF(m);
    return r;
}

/* ---------------- arena ops ---------------- */
static int arena_push(P *p, PyObject *node)
{
    if (p->n_nodes == p->cap_nodes) {
        int nc = p->cap_nodes ? p->cap_nodes * 2 : 64;
        PyObject **nn = PyMem_Realloc(p->nodes, nc * sizeof(PyObject *));
        if (nn == NULL)
            return -1;
        p->nodes = nn;
        p->cap_nodes = nc;
    }
    p->nodes[p->n_nodes++] = node;
    return 0;
}

static CNode *new_node(P *p, int kind)
{
    CNode *n = PyObject_New(CNode, &CNodeType);
    if (n == NULL)
        return NULL;
    n->id = p->n_nodes;
    n->kind = kind;
    n->parent = n->first_child = n->last_child = n->prev = n->next = -1;
    n->tc = -1;
    n->name = NULL;
    n->ns = NULL;
    n->attrs = NULL;
    n->data = NULL;
    n->data2 = NULL;
    Py_INCREF(Py_False);
    n->aip = Py_False;
    if (arena_push(p, (PyObject *)n) < 0) {
        Py_DECREF(n);
        return NULL;
    }
    return n;
}

#define NODE(p, i) ((CNode *)(p)->nodes[i])

static void link_append(P *p, int parent_id, int child_id)
{
    CNode *parent = NODE(p, parent_id);
    CNode *child = NODE(p, child_id);
    int last = parent->last_child;
    if (last == -1)
        parent->first_child = child_id;
    else {
        NODE(p, last)->next = child_id;
        child->prev = last;
    }
    parent->last_child = child_id;
    child->parent = parent_id;
    child->next = -1;
}

/* dom.Tree.insert_before(before_id, child_id) */
static void link_insert_before(P *p, int before_id, int child_id)
{
    CNode *ref = NODE(p, before_id);
    CNode *child = NODE(p, child_id);
    int parent_id = ref->parent;
    CNode *parent = NODE(p, parent_id);
    int prev = ref->prev;
    child->parent = parent_id;
    child->next = before_id;
    child->prev = prev;
    if (prev == -1)
        parent->first_child = child_id;
    else
        NODE(p, prev)->next = child_id;
    ref->prev = child_id;
}

/* dom.Tree.remove_from_parent */
static void unlink_node(P *p, int id)
{
    CNode *n = NODE(p, id);
    if (n->parent != -1) {
        CNode *par = NODE(p, n->parent);
        if (par->first_child == id)
            par->first_child = n->next;
        if (par->last_child == id)
            par->last_child = n->prev;
    }
    if (n->prev != -1)
        NODE(p, n->prev)->next = n->next;
    if (n->next != -1)
        NODE(p, n->next)->prev = n->prev;
    n->parent = n->prev = n->next = -1;
}

/* dom.Tree.reparent_children (append each child in order) */
static void reparent_children_c(P *p, int src_id, int dst_id)
{
    int c = NODE(p, src_id)->first_child;
    while (c != -1) {
        CNode *ch = NODE(p, c);
        int nx = ch->next;
        ch->parent = ch->prev = ch->next = -1;
        link_append(p, dst_id, c);
        c = nx;
    }
    NODE(p, src_id)->first_child = NODE(p, src_id)->last_child = -1;
}

/* ---------------- open stack / afe ---------------- */
static int open_push(P *p, int id, int tok, uint32_t flags)
{
    if (p->n_open == p->cap_open) {
        int nc = p->cap_open ? p->cap_open * 2 : 32;
        OpenEnt *no = PyMem_Realloc(p->open, nc * sizeof(OpenEnt));
        if (no == NULL)
            return -1;
        p->open = no;
        p->cap_open = nc;
    }
    p->open[p->n_open].id = id;
    p->open[p->n_open].tok = tok;
    p->open[p->n_open].flags = flags;
    p->n_open++;
    return 0;
}

static int on_open_stack(P *p, int el)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--)
        if (p->open[i].id == el)
            return 1;
    return 0;
}

/* list.index semantics (first match from the bottom, like Python's
 * self.open.index) — the agency only targets unique element ids */
static int open_index_of(P *p, int el)
{
    int i;
    for (i = 0; i < p->n_open; i++)
        if (p->open[i].id == el)
            return i;
    return -1;
}

static void open_remove_at(P *p, int i)
{
    memmove(&p->open[i], &p->open[i + 1],
            (p->n_open - i - 1) * sizeof(OpenEnt));
    p->n_open--;
}

static int open_insert_at(P *p, int i, int id, int tok, uint32_t flags)
{
    if (p->n_open == p->cap_open) {
        int nc = p->cap_open ? p->cap_open * 2 : 32;
        OpenEnt *no = PyMem_Realloc(p->open, nc * sizeof(OpenEnt));
        if (no == NULL)
            return -1;
        p->open = no;
        p->cap_open = nc;
    }
    memmove(&p->open[i + 1], &p->open[i],
            (p->n_open - i) * sizeof(OpenEnt));
    p->open[i].id = id;
    p->open[i].tok = tok;
    p->open[i].flags = flags;
    p->n_open++;
    return 0;
}

/* a MARKER entry has name == NULL (caption and td/th push one) */
static int afe_push_raw(P *p, int el, int tok, PyObject *name, PyObject *attrs)
{
    if (p->n_afe == p->cap_afe) {
        int nc = p->cap_afe ? p->cap_afe * 2 : 16;
        AfeEnt *na = PyMem_Realloc(p->afe, nc * sizeof(AfeEnt));
        if (na == NULL)
            return -1;
        p->afe = na;
        p->cap_afe = nc;
    }
    p->afe[p->n_afe].el = el;
    p->afe[p->n_afe].tok = tok;
    Py_XINCREF(name);
    p->afe[p->n_afe].name = name;
    Py_XINCREF(attrs);
    p->afe[p->n_afe].attrs = attrs;
    p->n_afe++;
    return 0;
}

static int afe_push_marker(P *p)
{
    return afe_push_raw(p, -1, -1, NULL, NULL);
}

static void afe_clear_to_marker(P *p)
{
    while (p->n_afe > 0) {
        AfeEnt *e = &p->afe[--p->n_afe];
        int was_marker = (e->name == NULL);
        Py_XDECREF(e->name);
        Py_XDECREF(e->attrs);
        if (was_marker)
            break;
    }
}

static void afe_remove_at(P *p, int i)
{
    Py_XDECREF(p->afe[i].name);
    Py_XDECREF(p->afe[i].attrs);
    memmove(&p->afe[i], &p->afe[i + 1],
            (p->n_afe - i - 1) * sizeof(AfeEnt));
    p->n_afe--;
}

/* insert at index i; takes NEW references to name/attrs from caller */
static int afe_insert_at(P *p, int i, int el, int tok,
                         PyObject *name, PyObject *attrs)
{
    if (p->n_afe == p->cap_afe) {
        int nc = p->cap_afe ? p->cap_afe * 2 : 16;
        AfeEnt *na = PyMem_Realloc(p->afe, nc * sizeof(AfeEnt));
        if (na == NULL)
            return -1;
        p->afe = na;
        p->cap_afe = nc;
    }
    memmove(&p->afe[i + 1], &p->afe[i],
            (p->n_afe - i) * sizeof(AfeEnt));
    p->afe[i].el = el;
    p->afe[i].tok = tok;
    Py_INCREF(name);
    p->afe[i].name = name;
    Py_INCREF(attrs);
    p->afe[i].attrs = attrs;
    p->n_afe++;
    return 0;
}

/* multiset equality of two attrs lists (names unique per list) */
static int attrs_equal(PyObject *a, PyObject *b)
{
    Py_ssize_t la = PyList_GET_SIZE(a), lb = PyList_GET_SIZE(b), i, j;
    if (la != lb)
        return 0;
    for (i = 0; i < la; i++) {
        PyObject *ia = PyList_GET_ITEM(a, i);
        PyObject *na = PyList_GET_ITEM(ia, 1);
        PyObject *va = PyList_GET_ITEM(ia, 2);
        int found = 0;
        for (j = 0; j < lb; j++) {
            PyObject *ib = PyList_GET_ITEM(b, j);
            if (PyList_GET_ITEM(ib, 1) == na) {   /* interned names */
                if (PyUnicode_Compare(va, PyList_GET_ITEM(ib, 2)) != 0)
                    return 0;
                found = 1;
                break;
            }
        }
        if (!found)
            return 0;
    }
    return 1;
}

/* Noah's Ark (treebuilder._afe_push): at most 3 identical entries
 * since the last marker */
static int afe_push_noah(P *p, int el, int tok, PyObject *name, PyObject *attrs)
{
    int count = 0, i;
    for (i = p->n_afe - 1; i >= 0; i--) {
        if (p->afe[i].name == NULL)
            break;
        if (p->afe[i].name == name && attrs_equal(p->afe[i].attrs, attrs)) {
            count++;
            if (count == 3) {
                afe_remove_at(p, i);
                break;
            }
        }
    }
    return afe_push_raw(p, el, tok, name, attrs);
}

/* ---------------- pending text ---------------- */
#define TABLEISH(tok) ((tok) == T_TABLE || (tok) == T_TBTFTH || (tok) == T_TR)
static int cur_top(P *p);

/* treebuilder._insertion_point, foster branch, including the
 * last_template arm (templates run natively; a template above the
 * table redirects the fostered insert into its contents document).
 * Emits the "foster-parenting" parse error exactly where the Python
 * machine does (once per fostered insertion). */
static int foster_point(P *p, int *parent, int *before)
{
    int last_table = -1, last_template = -1, i;
    CHECK(parse_error_str(p, "foster-parenting"));
    for (i = p->n_open - 1; i >= 0; i--) {
        int t = p->open[i].tok;
        if (t == T_TABLE && last_table == -1)
            last_table = i;
        if (t == T_TEMPLATE && last_template == -1)
            last_template = i;
        if (last_table != -1 && last_template != -1)
            break;
    }
    if (last_template != -1
        && (last_table == -1 || last_template > last_table)) {
        *parent = NODE(p, p->open[last_template].id)->tc;
        *before = -1;
        return 0;
    }
    if (last_table == -1) {
        *parent = p->open[0].id;
        *before = -1;
        return 0;
    }
    {
        int table_id = p->open[last_table].id;
        if (NODE(p, table_id)->parent != -1) {
            *parent = NODE(p, table_id)->parent;
            *before = table_id;
        } else {
            *parent = p->open[last_table - 1].id;
            *before = -1;
        }
    }
    return 0;
}

static int flush_text(P *p)
{
    PyObject *s;
    Py_ssize_t len;
    if (p->pend == NULL)
        return 0;
    len = PyList_GET_SIZE(p->pend);
    if (len == 1) {
        s = PyList_GET_ITEM(p->pend, 0);
        Py_INCREF(s);
    } else {
        s = PyUnicode_Join(g_empty_str, p->pend);
        if (s == NULL)
            return -1;
    }
    Py_CLEAR(p->pend);
    if (p->pend_merge != -1) {
        CNode *t = NODE(p, p->pend_merge);
        PyObject *joined = PyUnicode_Concat(t->data, s);
        Py_DECREF(s);
        if (joined == NULL)
            return -1;
        Py_SETREF(t->data, joined);
    } else {
        CNode *t = new_node(p, K_TEXT);
        if (t == NULL) {
            Py_DECREF(s);
            return -1;
        }
        t->data = s;
        if (p->pend_before != -1)
            link_insert_before(p, p->pend_before, t->id);
        else
            link_append(p, p->pend_parent, t->id);
    }
    return 0;
}

/* queue text for insertion under parent (current top's target);
 * fostered character tokens redirect to the foster point, merging
 * with the text node already sitting before the table if any
 * (treebuilder._insert_text, before_id branch) */
static int pend_text(P *p, int parent, PyObject *s)
{
    int before = -1;
    if (p->foster && TABLEISH(p->open[p->n_open - 1].tok)
        && parent == cur_top(p))
        CHECK(foster_point(p, &parent, &before));
    else if (parent == cur_top(p)
             && p->open[p->n_open - 1].tok == T_TEMPLATE)
        parent = NODE(p, parent)->tc;
    if (p->pend != NULL
        && (p->pend_parent != parent || p->pend_before != before))
        CHECK(flush_text(p));
    if (p->pend == NULL) {
        p->pend = PyList_New(0);
        if (p->pend == NULL)
            return -1;
        p->pend_parent = parent;
        p->pend_before = before;
        p->pend_merge = -1;
        if (before != -1) {
            int prev = NODE(p, before)->prev;
            if (prev != -1 && NODE(p, prev)->kind == K_TEXT)
                p->pend_merge = prev;
        } else {
            CNode *par = NODE(p, parent);
            if (par->last_child != -1
                && NODE(p, par->last_child)->kind == K_TEXT)
                p->pend_merge = par->last_child;
        }
    }
    return PyList_Append(p->pend, s);
}

/* ---------------- element insertion ---------------- */
static int cur_top(P *p) { return p->open[p->n_open - 1].id; }  /* NOLINT */

/* insert + (optionally) push.  Steals nothing; attrs ref borrowed
 * (INCREF'd into the node). */
static int insert_element_ns(P *p, PyObject *name, PyObject *attrs,
                             int tok, uint32_t flags, int push,
                             PyObject *ns)
{
    CNode *el;
    int parent = -1, before = -1;
    CHECK(flush_text(p));
    if (p->foster && TABLEISH(p->open[p->n_open - 1].tok))
        CHECK(foster_point(p, &parent, &before));
    el = new_node(p, K_ELEMENT);
    if (el == NULL)
        return -1;
    Py_INCREF(name);
    el->name = name;
    Py_INCREF(ns);
    el->ns = ns;
    Py_INCREF(attrs);
    el->attrs = attrs;
    if (tok == T_TEMPLATE) {
        /* template content document (dom: el.template_contents) */
        CNode *d = new_node(p, K_DOCUMENT);
        if (d == NULL)
            return -1;
        el->tc = d->id;
    }
    if (before != -1) {
        link_insert_before(p, before, el->id);
    } else {
        int par = parent != -1 ? parent : cur_top(p);
        if (parent == -1 && p->open[p->n_open - 1].tok == T_TEMPLATE)
            par = NODE(p, par)->tc;  /* _insertion_point template arm */
        link_append(p, par, el->id);
    }
    if (push)
        CHECK(open_push(p, el->id, tok, flags));
    return el->id;
}

static int insert_element(P *p, PyObject *name, PyObject *attrs,
                          int tok, uint32_t flags, int push)
{
    return insert_element_ns(p, name, attrs, tok, flags, push, g_html_ns);
}

/* fresh outer+inner lists sharing name/value strings (mirrors
 * [list(a) for a in attrs]) */
static PyObject *copy_attrs(PyObject *src_attrs)
{
    PyObject *attrs = PyList_New(PyList_GET_SIZE(src_attrs));
    Py_ssize_t k;
    if (attrs == NULL)
        return NULL;
    for (k = 0; k < PyList_GET_SIZE(src_attrs); k++) {
        PyObject *src = PyList_GET_ITEM(src_attrs, k);
        PyObject *inner = PyList_New(3);
        Py_ssize_t m;
        if (inner == NULL) {
            Py_DECREF(attrs);
            return NULL;
        }
        for (m = 0; m < 3; m++) {
            PyObject *it = PyList_GET_ITEM(src, m);
            Py_INCREF(it);
            PyList_SET_ITEM(inner, m, it);
        }
        PyList_SET_ITEM(attrs, k, inner);
    }
    return attrs;
}

/* dom.Tree.new_element (create in the arena, link nowhere): fresh
 * deep-copied attrs, html ns — the agency's clone constructor */
static int create_element(P *p, PyObject *name, PyObject *attrs_src)
{
    CNode *el;
    PyObject *attrs = copy_attrs(attrs_src);
    if (attrs == NULL)
        return -1;
    el = new_node(p, K_ELEMENT);
    if (el == NULL) {
        Py_DECREF(attrs);
        return -1;
    }
    Py_INCREF(name);
    el->name = name;
    Py_INCREF(g_html_ns);
    el->ns = g_html_ns;
    el->attrs = attrs;  /* steal */
    return el->id;
}

/* treebuilder._reconstruct_afe */
static int reconstruct_afe(P *p)
{
    int i, j;
    if (p->n_afe == 0)
        return 0;
    if (p->afe[p->n_afe - 1].name == NULL
        || on_open_stack(p, p->afe[p->n_afe - 1].el))
        return 0;
    i = p->n_afe - 1;
    while (i >= 0) {
        if (p->afe[i].name == NULL || on_open_stack(p, p->afe[i].el)) {
            i += 1;
            break;
        }
        i -= 1;
    }
    if (i < 0)
        i = 0;
    for (j = i; j < p->n_afe; j++) {
        AfeEnt *e = &p->afe[j];
        PyObject *attrs = copy_attrs(e->attrs);
        int nid;
        if (attrs == NULL)
            return -1;
        nid = insert_element(p, e->name, attrs, e->tok,
                            (e->tok == T_A || e->tok == T_NOBR
                             || e->tok == T_FMTG) ? F_FMT : 0, 1);
        Py_DECREF(attrs);
        if (nid < 0)
            return -1;
        e->el = nid;
    }
    return 0;
}

/* ---------------- scope checks ----------------
 * DEFAULT_SCOPE boundaries reachable in the subset carry F_SCOPEB
 * (html, table, td, th, caption — template/applet/marquee/object and
 * all foreign elements abort at their start tag); button scope adds
 * button, list-item scope adds ol/ul, table scope is html/table. */
static int in_scope_tok(P *p, int tok, int button, int list)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        if (e->tok == tok)
            return 1;
        if (e->flags & F_SCOPEB)
            return 0;
        if (button && e->tok == T_BUTTON)
            return 0;
        if (list && (e->flags & F_LSC))
            return 0;
    }
    return 0;
}

static int in_scope_flag(P *p, uint32_t flag)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        if (e->flags & flag)
            return 1;
        if (e->flags & F_SCOPEB)
            return 0;
    }
    return 0;
}

static int el_in_scope(P *p, int el)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        if (p->open[i].id == el)
            return 1;
        if (p->open[i].flags & F_SCOPEB)
            return 0;
    }
    return 0;
}

/* TABLE_SCOPE (html/table/template) */
static int in_table_scope_tok(P *p, int tok)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        if (e->tok == tok)
            return 1;
        if (e->tok == T_HTML || e->tok == T_TABLE
            || e->tok == T_TEMPLATE)
            return 0;
    }
    return 0;
}

static int in_table_scope_name(P *p, PyObject *name)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        if (!(e->flags & F_NS_FOREIGN) && NODE(p, e->id)->name == name)
            return 1;
        if (e->tok == T_HTML || e->tok == T_TABLE
            || e->tok == T_TEMPLATE)
            return 0;
    }
    return 0;
}

/* generate implied end tags; except_name NULL or an interned name */
static void generate_implied(P *p, PyObject *except_name)
{
    while (p->n_open > 0) {
        OpenEnt *e = &p->open[p->n_open - 1];
        if ((e->flags & F_IMP)
            && NODE(p, e->id)->name != except_name)
            p->n_open--;
        else
            break;
    }
}

static void pop_until_tok(P *p, int tok)
{
    while (p->n_open > 0) {
        int t = p->open[--p->n_open].tok;
        if (t == tok)
            return;
    }
}

static void pop_until_name(P *p, PyObject *name)
{
    while (p->n_open > 0) {
        OpenEnt *e = &p->open[--p->n_open];
        if (!(e->flags & F_NS_FOREIGN) && NODE(p, e->id)->name == name)
            return;
    }
}

static void pop_until_flag(P *p, uint32_t flag)
{
    while (p->n_open > 0) {
        uint32_t f = p->open[--p->n_open].flags;
        if (f & flag)
            return;
    }
}

static void close_p(P *p)
{
    if (in_scope_tok(p, T_P, 1, 0)) {
        generate_implied(p, NM_p);
        pop_until_tok(p, T_P);
    }
}

/* ---------------- table context helpers ---------------- */
static void clear_to_table_context(P *p)
{
    /* pop until table/template/html */
    while (p->n_open > 0) {
        int t = p->open[p->n_open - 1].tok;
        if (t == T_TABLE || t == T_HTML || t == T_TEMPLATE)
            return;
        p->n_open--;
    }
}

static void clear_to_table_body_context(P *p)
{
    while (p->n_open > 0) {
        int t = p->open[p->n_open - 1].tok;
        if (t == T_TBTFTH || t == T_HTML || t == T_TEMPLATE)
            return;
        p->n_open--;
    }
}

static void clear_to_row_context(P *p)
{
    while (p->n_open > 0) {
        int t = p->open[p->n_open - 1].tok;
        if (t == T_TR || t == T_HTML || t == T_TEMPLATE)
            return;
        p->n_open--;
    }
}

/* treebuilder._reset_mode (document subset; select/template/head-mid-
 * body unreachable) */
static void reset_mode(P *p)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        int last = (i == 0);
        switch (p->open[i].tok) {
        case T_TDTH:
            if (!last) {
                p->mode = M_IN_CELL;
                return;
            }
            break;
        case T_TR:
            p->mode = M_IN_ROW;
            return;
        case T_TBTFTH:
            p->mode = M_IN_TABLE_BODY;
            return;
        case T_CAPTION:
            p->mode = M_IN_CAPTION;
            return;
        case T_COLGROUP:
            p->mode = M_IN_COLUMN_GROUP;
            return;
        case T_TABLE:
            p->mode = M_IN_TABLE;
            return;
        case T_FRAMESET:
            p->mode = M_IN_FRAMESET;
            return;
        case T_TEMPLATE:
            p->mode = p->n_tmpl ? p->tmpl[p->n_tmpl - 1] : M_IN_BODY;
            return;
        case T_HEAD:
            /* reachable only via template reset (head stays open) */
            if (!last) {
                p->mode = M_IN_HEAD;
                return;
            }
            break;
        case T_SELECT: {
            int j;
            if (!last) {
                for (j = i - 1; j >= 1; j--) {
                    if (p->open[j].flags & F_NS_FOREIGN)
                        continue;
                    if (p->open[j].tok == T_TEMPLATE)
                        break;
                    if (p->open[j].tok == T_TABLE) {
                        p->mode = M_IN_SELECT_IN_TABLE;
                        return;
                    }
                }
            }
            p->mode = M_IN_SELECT;
            return;
        }
        case T_BODY:
            p->mode = M_IN_BODY;
            return;
        case T_HTML:
            p->mode = (p->head_id == -1) ? M_BEFORE_HEAD : M_AFTER_HEAD;
            return;
        default:
            break;
        }
        if (last) {
            p->mode = M_IN_BODY;
            return;
        }
    }
}

static int template_on_stack(P *p)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--)
        if (p->open[i].tok == T_TEMPLATE)
            return 1;
    return 0;
}

/* treebuilder._end_template */
static int end_template(P *p)
{
    if (!template_on_stack(p))
        return 0;
    generate_implied(p, NULL);
    pop_until_tok(p, T_TEMPLATE);
    afe_clear_to_marker(p);
    if (p->n_tmpl)
        p->n_tmpl--;
    reset_mode(p);
    return 0;
}

/* treebuilder._flush_table_text: all-whitespace pending runs insert
 * normally; anything else foster-parents via the in-body rules
 * (reconstruct-under-foster, then the text — one parse error per
 * fostered insertion, matching the Python machine exactly) */
static int flush_table_text(P *p)
{
    PyObject *s;
    Py_ssize_t i, n;
    int kind, nonws = 0;
    const void *data;
    if (p->tt == NULL) {
        p->mode = p->original_mode;
        return 0;
    }
    if (PyList_GET_SIZE(p->tt) == 1) {
        s = PyList_GET_ITEM(p->tt, 0);
        Py_INCREF(s);
    } else {
        s = PyUnicode_Join(g_empty_str, p->tt);
        if (s == NULL)
            return -1;
    }
    Py_CLEAR(p->tt);
    n = PyUnicode_GET_LENGTH(s);
    kind = PyUnicode_KIND(s);
    data = PyUnicode_DATA(s);
    for (i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (c != '\t' && c != '\n' && c != '\f' && c != ' ') {
            nonws = 1;
            break;
        }
    }
    if (nonws) {
        int r;
        p->foster = 1;
        p->frameset_ok = 0;
        r = reconstruct_afe(p);
        if (r == 0)
            r = pend_text(p, cur_top(p), s);
        p->foster = 0;
        Py_DECREF(s);
        CHECK(r);
    } else if (n > 0) {
        int r = pend_text(p, cur_top(p), s);
        Py_DECREF(s);
        CHECK(r);
    } else {
        Py_DECREF(s);
    }
    p->mode = p->original_mode;
    return 0;
}

static void close_cell(P *p)
{
    generate_implied(p, NULL);
    pop_until_tok(p, T_TDTH);
    afe_clear_to_marker(p);
    p->mode = M_IN_ROW;
}

/* treebuilder._add_attrs_if_missing */
static int add_attrs_if_missing(P *p, int nid, PyObject *attrs)
{
    CNode *node = NODE(p, nid);
    Py_ssize_t i, j;
    for (i = 0; i < PyList_GET_SIZE(attrs); i++) {
        PyObject *a = PyList_GET_ITEM(attrs, i);
        PyObject *an = PyList_GET_ITEM(a, 1);
        int have = 0;
        for (j = 0; j < PyList_GET_SIZE(node->attrs); j++) {
            PyObject *b = PyList_GET_ITEM(node->attrs, j);
            if (PyList_GET_ITEM(b, 1) == an) {
                have = 1;
                break;
            }
        }
        if (!have && PyList_Append(node->attrs, a) < 0)
            return -1;
    }
    return 0;
}

/* ---------------- forward decls ---------------- */
static int handle_start_html(P *p, const NameEnt *ne, PyObject *name,
                        PyObject *attrs, int self_closing);
static int handle_end_html(P *p, const NameEnt *ne, PyObject *name);
static int handle_start(P *p, const NameEnt *ne, PyObject *name,
                        PyObject *attrs, int self_closing);
static int handle_end(P *p, const NameEnt *ne, PyObject *name);
static int handle_chars(P *p, PyObject *s);
static int adjust_foreign_attrs(PyObject *attrs, int is_svg, int is_math);
static int uni_eq_lit(PyObject *s, const char *lit);
static int input_is_hidden(PyObject *attrs);
static int in_scope_name(P *p, PyObject *name);
static int in_body_end(P *p, const NameEnt *ne, PyObject *name);
static int adoption_agency(P *p, int tok, PyObject *name);

/* synthesize html/head/body (treebuilder._anything_else_to_body) */
static int synth_to_body(P *p)
{
    if (p->mode == M_INITIAL)
        p->mode = M_BEFORE_HTML;
    if (p->mode == M_BEFORE_HTML) {
        CNode *root;
        CHECK(flush_text(p));
        root = new_node(p, K_ELEMENT);
        if (root == NULL)
            return -1;
        Py_INCREF(NM_html);
        root->name = NM_html;
        Py_INCREF(g_html_ns);
        root->ns = g_html_ns;
        root->attrs = PyList_New(0);
        if (root->attrs == NULL)
            return -1;
        link_append(p, 0, root->id);
        CHECK(open_push(p, root->id, T_HTML, F_SP));
        p->mode = M_BEFORE_HEAD;
    }
    if (p->mode == M_BEFORE_HEAD) {
        PyObject *attrs = PyList_New(0);
        int hid;
        if (attrs == NULL)
            return -1;
        hid = insert_element(p, NM_head, attrs, T_HEAD, F_SP | F_IGB, 1);
        Py_DECREF(attrs);
        CHECK(hid);
        p->head_id = hid;
        p->mode = M_IN_HEAD;
    }
    if (p->mode == M_IN_HEAD) {
        p->n_open--;
        p->mode = M_AFTER_HEAD;
    }
    if (p->mode == M_AFTER_HEAD) {
        PyObject *attrs = PyList_New(0);
        int bid;
        if (attrs == NULL)
            return -1;
        bid = insert_element(p, NM_body, attrs, T_BODY, F_SP, 1);
        Py_DECREF(attrs);
        CHECK(bid);
        p->mode = M_IN_BODY;
    }
    return 0;
}

/* treebuilder._anything_else_to_body_until for a start tag */
static int synth_until_start(P *p, int tok)
{
    if (p->mode == M_INITIAL)
        p->mode = M_BEFORE_HTML;
    if (p->mode == M_BEFORE_HTML) {
        CNode *root;
        if (tok == T_HTML)
            return 0;
        CHECK(flush_text(p));
        root = new_node(p, K_ELEMENT);
        if (root == NULL)
            return -1;
        Py_INCREF(NM_html);
        root->name = NM_html;
        Py_INCREF(g_html_ns);
        root->ns = g_html_ns;
        root->attrs = PyList_New(0);
        if (root->attrs == NULL)
            return -1;
        link_append(p, 0, root->id);
        CHECK(open_push(p, root->id, T_HTML, F_SP));
        p->mode = M_BEFORE_HEAD;
    }
    if (p->mode == M_BEFORE_HEAD) {
        PyObject *attrs;
        int hid;
        if (tok == T_HTML || tok == T_HEAD)
            return 0;
        attrs = PyList_New(0);
        if (attrs == NULL)
            return -1;
        hid = insert_element(p, NM_head, attrs, T_HEAD, F_SP | F_IGB, 1);
        Py_DECREF(attrs);
        CHECK(hid);
        p->head_id = hid;
        p->mode = M_IN_HEAD;
    }
    return 0;
}

/* ---------------- in-head start (returns 1 handled, 0 not) ---------- */
static int generic_raw(P *p, PyObject *name, PyObject *attrs,
                       const NameEnt *ne, int kind)
{
    CHECK(insert_element(p, name, attrs, ne->tok, ne->flags, 1));
    p->raw_kind = kind;
    p->raw_ne = ne;
    p->original_mode = p->mode;
    p->mode = M_TEXT;
    return 0;
}

static int in_body_start(P *p, const NameEnt *ne, PyObject *name,
                         PyObject *attrs, int self_closing);

static int start_in_head(P *p, const NameEnt *ne, PyObject *name,
                         PyObject *attrs, int self_closing, int *handled)
{
    *handled = 1;
    switch (ne ? ne->tok : T_OTHER) {
    case T_HTML:
        return in_body_start(p, ne, name, attrs, self_closing);
    case T_HEADVOID:
        CHECK(insert_element(p, name, attrs, ne->tok, ne->flags, 1));
        p->n_open--;
        return 0;
    case T_TITLE:
        return generic_raw(p, name, attrs, ne, 1);
    case T_NOFRAMES:
    case T_STYLE:
    case T_NOSCRIPT:
        return generic_raw(p, name, attrs, ne, 2);
    case T_SCRIPT:
        return generic_raw(p, name, attrs, ne, 3);
    case T_TEMPLATE:
        /* treebuilder._start_in_head template arm */
        if (p->n_tmpl >= 64)
            ABORT(p);  /* absurd nesting: python lane */
        CHECK(insert_element(p, name, attrs, T_TEMPLATE, ne->flags, 1));
        CHECK(afe_push_marker(p));
        p->frameset_ok = 0;
        p->mode = M_IN_TEMPLATE;
        p->tmpl[p->n_tmpl++] = M_IN_TEMPLATE;
        return 0;
    case T_HEAD:
        return 0;  /* parse error per spec; Python ignores, no error */
    default:
        *handled = 0;
        return 0;
    }
}

/* ---------------- in-body start ---------------- */
static int in_body_start(P *p, const NameEnt *ne, PyObject *name,
                         PyObject *attrs, int self_closing)
{
    int tok = ne ? ne->tok : T_OTHER;
    uint32_t flags = ne ? ne->flags : 0;
    int handled;

    switch (tok) {
    case T_HTML:
        if (!template_on_stack(p))
            return add_attrs_if_missing(p, p->open[0].id, attrs);
        return 0;
    case T_BODY:
        if (p->n_open > 1 && p->open[1].tok == T_BODY
            && !template_on_stack(p)) {
            p->frameset_ok = 0;
            return add_attrs_if_missing(p, p->open[1].id, attrs);
        }
        return 0;
    case T_FRAMESET:
        /* honored only while frameset_ok: detach body, pop to html,
         * switch to the frameset machine (treebuilder.py:1339-1350) */
        if (!p->frameset_ok || p->n_open < 2)
            return 0;
        if (p->open[1].tok != T_BODY)
            return 0;
        CHECK(flush_text(p));
        unlink_node(p, p->open[1].id);
        p->n_open = 1;
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->mode = M_IN_FRAMESET;
        return 0;
    case T_FORM:
        if (p->form_id != -1 && !template_on_stack(p))
            return 0;
        close_p(p);
        {
            int fid = insert_element(p, name, attrs, tok, flags, 1);
            CHECK(fid);
            if (!template_on_stack(p))
                p->form_id = fid;
        }
        return 0;
    case T_LI: {
        int i;
        p->frameset_ok = 0;
        for (i = p->n_open - 1; i >= 0; i--) {
            OpenEnt *e = &p->open[i];
            if (e->tok == T_LI) {
                generate_implied(p, NODE(p, e->id)->name);
                pop_until_tok(p, T_LI);
                break;
            }
            if ((e->flags & F_SP) && !(e->flags & F_ADP))
                break;
        }
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    }
    case T_DD:
    case T_DT: {
        int i;
        p->frameset_ok = 0;
        for (i = p->n_open - 1; i >= 0; i--) {
            OpenEnt *e = &p->open[i];
            if (e->tok == T_DD || e->tok == T_DT) {
                generate_implied(p, NODE(p, e->id)->name);
                pop_until_tok(p, e->tok);
                break;
            }
            if ((e->flags & F_SP) && !(e->flags & F_ADP))
                break;
        }
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    }
    case T_BUTTON:
        if (in_scope_tok(p, T_BUTTON, 0, 0)) {
            generate_implied(p, NULL);
            pop_until_tok(p, T_BUTTON);
        }
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->frameset_ok = 0;
        return 0;
    case T_A: {
        /* misnested <a>: run the agency for the existing entry, then
         * drop it from afe/open if still present (treebuilder
         * in_body <a> arm; the scan stops at a marker) */
        int i;
        for (i = p->n_afe - 1; i >= 0; i--) {
            if (p->afe[i].name == NULL)
                break;
            if (p->afe[i].tok == T_A) {
                int a_el = p->afe[i].el;
                int j;
                CHECK(adoption_agency(p, T_A, name));
                for (j = 0; j < p->n_afe; j++)
                    if (p->afe[j].name != NULL && p->afe[j].el == a_el) {
                        afe_remove_at(p, j);
                        break;
                    }
                j = open_index_of(p, a_el);
                if (j != -1)
                    open_remove_at(p, j);
                break;
            }
        }
        CHECK(reconstruct_afe(p));
        {
            int el = insert_element(p, name, attrs, tok, flags, 1);
            CHECK(el);
            return afe_push_noah(p, el, tok, name, attrs);
        }
    }
    case T_FMTG: {
        int el;
        CHECK(reconstruct_afe(p));
        el = insert_element(p, name, attrs, tok, flags, 1);
        CHECK(el);
        return afe_push_noah(p, el, tok, name, attrs);
    }
    case T_APPLETG:
        /* treebuilder._in_body_start applet/marquee/object arm:
         * afe MARKER isolates formatting inside */
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->frameset_ok = 0;
        return afe_push_marker(p);
    case T_PLAINTEXT:
        /* raw-to-EOF: the scanner emits the rest as literal text */
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->raw_kind = 4;
        return 0;
    case T_NOBR: {
        int el;
        CHECK(reconstruct_afe(p));
        if (in_scope_tok(p, T_NOBR, 0, 0)) {
            CHECK(adoption_agency(p, T_NOBR, name));
            CHECK(reconstruct_afe(p));
        }
        el = insert_element(p, name, attrs, tok, flags, 1);
        CHECK(el);
        return afe_push_noah(p, el, tok, name, attrs);
    }
    case T_TABLE:
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->frameset_ok = 0;
        p->mode = M_IN_TABLE;
        return 0;
    case T_VOIDB:
    case T_BR:
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->n_open--;
        p->frameset_ok = 0;
        return 0;
    case T_INPUT:
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->n_open--;
        if (!input_is_hidden(attrs))
            p->frameset_ok = 0;
        return 0;
    case T_PST:
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->n_open--;
        return 0;
    case T_HR:
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->n_open--;
        p->frameset_ok = 0;
        return 0;
    case T_IMAGE: {
        const NameEnt *img = name_lookup((const uint8_t *)"img", 3);
        return in_body_start(p, img, NM_img, attrs, self_closing);
    }
    case T_PRELIST:
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->ignore_lf = 1;
        p->frameset_ok = 0;
        return 0;
    case T_TEXTAREA:
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->ignore_lf = 1;
        p->frameset_ok = 0;
        p->raw_kind = 1;
        p->raw_ne = ne;
        p->original_mode = p->mode;
        p->mode = M_TEXT;
        return 0;
    case T_XMP:
        close_p(p);
        CHECK(reconstruct_afe(p));
        p->frameset_ok = 0;
        return generic_raw(p, name, attrs, ne, 2);
    case T_IFRAME:
        p->frameset_ok = 0;
        return generic_raw(p, name, attrs, ne, 2);
    case T_NOEMBED:
    case T_NOSCRIPT:
        return generic_raw(p, name, attrs, ne, 2);
    case T_OPTION:
    case T_OPTGROUP:
        if (p->open[p->n_open - 1].tok == T_OPTION)
            p->n_open--;
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    case T_RB:
    case T_RTC:
        if (in_scope_tok(p, T_RUBY, 0, 0))
            generate_implied(p, NULL);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    case T_RPRT:
        if (in_scope_tok(p, T_RUBY, 0, 0))
            generate_implied(p, NM_rtc);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    case T_SELECT:
        /* treebuilder._in_body_start select arm: mode by the REAL
         * current mode (caption/cell reach here unmasked; the
         * in-table foster wrapper's postlude handles the masked
         * table modes) */
        CHECK(reconstruct_afe(p));
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        p->frameset_ok = 0;
        if (p->mode == M_IN_TABLE || p->mode == M_IN_CAPTION
            || p->mode == M_IN_TABLE_BODY || p->mode == M_IN_ROW
            || p->mode == M_IN_CELL)
            p->mode = M_IN_SELECT_IN_TABLE;
        else
            p->mode = M_IN_SELECT;
        return 0;
    case T_MATH:
    case T_SVG: {
        /* foreign roots (treebuilder._in_body_start math/svg arms):
         * case-adjusted attrs, ns'd insert, self-closing pops */
        int is_svg = (tok == T_SVG);
        int eid;
        CHECK(reconstruct_afe(p));
        CHECK(adjust_foreign_attrs(attrs, is_svg, !is_svg));
        eid = insert_element_ns(p, name, attrs, T_FOREIGN,
                                is_svg ? F_NS_SVG : F_NS_MATHML, 1,
                                is_svg ? g_svg_ns : g_mathml_ns);
        CHECK(eid);
        if (self_closing)
            p->n_open--;
        return 0;
    }
    default:
        break;
    }
    if (flags & F_IH) {
        CHECK(start_in_head(p, ne, name, attrs, self_closing, &handled));
        return 0;
    }
    if (flags & F_BC) {
        close_p(p);
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    }
    if (flags & F_HD) {
        close_p(p);
        if (p->open[p->n_open - 1].flags & F_HD)
            p->n_open--;
        CHECK(insert_element(p, name, attrs, tok, flags, 1));
        return 0;
    }
    if (flags & F_IGB)
        return 0;
    CHECK(reconstruct_afe(p));
    CHECK(insert_element(p, name, attrs, tok, flags, 1));
    return 0;
}

/* ---------------- in-table start/end (treebuilder._in_table_*) ------ */
static int in_table_start(P *p, const NameEnt *ne, PyObject *name,
                          PyObject *attrs, int self_closing)
{
    int tok = ne ? ne->tok : T_OTHER;
    int handled;
    switch (tok) {
    case T_CAPTION:
        clear_to_table_context(p);
        CHECK(afe_push_marker(p));
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        p->mode = M_IN_CAPTION;
        return 0;
    case T_COLGROUP:
        clear_to_table_context(p);
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        p->mode = M_IN_COLUMN_GROUP;
        return 0;
    case T_COL: {
        PyObject *empty = PyList_New(0);
        int r;
        if (empty == NULL)
            return -1;
        clear_to_table_context(p);
        r = insert_element(p, NM_colgroup, empty, T_COLGROUP,
                           F_SP | F_IGB, 1);
        Py_DECREF(empty);
        CHECK(r);
        p->mode = M_IN_COLUMN_GROUP;
        return handle_start_html(p, ne, name, attrs, self_closing);
    }
    case T_TBTFTH:
        clear_to_table_context(p);
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        p->mode = M_IN_TABLE_BODY;
        return 0;
    case T_TDTH:
    case T_TR: {
        PyObject *empty = PyList_New(0);
        int r;
        if (empty == NULL)
            return -1;
        clear_to_table_context(p);
        r = insert_element(p, NM_tbody, empty, T_TBTFTH, F_SP | F_IGB, 1);
        Py_DECREF(empty);
        CHECK(r);
        p->mode = M_IN_TABLE_BODY;
        return handle_start_html(p, ne, name, attrs, self_closing);
    }
    case T_TABLE:
        if (in_table_scope_tok(p, T_TABLE)) {
            pop_until_tok(p, T_TABLE);
            reset_mode(p);
            return handle_start_html(p, ne, name, attrs, self_closing);
        }
        return 0;
    case T_STYLE:
    case T_SCRIPT:
    case T_TEMPLATE:
        return start_in_head(p, ne, name, attrs, self_closing, &handled);
    case T_INPUT: {
        /* type=hidden inserts in place; anything else foster-parents */
        if (input_is_hidden(attrs)) {
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->n_open--;
            return 0;
        }
        break;
    }
    case T_FORM:
        if (p->form_id == -1 && !template_on_stack(p)) {
            int fid = insert_element(p, name, attrs, tok, ne->flags, 1);
            CHECK(fid);
            p->form_id = fid;
            p->n_open--;
        }
        return 0;
    default:
        break;
    }
    /* anything else: foster-parented in-body processing */
    {
        int saved = p->mode, r;
        p->foster = 1;
        p->mode = M_IN_BODY;
        r = in_body_start(p, ne, name, attrs, self_closing);
        if (p->mode == M_IN_BODY)
            p->mode = saved;
        else if (p->mode == M_IN_SELECT)
            /* in-body <select> under the wrapper mask: the REAL mode
             * is a table mode (treebuilder.py:1303-1307) */
            p->mode = M_IN_SELECT_IN_TABLE;
        p->foster = 0;
        return r;
    }
}

static int in_table_end(P *p, const NameEnt *ne, PyObject *name)
{
    int tok = ne ? ne->tok : T_OTHER;
    switch (tok) {
    case T_TABLE:
        if (in_table_scope_tok(p, T_TABLE)) {
            pop_until_tok(p, T_TABLE);
            reset_mode(p);
        }
        return 0;
    case T_BODY:
    case T_CAPTION:
    case T_COL:
    case T_COLGROUP:
    case T_HTML:
    case T_TBTFTH:
    case T_TDTH:
    case T_TR:
        return 0;
    case T_TEMPLATE:
        return end_template(p);
    default: {
        int saved = p->mode, r;
        p->foster = 1;
        p->mode = M_IN_BODY;
        r = in_body_end(p, ne, name);
        if (p->mode == M_IN_BODY)
            p->mode = saved;
        p->foster = 0;
        return r;
    }
    }
}

/* type attribute equals "hidden" case-insensitively
 * (in-table input arm + the frameset_ok rule) */
static int input_is_hidden(PyObject *attrs)
{
    Py_ssize_t k;
    for (k = 0; k < PyList_GET_SIZE(attrs); k++) {
        PyObject *a = PyList_GET_ITEM(attrs, k);
        if (PyList_GET_ITEM(a, 1) == NM_type) {
            PyObject *v = PyList_GET_ITEM(a, 2);
            if (PyUnicode_GET_LENGTH(v) == 6) {
                static const char H[] = "hidden";
                int x;
                for (x = 0; x < 6; x++) {
                    Py_UCS4 c = PyUnicode_READ_CHAR(v, x);
                    if (c >= 'A' && c <= 'Z')
                        c += 32;
                    if (c != (Py_UCS4)H[x])
                        return 0;
                }
                return 1;
            }
            return 0;
        }
    }
    return 0;
}

/* ---------------- in select ----------------
 * treebuilder._in_select_start / the IN_SELECT(_IN_TABLE) end rules.
 * select scope: every element type EXCEPT html optgroup/option is a
 * boundary (treebuilder._select_scope_ok). */
static int select_scope_ok(P *p)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        int t = p->open[i].tok;
        if (p->open[i].flags & F_NS_FOREIGN)
            return 0;
        if (t == T_SELECT)
            return 1;
        if (t != T_OPTION && t != T_OPTGROUP)
            return 0;
    }
    return 0;
}

static int in_select_start(P *p, const NameEnt *ne, PyObject *name,
                           PyObject *attrs, int self_closing)
{
    int tok = ne ? ne->tok : T_OTHER;
    int handled;
    if (p->mode == M_IN_SELECT_IN_TABLE
        && (tok == T_CAPTION || tok == T_TABLE || tok == T_TBTFTH
            || tok == T_TDTH || tok == T_TR)) {
        pop_until_tok(p, T_SELECT);
        reset_mode(p);
        return handle_start_html(p, ne, name, attrs, self_closing);
    }
    switch (tok) {
    case T_HTML:
        return in_body_start(p, ne, name, attrs, self_closing);
    case T_OPTION:
        if (p->open[p->n_open - 1].tok == T_OPTION)
            p->n_open--;
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        return 0;
    case T_OPTGROUP:
        if (p->open[p->n_open - 1].tok == T_OPTION)
            p->n_open--;
        if (p->open[p->n_open - 1].tok == T_OPTGROUP)
            p->n_open--;
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        return 0;
    case T_HR:
        if (p->open[p->n_open - 1].tok == T_OPTION)
            p->n_open--;
        if (p->open[p->n_open - 1].tok == T_OPTGROUP)
            p->n_open--;
        CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
        p->n_open--;
        return 0;
    case T_SELECT:
        if (select_scope_ok(p)) {
            pop_until_tok(p, T_SELECT);
            reset_mode(p);
        }
        return 0;
    case T_SCRIPT:
    case T_TEMPLATE:
        return start_in_head(p, ne, name, attrs, self_closing, &handled);
    default:
        if (tok == T_INPUT || tok == T_TEXTAREA
            || (tok == T_VOIDB && uni_eq_lit(name, "keygen"))) {
            if (select_scope_ok(p)) {
                pop_until_tok(p, T_SELECT);
                reset_mode(p);
                /* reprocessed with self_closing FORCED off
                 * (treebuilder.py:1235: self._start(name, attrs, False)) */
                return handle_start_html(p, ne, name, attrs, 0);
            }
            return 0;
        }
        return 0;  /* anything else: ignore */
    }
}

static int in_select_end(P *p, const NameEnt *ne, PyObject *name)
{
    int tok = ne ? ne->tok : T_OTHER;
    if (p->mode == M_IN_SELECT_IN_TABLE
        && (tok == T_CAPTION || tok == T_TABLE || tok == T_TBTFTH
            || tok == T_TDTH || tok == T_TR)) {
        /* name-based TABLE_SCOPE check: T_TBTFTH/T_TDTH group several
         * names, but Python scopes the exact tag name */
        if (in_table_scope_name(p, name)) {
            pop_until_tok(p, T_SELECT);
            reset_mode(p);
            return handle_end_html(p, ne, name);
        }
        return 0;
    }
    switch (tok) {
    case T_OPTGROUP:
        if (p->open[p->n_open - 1].tok == T_OPTION && p->n_open > 1
            && p->open[p->n_open - 2].tok == T_OPTGROUP)
            p->n_open--;
        if (p->open[p->n_open - 1].tok == T_OPTGROUP)
            p->n_open--;
        return 0;
    case T_OPTION:
        if (p->open[p->n_open - 1].tok == T_OPTION)
            p->n_open--;
        return 0;
    case T_SELECT:
        if (select_scope_ok(p)) {
            pop_until_tok(p, T_SELECT);
            reset_mode(p);
        }
        return 0;
    case T_TEMPLATE:
        return end_template(p);
    default:
        return 0;
    }
}

/* ---------------- start dispatch ---------------- */
static int handle_start_html(P *p, const NameEnt *ne, PyObject *name,
                        PyObject *attrs, int self_closing)
{
    int tok = ne ? ne->tok : T_OTHER;
    int handled;

    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->mode == M_IN_TABLE_TEXT)
        CHECK(flush_table_text(p));

    switch (p->mode) {
    case M_INITIAL:
    case M_BEFORE_HTML:
    case M_BEFORE_HEAD:
        if (tok == T_HTML && p->mode != M_INITIAL) {
            if (p->mode == M_BEFORE_HTML) {
                CNode *root;
                CHECK(flush_text(p));
                root = new_node(p, K_ELEMENT);
                if (root == NULL)
                    return -1;
                Py_INCREF(name);
                root->name = name;
                Py_INCREF(g_html_ns);
                root->ns = g_html_ns;
                Py_INCREF(attrs);
                root->attrs = attrs;
                link_append(p, 0, root->id);
                CHECK(open_push(p, root->id, T_HTML, F_SP));
                p->mode = M_BEFORE_HEAD;
                return 0;
            }
            return add_attrs_if_missing(p, p->open[0].id, attrs);
        }
        if (p->mode == M_BEFORE_HEAD && tok == T_HEAD) {
            int hid = insert_element(p, name, attrs, T_HEAD,
                                     F_SP | F_IGB, 1);
            CHECK(hid);
            p->head_id = hid;
            p->mode = M_IN_HEAD;
            return 0;
        }
        CHECK(synth_until_start(p, tok));
        return handle_start_html(p, ne, name, attrs, self_closing);
    case M_IN_HEAD:
        CHECK(start_in_head(p, ne, name, attrs, self_closing, &handled));
        if (handled)
            return 0;
        p->n_open--;
        p->mode = M_AFTER_HEAD;
        return handle_start_html(p, ne, name, attrs, self_closing);
    case M_AFTER_HEAD:
        if (tok == T_HTML)
            return in_body_start(p, ne, name, attrs, self_closing);
        if (tok == T_BODY) {
            CHECK(insert_element(p, name, attrs, T_BODY, F_SP, 1));
            p->frameset_ok = 0;
            p->mode = M_IN_BODY;
            return 0;
        }
        if (tok == T_FRAMESET) {
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->mode = M_IN_FRAMESET;
            return 0;
        }
        if (ne && (ne->flags & F_IH)) {
            /* parse error: re-enter head (treebuilder.py:975-981) */
            int i;
            CHECK(open_push(p, p->head_id, T_HEAD, F_SP | F_IGB));
            CHECK(start_in_head(p, ne, name, attrs, self_closing,
                                &handled));
            for (i = p->n_open - 1; i >= 0; i--)
                if (p->open[i].id == p->head_id) {
                    memmove(&p->open[i], &p->open[i + 1],
                            (p->n_open - i - 1) * sizeof(OpenEnt));
                    p->n_open--;
                    break;
                }
            return 0;
        }
        if (tok == T_HEAD)
            return 0;
        {
            PyObject *battrs = PyList_New(0);
            int bid;
            if (battrs == NULL)
                return -1;
            bid = insert_element(p, NM_body, battrs, T_BODY, F_SP, 1);
            Py_DECREF(battrs);
            CHECK(bid);
        }
        p->mode = M_IN_BODY;
        return handle_start_html(p, ne, name, attrs, self_closing);
    case M_IN_BODY:
        return in_body_start(p, ne, name, attrs, self_closing);
    case M_IN_TABLE:
        return in_table_start(p, ne, name, attrs, self_closing);
    case M_IN_CAPTION:
        if (tok == T_CAPTION || tok == T_COL || tok == T_COLGROUP
            || tok == T_TBTFTH || tok == T_TDTH || tok == T_TR) {
            if (in_table_scope_tok(p, T_CAPTION)) {
                generate_implied(p, NULL);
                pop_until_tok(p, T_CAPTION);
                afe_clear_to_marker(p);
                p->mode = M_IN_TABLE;
                return handle_start_html(p, ne, name, attrs, self_closing);
            }
            return 0;
        }
        return in_body_start(p, ne, name, attrs, self_closing);
    case M_IN_COLUMN_GROUP:
        if (tok == T_HTML)
            return in_body_start(p, ne, name, attrs, self_closing);
        if (tok == T_COL) {
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->n_open--;
            return 0;
        }
        if (tok == T_TEMPLATE)
            return start_in_head(p, ne, name, attrs, self_closing,
                                 &handled);
        if (p->open[p->n_open - 1].tok == T_COLGROUP) {
            p->n_open--;
            p->mode = M_IN_TABLE;
            return handle_start_html(p, ne, name, attrs, self_closing);
        }
        return 0;
    case M_IN_TABLE_BODY:
        if (tok == T_TR) {
            clear_to_table_body_context(p);
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->mode = M_IN_ROW;
            return 0;
        }
        if (tok == T_TDTH) {
            PyObject *empty = PyList_New(0);
            int r;
            if (empty == NULL)
                return -1;
            clear_to_table_body_context(p);
            r = insert_element(p, NM_tr, empty, T_TR, F_SP | F_IGB, 1);
            Py_DECREF(empty);
            CHECK(r);
            p->mode = M_IN_ROW;
            return handle_start_html(p, ne, name, attrs, self_closing);
        }
        if (tok == T_CAPTION || tok == T_COL || tok == T_COLGROUP
            || tok == T_TBTFTH) {
            if (in_table_scope_tok(p, T_TBTFTH)) {
                clear_to_table_body_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE;
                return handle_start_html(p, ne, name, attrs, self_closing);
            }
            return 0;
        }
        return in_table_start(p, ne, name, attrs, self_closing);
    case M_IN_ROW:
        if (tok == T_TDTH) {
            clear_to_row_context(p);
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->mode = M_IN_CELL;
            return afe_push_marker(p);
        }
        if (tok == T_CAPTION || tok == T_COL || tok == T_COLGROUP
            || tok == T_TBTFTH || tok == T_TR) {
            if (in_table_scope_tok(p, T_TR)) {
                clear_to_row_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE_BODY;
                return handle_start_html(p, ne, name, attrs, self_closing);
            }
            return 0;
        }
        return in_table_start(p, ne, name, attrs, self_closing);
    case M_IN_CELL:
        if (tok == T_CAPTION || tok == T_COL || tok == T_COLGROUP
            || tok == T_TBTFTH || tok == T_TDTH || tok == T_TR) {
            if (in_table_scope_tok(p, T_TDTH)) {
                close_cell(p);
                return handle_start_html(p, ne, name, attrs, self_closing);
            }
            return 0;
        }
        return in_body_start(p, ne, name, attrs, self_closing);
    case M_IN_SELECT:
    case M_IN_SELECT_IN_TABLE:
        return in_select_start(p, ne, name, attrs, self_closing);
    case M_IN_FRAMESET:
        if (tok == T_HTML)
            return in_body_start(p, ne, name, attrs, self_closing);
        if (tok == T_FRAMESET) {
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            return 0;
        }
        if (tok == T_FRAME) {
            CHECK(insert_element(p, name, attrs, tok, ne->flags, 1));
            p->n_open--;
            return 0;
        }
        if (tok == T_NOFRAMES)
            return start_in_head(p, ne, name, attrs, self_closing,
                                 &handled);
        return 0;
    case M_AFTER_FRAMESET:
    case M_AFTER_AFTER_FRAMESET:
        if (tok == T_HTML)
            return in_body_start(p, ne, name, attrs, self_closing);
        if (tok == T_NOFRAMES)
            return start_in_head(p, ne, name, attrs, self_closing,
                                 &handled);
        return 0;
    case M_IN_TEMPLATE:
        /* treebuilder._start IN_TEMPLATE arm: head-start names go to
         * in-head; table tokens rewrite the current template mode and
         * reprocess; anything else reprocesses in body */
        if (ne && (ne->flags & F_IH))
            return start_in_head(p, ne, name, attrs, self_closing,
                                 &handled);
        {
            int nm2 = -1;
            if (tok == T_CAPTION || tok == T_COLGROUP || tok == T_TBTFTH)
                nm2 = M_IN_TABLE;
            else if (tok == T_COL)
                nm2 = M_IN_COLUMN_GROUP;
            else if (tok == T_TR)
                nm2 = M_IN_TABLE_BODY;
            else if (tok == T_TDTH)
                nm2 = M_IN_ROW;
            else
                nm2 = M_IN_BODY;
            if (p->n_tmpl)
                p->tmpl[p->n_tmpl - 1] = nm2;
            p->mode = nm2;
            return handle_start_html(p, ne, name, attrs, self_closing);
        }
    case M_AFTER_BODY:
    case M_AFTER_AFTER_BODY:
        if (tok == T_HTML)
            return in_body_start(p, ne, name, attrs, self_closing);
        p->mode = M_IN_BODY;
        return handle_start_html(p, ne, name, attrs, self_closing);
    default:
        ABORT(p);
    }
}

/* ---------------- end tags ---------------- */
/* treebuilder._any_other_end_tag; special hit => parse error, ignore */
static int any_other_end(P *p, PyObject *name)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        /* name match requires ns == HTML (foreign entries are only
         * special-stops here, treebuilder._any_other_end_tag) */
        if (!(e->flags & F_NS_FOREIGN) && NODE(p, e->id)->name == name) {
            generate_implied(p, name);
            p->n_open = i;
            return 0;
        }
        if (e->flags & F_SP)
            return parse_error_tag(p, "unexpected-end-tag-", name);
    }
    return 0;
}

/* treebuilder._adoption_agency (WHATWG; html5lib-style bookkeeping):
 * the well-formed fast path, then the full 8-iteration agency for
 * misnested formatting.  Entry objects are tracked by INDEX (the C
 * afe is a flat array, so every remove/insert adjusts fmt_idx /
 * bookmark exactly where Python re-derives .index(entry)).  The one
 * remaining abort: a table-ish common ancestor (the agency's
 * foster-parenting arm) => Python lane. */
static int adoption_agency(P *p, int tok, PyObject *name)
{
    int outer;
    OpenEnt *cur = &p->open[p->n_open - 1];
    (void)tok;
    if (NODE(p, cur->id)->name == name) {
        int cur_id = cur->id, i, entry = -1, any_cur = 0;
        /* entry search stops at a marker (Python's backward loop) */
        for (i = p->n_afe - 1; i >= 0; i--) {
            if (p->afe[i].name == NULL)
                break;
            if (p->afe[i].name == name) {
                entry = i;
                break;
            }
        }
        /* the all(e.el != cur_id) check spans the WHOLE list */
        for (i = 0; i < p->n_afe; i++)
            if (p->afe[i].name != NULL && p->afe[i].el == cur_id)
                any_cur = 1;
        if (entry == -1 || !any_cur) {
            p->n_open--;
            return 0;
        }
        if (p->afe[entry].el == cur_id) {
            p->n_open--;
            afe_remove_at(p, entry);
            return 0;
        }
    }
    /* deep path: tree surgery ahead — flush the pending text run first
     * (Python inserts text eagerly, so post-flush state is identical) */
    CHECK(flush_text(p));
    CHECK(parse_error_tag(p, "misnested-tag-", name));
    for (outer = 0; outer < 8; outer++) {
        int fmt_idx = -1, fmt_el, si, furthest = -1, f_oidx = -1;
        int common_ancestor, bookmark, last_node, node_idx, inner, i, j;
        for (i = p->n_afe - 1; i >= 0; i--) {
            if (p->afe[i].name == NULL)
                break;
            if (p->afe[i].name == name) {
                fmt_idx = i;
                break;
            }
        }
        if (fmt_idx == -1)
            return any_other_end(p, name);
        fmt_el = p->afe[fmt_idx].el;
        if (!on_open_stack(p, fmt_el)) {
            afe_remove_at(p, fmt_idx);
            return 0;
        }
        if (!el_in_scope(p, fmt_el))
            return 0;
        si = open_index_of(p, fmt_el);
        for (j = si + 1; j < p->n_open; j++)
            if (p->open[j].flags & F_SP) {
                furthest = p->open[j].id;
                f_oidx = j;
                break;
            }
        if (furthest == -1) {
            p->n_open = si;
            afe_remove_at(p, fmt_idx);
            return 0;
        }
        common_ancestor = p->open[si - 1].id;
        bookmark = fmt_idx;
        last_node = furthest;
        node_idx = f_oidx;
        inner = 0;
        while (1) {
            int node, node_afe = -1;
            inner++;
            node_idx--;
            node = p->open[node_idx].id;
            /* spec order: the formatting-element break comes BEFORE
             * the counter>3 AFE eviction */
            if (node == fmt_el)
                break;
            for (i = 0; i < p->n_afe; i++)
                if (p->afe[i].name != NULL && p->afe[i].el == node) {
                    node_afe = i;
                    break;
                }
            if (inner > 3 && node_afe != -1) {
                afe_remove_at(p, node_afe);
                if (node_afe < fmt_idx)
                    fmt_idx--;
                if (fmt_idx < bookmark)
                    bookmark--;
                node_afe = -1;
            }
            if (node_afe == -1) {
                open_remove_at(p, node_idx);
                continue;
            }
            {
                int clone = create_element(p, p->afe[node_afe].name,
                                           p->afe[node_afe].attrs);
                CHECK(clone);
                p->afe[node_afe].el = clone;
                p->open[node_idx].id = clone;  /* same name: tok/flags keep */
                node = clone;
                if (last_node == furthest)
                    bookmark = node_afe + 1;
                unlink_node(p, last_node);
                link_append(p, node, last_node);
                last_node = node;
            }
        }
        unlink_node(p, last_node);
        if (TABLEISH(p->open[si - 1].tok)) {
            /* agency foster-parenting arm (treebuilder.py:556-561):
             * insertion point computed with foster forced on */
            int fpar, fbef;
            CHECK(foster_point(p, &fpar, &fbef));
            if (fbef != -1)
                link_insert_before(p, fbef, last_node);
            else
                link_append(p, fpar, last_node);
        } else if (p->open[si - 1].tok == T_TEMPLATE) {
            /* template common ancestor: into its contents document
             * (treebuilder.py:562-563) */
            link_append(p, NODE(p, common_ancestor)->tc, last_node);
        } else {
            link_append(p, common_ancestor, last_node);
        }
        {
            int clone2, old_idx, f2, r;
            int f_tok = p->afe[fmt_idx].tok;
            PyObject *f_name = p->afe[fmt_idx].name;
            PyObject *f_attrs = p->afe[fmt_idx].attrs;
            PyObject *acopy;
            Py_INCREF(f_name);
            Py_INCREF(f_attrs);
            clone2 = create_element(p, f_name, f_attrs);
            if (clone2 < 0) {
                Py_DECREF(f_name);
                Py_DECREF(f_attrs);
                return -1;
            }
            reparent_children_c(p, furthest, clone2);
            link_append(p, furthest, clone2);
            if (bookmark > p->n_afe)
                bookmark = p->n_afe;
            old_idx = fmt_idx;
            afe_remove_at(p, fmt_idx);
            if (old_idx < bookmark)
                bookmark--;
            acopy = copy_attrs(f_attrs);
            Py_DECREF(f_attrs);
            if (acopy == NULL) {
                Py_DECREF(f_name);
                return -1;
            }
            r = afe_insert_at(p, bookmark, clone2, f_tok, f_name, acopy);
            Py_DECREF(f_name);
            Py_DECREF(acopy);
            CHECK(r);
            open_remove_at(p, open_index_of(p, fmt_el));
            f2 = open_index_of(p, furthest);
            CHECK(open_insert_at(p, f2 + 1, clone2, f_tok, F_FMT));
        }
    }
    return 0;
}

static int in_body_end(P *p, const NameEnt *ne, PyObject *name)
{
    int tok = ne ? ne->tok : T_OTHER;
    uint32_t flags = ne ? ne->flags : 0;

    switch (tok) {
    case T_TEMPLATE:
        return end_template(p);
    case T_BODY:
        if (in_scope_tok(p, T_BODY, 0, 0))
            p->mode = M_AFTER_BODY;
        return 0;
    case T_HTML:
        if (in_scope_tok(p, T_BODY, 0, 0)) {
            p->mode = M_AFTER_BODY;
            return handle_end_html(p, ne, name);
        }
        return 0;
    case T_BUTTON:
    case T_PRELIST:
        /* name match, not tok match: T_PRELIST covers pre AND listing */
        if (in_scope_name(p, name)) {
            generate_implied(p, NULL);
            pop_until_name(p, name);
        }
        return 0;
    case T_FORM: {
        int node, i;
        if (template_on_stack(p)) {
            if (in_scope_tok(p, T_FORM, 0, 0)) {
                generate_implied(p, NULL);
                pop_until_tok(p, T_FORM);
            }
            return 0;
        }
        node = p->form_id;
        p->form_id = -1;
        if (node == -1 || !el_in_scope(p, node))
            return 0;
        generate_implied(p, NULL);
        for (i = p->n_open - 1; i >= 0; i--)
            if (p->open[i].id == node) {
                memmove(&p->open[i], &p->open[i + 1],
                        (p->n_open - i - 1) * sizeof(OpenEnt));
                p->n_open--;
                break;
            }
        return 0;
    }
    case T_P:
        if (!in_scope_tok(p, T_P, 1, 0)) {
            PyObject *attrs = PyList_New(0);
            int pid;
            if (attrs == NULL)
                return -1;
            pid = insert_element(p, NM_p, attrs, T_P,
                                 F_SP | F_BC | F_IMP | F_ADP, 1);
            Py_DECREF(attrs);
            CHECK(pid);
        }
        close_p(p);
        return 0;
    case T_LI:
        if (in_scope_tok(p, T_LI, 0, 1)) {
            generate_implied(p, name);
            pop_until_tok(p, T_LI);
        }
        return 0;
    case T_DD:
    case T_DT:
        if (in_scope_tok(p, tok, 0, 0)) {
            generate_implied(p, name);
            pop_until_tok(p, tok);
        }
        return 0;
    case T_A:
    case T_NOBR:
    case T_FMTG:
        return adoption_agency(p, tok, name);
    case T_APPLETG:
        /* name-exact default-scope check (applet/marquee/object share
         * a tok but Python scopes the exact name) */
        if (in_scope_name(p, name)) {
            generate_implied(p, NULL);
            pop_until_name(p, name);
            afe_clear_to_marker(p);
        }
        return 0;
    case T_BR: {
        PyObject *attrs = PyList_New(0);
        int r;
        if (attrs == NULL)
            return -1;
        r = in_body_start(p, ne, name, attrs, 0);
        Py_DECREF(attrs);
        return r;
    }
    default:
        break;
    }
    if ((flags & F_BC) && tok != T_P) {
        if (in_scope_name(p, name)) {
            generate_implied(p, NULL);
            pop_until_name(p, name);
        }
        return 0;
    }
    if (flags & F_HD) {
        if (in_scope_flag(p, F_HD)) {
            generate_implied(p, NULL);
            pop_until_flag(p, F_HD);
        }
        return 0;
    }
    return any_other_end(p, name);
}

static int handle_end_html(P *p, const NameEnt *ne, PyObject *name)
{
    int tok = ne ? ne->tok : T_OTHER;

    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->mode == M_IN_TABLE_TEXT)
        CHECK(flush_table_text(p));

    switch (p->mode) {
    case M_INITIAL:
    case M_BEFORE_HTML:
    case M_BEFORE_HEAD:
        if (tok != T_HEAD && tok != T_BODY && tok != T_HTML && tok != T_BR)
            return 0;
        CHECK(synth_until_start(p, -1));
        return handle_end_html(p, ne, name);
    case M_IN_HEAD:
        if (tok == T_HEAD) {
            p->n_open--;
            p->mode = M_AFTER_HEAD;
            return 0;
        }
        if (tok == T_TEMPLATE)
            return end_template(p);
        if (tok != T_BODY && tok != T_HTML && tok != T_BR)
            return 0;
        p->n_open--;
        p->mode = M_AFTER_HEAD;
        return handle_end_html(p, ne, name);
    case M_AFTER_HEAD:
        if (tok == T_TEMPLATE)
            return end_template(p);
        if (tok != T_BODY && tok != T_HTML && tok != T_BR)
            return 0;
        {
            PyObject *battrs = PyList_New(0);
            int bid;
            if (battrs == NULL)
                return -1;
            bid = insert_element(p, NM_body, battrs, T_BODY, F_SP, 1);
            Py_DECREF(battrs);
            CHECK(bid);
        }
        p->mode = M_IN_BODY;
        return handle_end_html(p, ne, name);
    case M_IN_BODY:
        return in_body_end(p, ne, name);
    case M_TEXT:
        CHECK(flush_text(p));
        p->n_open--;
        p->mode = p->original_mode;
        return 0;
    case M_IN_TABLE:
        return in_table_end(p, ne, name);
    case M_IN_CAPTION:
        if (tok == T_CAPTION) {
            if (in_table_scope_tok(p, T_CAPTION)) {
                generate_implied(p, NULL);
                pop_until_tok(p, T_CAPTION);
                afe_clear_to_marker(p);
                p->mode = M_IN_TABLE;
            }
            return 0;
        }
        if (tok == T_TABLE) {
            if (in_table_scope_tok(p, T_CAPTION)) {
                generate_implied(p, NULL);
                pop_until_tok(p, T_CAPTION);
                afe_clear_to_marker(p);
                p->mode = M_IN_TABLE;
                return handle_end_html(p, ne, name);
            }
            return 0;
        }
        if (tok == T_BODY || tok == T_COL || tok == T_COLGROUP
            || tok == T_HTML || tok == T_TBTFTH || tok == T_TDTH
            || tok == T_TR)
            return 0;
        return in_body_end(p, ne, name);
    case M_IN_COLUMN_GROUP:
        if (tok == T_COLGROUP) {
            if (p->open[p->n_open - 1].tok == T_COLGROUP) {
                p->n_open--;
                p->mode = M_IN_TABLE;
            }
            return 0;
        }
        if (tok == T_COL)
            return 0;
        if (tok == T_TEMPLATE)
            return end_template(p);
        if (p->open[p->n_open - 1].tok == T_COLGROUP) {
            p->n_open--;
            p->mode = M_IN_TABLE;
            return handle_end_html(p, ne, name);
        }
        return 0;
    case M_IN_TABLE_BODY:
        if (tok == T_TBTFTH) {
            if (in_table_scope_name(p, name)) {
                clear_to_table_body_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE;
            }
            return 0;
        }
        if (tok == T_TABLE) {
            if (in_table_scope_tok(p, T_TBTFTH)) {
                clear_to_table_body_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE;
                return handle_end_html(p, ne, name);
            }
            return 0;
        }
        if (tok == T_BODY || tok == T_CAPTION || tok == T_COL
            || tok == T_COLGROUP || tok == T_HTML || tok == T_TDTH
            || tok == T_TR)
            return 0;
        return in_table_end(p, ne, name);
    case M_IN_ROW:
        if (tok == T_TR) {
            if (in_table_scope_tok(p, T_TR)) {
                clear_to_row_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE_BODY;
            }
            return 0;
        }
        if (tok == T_TABLE) {
            if (in_table_scope_tok(p, T_TR)) {
                clear_to_row_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE_BODY;
                return handle_end_html(p, ne, name);
            }
            return 0;
        }
        if (tok == T_TBTFTH) {
            if (in_table_scope_name(p, name)
                && in_table_scope_tok(p, T_TR)) {
                clear_to_row_context(p);
                p->n_open--;
                p->mode = M_IN_TABLE_BODY;
                return handle_end_html(p, ne, name);
            }
            return 0;
        }
        if (tok == T_BODY || tok == T_CAPTION || tok == T_COL
            || tok == T_COLGROUP || tok == T_HTML || tok == T_TDTH)
            return 0;
        return in_table_end(p, ne, name);
    case M_IN_CELL:
        if (tok == T_TDTH) {
            if (in_table_scope_name(p, name)) {
                generate_implied(p, NULL);
                pop_until_name(p, name);
                afe_clear_to_marker(p);
                p->mode = M_IN_ROW;
            }
            return 0;
        }
        if (tok == T_BODY || tok == T_CAPTION || tok == T_COL
            || tok == T_COLGROUP || tok == T_HTML)
            return 0;
        if (tok == T_TABLE || tok == T_TBTFTH || tok == T_TR) {
            if (in_table_scope_name(p, name)) {
                close_cell(p);
                return handle_end_html(p, ne, name);
            }
            return 0;
        }
        return in_body_end(p, ne, name);
    case M_IN_SELECT:
    case M_IN_SELECT_IN_TABLE:
        return in_select_end(p, ne, name);
    case M_IN_TEMPLATE:
        if (tok == T_TEMPLATE)
            return end_template(p);
        return 0;
    case M_IN_FRAMESET:
        if (tok == T_FRAMESET) {
            if (p->n_open == 1)
                return 0;
            p->n_open--;
            if (p->open[p->n_open - 1].tok != T_FRAMESET)
                p->mode = M_AFTER_FRAMESET;
        }
        return 0;
    case M_AFTER_FRAMESET:
        if (tok == T_HTML)
            p->mode = M_AFTER_AFTER_FRAMESET;
        return 0;
    case M_AFTER_AFTER_FRAMESET:
        return 0;
    case M_AFTER_BODY:
        if (tok == T_HTML) {
            p->mode = M_AFTER_AFTER_BODY;
            return 0;
        }
        p->mode = M_IN_BODY;
        return handle_end_html(p, ne, name);
    case M_AFTER_AFTER_BODY:
        p->mode = M_IN_BODY;
        return handle_end_html(p, ne, name);
    default:
        ABORT(p);
    }
}

/* ---------------- foreign content (svg / mathml) ----------------
 * treebuilder._dispatch_foreign / _foreign_start / _foreign_end.
 * Foreign open entries carry tok T_FOREIGN (matching Python's
 * ns == HTML_NS guard on every scope/pop/implied name comparison)
 * plus F_NS_* / integration-point bits; F_SCOPEB and F_SP are set
 * exactly for SPECIAL_MATHML / SPECIAL_SVG (ns-aware DEFAULT_SCOPE
 * and _is_special). */

/* case-insensitive ASCII equality; -1 when either side has a
 * non-ASCII char (Python's full str.lower() could then diverge from
 * ASCII lowering => caller aborts to the Python lane) */
static int ascii_lower_equal(PyObject *a, PyObject *b)
{
    Py_ssize_t i, n = PyUnicode_GET_LENGTH(a);
    int ka, kb;
    const void *da, *db;
    if (PyUnicode_GET_LENGTH(b) != n)
        return 0;
    ka = PyUnicode_KIND(a);
    da = PyUnicode_DATA(a);
    kb = PyUnicode_KIND(b);
    db = PyUnicode_DATA(b);
    for (i = 0; i < n; i++) {
        Py_UCS4 ca = PyUnicode_READ(ka, da, i);
        Py_UCS4 cb = PyUnicode_READ(kb, db, i);
        if (ca >= 0x80 || cb >= 0x80)
            return -1;
        if (ca >= 'A' && ca <= 'Z')
            ca += 32;
        if (cb >= 'A' && cb <= 'Z')
            cb += 32;
        if (ca != cb)
            return 0;
    }
    return 1;
}

/* value.lower() == ascii literal (attr values: encoding=text/html) */
static int ascii_ieq_lit(PyObject *v, const char *lit)
{
    Py_ssize_t i, n = PyUnicode_GET_LENGTH(v);
    int k = PyUnicode_KIND(v);
    const void *d = PyUnicode_DATA(v);
    for (i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(k, d, i);
        if (lit[i] == '\0')
            return 0;
        if (c >= 'A' && c <= 'Z')
            c += 32;
        if (c != (Py_UCS4)(unsigned char)lit[i])
            return 0;
    }
    return lit[n] == '\0';
}

static int uni_eq_lit(PyObject *s, const char *lit)
{
    return PyUnicode_CompareWithASCIIString(s, lit) == 0;
}

/* treebuilder._adjust_foreign_attrs (+ the per-ns case tables):
 * mutates the scanner's fresh [ns, name, value] lists in place */
static int adjust_foreign_attrs(PyObject *attrs, int is_svg, int is_math)
{
    Py_ssize_t k;
    for (k = 0; k < PyList_GET_SIZE(attrs); k++) {
        PyObject *a = PyList_GET_ITEM(attrs, k);
        PyObject *an = PyList_GET_ITEM(a, 1);
        PyObject *adj;
        if (is_svg) {
            adj = PyDict_GetItemWithError(g_svg_attr_adj, an);
            if (adj == NULL && PyErr_Occurred())
                return -1;
            if (adj != NULL) {
                Py_INCREF(adj);
                PyList_SetItem(a, 1, adj);
                an = adj;
            }
        } else if (is_math && uni_eq_lit(an, "definitionurl")) {
            Py_INCREF(NM_definitionURL);
            PyList_SetItem(a, 1, NM_definitionURL);
            an = NM_definitionURL;
        }
        adj = PyDict_GetItemWithError(g_foreign_attr_adj, an);
        if (adj == NULL && PyErr_Occurred())
            return -1;
        if (adj != NULL) {
            /* ("xlink"|"xml"|"xmlns", local) tuple */
            PyObject *ns2 = PyTuple_GET_ITEM(adj, 0);
            PyObject *n2 = PyTuple_GET_ITEM(adj, 1);
            Py_INCREF(ns2);
            PyList_SetItem(a, 0, ns2);
            Py_INCREF(n2);
            PyList_SetItem(a, 1, n2);
        }
    }
    return 0;
}

/* push-time classification of a foreign element: ns bit +
 * integration-point / special / scope-boundary bits */
static uint32_t foreign_entry_flags(PyObject *name, PyObject *attrs,
                                    int is_svg)
{
    uint32_t f = is_svg ? F_NS_SVG : F_NS_MATHML;
    if (is_svg) {
        if (uni_eq_lit(name, "foreignObject") || uni_eq_lit(name, "desc")
            || uni_eq_lit(name, "title"))
            f |= F_HTML_IP | F_SCOPEB | F_SP;
    } else {
        if (uni_eq_lit(name, "mi") || uni_eq_lit(name, "mo")
            || uni_eq_lit(name, "mn") || uni_eq_lit(name, "ms")
            || uni_eq_lit(name, "mtext")) {
            f |= F_MTEXT_IP | F_SCOPEB | F_SP;
        } else if (uni_eq_lit(name, "annotation-xml")) {
            Py_ssize_t k;
            f |= F_ANNOT_XML | F_SCOPEB | F_SP;
            for (k = 0; k < PyList_GET_SIZE(attrs); k++) {
                PyObject *a = PyList_GET_ITEM(attrs, k);
                if (uni_eq_lit(PyList_GET_ITEM(a, 1), "encoding")) {
                    PyObject *v = PyList_GET_ITEM(a, 2);
                    if (ascii_ieq_lit(v, "text/html")
                        || ascii_ieq_lit(v, "application/xhtml+xml"))
                        f |= F_HTML_IP;
                }
            }
        }
    }
    return f;
}

/* treebuilder._foreign_start */
static int foreign_start(P *p, const NameEnt *ne, PyObject *name,
                         PyObject *attrs, int self_closing)
{
    uint32_t tf = p->open[p->n_open - 1].flags;
    int brk = (ne != NULL && (ne->flags & F_FBRK));
    if (!brk && ne != NULL && ne->tok == T_FMTG && uni_eq_lit(name, "font")) {
        Py_ssize_t k;
        for (k = 0; k < PyList_GET_SIZE(attrs); k++) {
            PyObject *an = PyList_GET_ITEM(PyList_GET_ITEM(attrs, k), 1);
            if (uni_eq_lit(an, "color") || uni_eq_lit(an, "face")
                || uni_eq_lit(an, "size")) {
                brk = 1;
                break;
            }
        }
    }
    if (brk) {
        /* pop to an html node or an integration point, then html rules */
        while (p->n_open) {
            uint32_t f2 = p->open[p->n_open - 1].flags;
            if (!(f2 & F_NS_FOREIGN))
                break;
            if (f2 & (F_MTEXT_IP | F_HTML_IP))
                break;
            p->n_open--;
        }
        return handle_start_html(p, ne, name, attrs, self_closing);
    }
    {
        int is_svg = (tf & F_NS_SVG) != 0;
        int eid;
        uint32_t nf;
        if (is_svg) {
            PyObject *adj = PyDict_GetItemWithError(g_svg_tag_adj, name);
            if (adj == NULL && PyErr_Occurred())
                return -1;
            if (adj != NULL)
                name = adj;  /* borrowed; dict keeps it alive */
        }
        CHECK(adjust_foreign_attrs(attrs, is_svg, !is_svg));
        nf = foreign_entry_flags(name, attrs, is_svg);
        eid = insert_element_ns(p, name, attrs, T_FOREIGN, nf, 1,
                                is_svg ? g_svg_ns : g_mathml_ns);
        CHECK(eid);
        if (self_closing)
            p->n_open--;
        return 0;
    }
}

/* treebuilder._foreign_end */
static int foreign_end(P *p, const NameEnt *ne, PyObject *name)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        if (!(p->open[i].flags & F_NS_FOREIGN))
            return handle_end_html(p, ne, name);
        {
            int r = ascii_lower_equal(NODE(p, p->open[i].id)->name, name);
            if (r < 0)
                ABORT(p);  /* non-ascii name: full-lower semantics */
            if (r) {
                p->n_open = i;
                return 0;
            }
        }
    }
    return 0;
}

/* treebuilder.process_start_tag / process_end_tag: the foreign
 * dispatch wrappers the scanner drives (reprocessing inside mode
 * handlers goes straight to the *_html rules, like Python's
 * _start/_end) */
static int handle_start(P *p, const NameEnt *ne, PyObject *name,
                        PyObject *attrs, int self_closing)
{
    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->n_open) {
        uint32_t tf = p->open[p->n_open - 1].flags;
        if (tf & F_NS_FOREIGN) {
            int to_html = 0;
            if (tf & F_MTEXT_IP) {
                if (!uni_eq_lit(name, "mglyph")
                    && !uni_eq_lit(name, "malignmark"))
                    to_html = 1;
            }
            if (!to_html && (tf & F_ANNOT_XML) && ne != NULL
                && ne->tok == T_SVG)
                to_html = 1;
            if (!to_html && (tf & F_HTML_IP))
                to_html = 1;
            if (!to_html)
                return foreign_start(p, ne, name, attrs, self_closing);
        }
    }
    return handle_start_html(p, ne, name, attrs, self_closing);
}

static int handle_end(P *p, const NameEnt *ne, PyObject *name)
{
    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->n_open && (p->open[p->n_open - 1].flags & F_NS_FOREIGN))
        return foreign_end(p, ne, name);
    return handle_end_html(p, ne, name);
}

/* ---------------- characters ---------------- */
static int append_table_text(P *p, PyObject *s)
{
    /* pending_table_text chunks are NUL-stripped at append
     * (treebuilder.py:864); an empty chunk still appends */
    if (PyUnicode_FindChar(s, 0, 0, PyUnicode_GET_LENGTH(s), 1) >= 0) {
        PyObject *t = PyUnicode_Replace(s, g_nul_str, g_empty_str, -1);
        int r;
        if (t == NULL)
            return -1;
        r = PyList_Append(p->tt, t);
        Py_DECREF(t);
        return r;
    }
    return PyList_Append(p->tt, s);
}

static Py_ssize_t lstrip_ws_index(PyObject *s)
{
    Py_ssize_t i, n = PyUnicode_GET_LENGTH(s);
    int kind = PyUnicode_KIND(s);
    const void *data = PyUnicode_DATA(s);
    for (i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (c != '\t' && c != '\n' && c != '\f' && c != ' ')
            break;
    }
    return i;
}

static int handle_chars(P *p, PyObject *s)
{
    Py_ssize_t n;
    if (p->done)
        return 0;
    n = PyUnicode_GET_LENGTH(s);
    if (n == 0)
        return 0;
    if (p->ignore_lf) {
        p->ignore_lf = 0;
        if (PyUnicode_READ_CHAR(s, 0) == '\n') {
            PyObject *rest = PyUnicode_Substring(s, 1, n);
            int r;
            if (rest == NULL)
                return -1;
            if (PyUnicode_GET_LENGTH(rest) == 0) {
                Py_DECREF(rest);
                return 0;
            }
            r = handle_chars(p, rest);
            Py_DECREF(rest);
            return r;
        }
    }
    /* foreign-content character tokens (treebuilder._chars, the
     * ns != HTML branch): direct insert under the foreign node unless
     * the current node is an integration point */
    if (p->n_open) {
        uint32_t tf = p->open[p->n_open - 1].flags;
        if ((tf & F_NS_FOREIGN) && !(tf & (F_MTEXT_IP | F_HTML_IP))) {
            PyObject *use = s, *t = NULL;
            int r;
            if (PyUnicode_FindChar(s, 0, 0, PyUnicode_GET_LENGTH(s), 1)
                >= 0) {
                t = PyUnicode_Replace(s, g_nul_str, g_fffd_str, -1);
                if (t == NULL)
                    return -1;
                use = t;
            }
            if (p->frameset_ok
                && lstrip_ws_index(use) < PyUnicode_GET_LENGTH(use))
                p->frameset_ok = 0;
            r = pend_text(p, cur_top(p), use);
            Py_XDECREF(t);
            return r;
        }
    }
    switch (p->mode) {
    case M_IN_BODY:
    case M_IN_CAPTION:
    case M_IN_CELL:
    case M_IN_TEMPLATE: {
        /* caption/cell/template character tokens use the in-body
         * rules; NULs strip FIRST — all-NUL text returns before any
         * formatting reconstruction (treebuilder._chars) */
        if (PyUnicode_FindChar(s, 0, 0, n, 1) >= 0) {
            PyObject *t = PyUnicode_Replace(s, g_nul_str, g_empty_str, -1);
            int r;
            if (t == NULL)
                return -1;
            if (PyUnicode_GET_LENGTH(t) == 0) {
                Py_DECREF(t);
                return 0;
            }
            r = reconstruct_afe(p);
            if (r == 0) {
                if (p->frameset_ok
                    && lstrip_ws_index(t) < PyUnicode_GET_LENGTH(t))
                    p->frameset_ok = 0;
                r = pend_text(p, cur_top(p), t);
            }
            Py_DECREF(t);
            return r;
        }
        CHECK(reconstruct_afe(p));
        if (p->frameset_ok && lstrip_ws_index(s) < PyUnicode_GET_LENGTH(s))
            p->frameset_ok = 0;
        return pend_text(p, cur_top(p), s);
    }
    case M_TEXT:
        return pend_text(p, cur_top(p), s);
    case M_IN_SELECT:
    case M_IN_SELECT_IN_TABLE:
        /* no reconstruction in select; NULs strip but an all-NUL
         * token still inserts the empty string (python
         * _insert_text("") creates/merges a text node) */
        if (PyUnicode_FindChar(s, 0, 0, n, 1) >= 0) {
            PyObject *t = PyUnicode_Replace(s, g_nul_str, g_empty_str, -1);
            int r;
            if (t == NULL)
                return -1;
            r = pend_text(p, cur_top(p), t);
            Py_DECREF(t);
            return r;
        }
        return pend_text(p, cur_top(p), s);
    case M_IN_TABLE:
    case M_IN_TABLE_BODY:
    case M_IN_ROW:
        if (TABLEISH(p->open[p->n_open - 1].tok)
            || p->open[p->n_open - 1].tok == T_TEMPLATE) {
            /* pending table character tokens (in-table char rule via
             * the table-body/row anything-else delegation; the
             * current-node tuple includes template, treebuilder:852) */
            p->tt = PyList_New(0);
            if (p->tt == NULL)
                return -1;
            p->original_mode = p->mode;
            p->mode = M_IN_TABLE_TEXT;
            return append_table_text(p, s);
        }
        {
            /* anything-else: foster-parented in-body processing */
            int saved = p->mode, r;
            p->foster = 1;
            p->mode = M_IN_BODY;
            r = handle_chars(p, s);
            p->mode = saved;
            p->foster = 0;
            return r;
        }
    case M_IN_TABLE_TEXT:
        return append_table_text(p, s);
    case M_IN_COLUMN_GROUP: {
        Py_ssize_t i = lstrip_ws_index(s);
        if (i > 0) {
            PyObject *ws = PyUnicode_Substring(s, 0, i);
            int r;
            if (ws == NULL)
                return -1;
            r = pend_text(p, cur_top(p), ws);
            Py_DECREF(ws);
            CHECK(r);
        }
        if (i == n)
            return 0;
        if (p->open[p->n_open - 1].tok == T_COLGROUP) {
            PyObject *rest = PyUnicode_Substring(s, i, n);
            int r;
            if (rest == NULL)
                return -1;
            p->n_open--;
            p->mode = M_IN_TABLE;
            r = handle_chars(p, rest);
            Py_DECREF(rest);
            return r;
        }
        return 0;
    }
    case M_INITIAL:
    case M_BEFORE_HTML:
    case M_BEFORE_HEAD: {
        Py_ssize_t i = lstrip_ws_index(s);
        PyObject *rest;
        int r;
        if (i == n)
            return 0;
        rest = PyUnicode_Substring(s, i, n);
        if (rest == NULL)
            return -1;
        r = synth_to_body(p);
        if (r == 0)
            r = handle_chars(p, rest);
        Py_DECREF(rest);
        return r;
    }
    case M_IN_HEAD:
    case M_AFTER_HEAD: {
        Py_ssize_t i = lstrip_ws_index(s);
        if (i > 0) {
            PyObject *ws = PyUnicode_Substring(s, 0, i);
            int r;
            if (ws == NULL)
                return -1;
            r = pend_text(p, cur_top(p), ws);
            Py_DECREF(ws);
            CHECK(r);
        }
        if (i == n)
            return 0;
        {
            PyObject *rest = PyUnicode_Substring(s, i, n);
            int r;
            if (rest == NULL)
                return -1;
            if (p->mode == M_IN_HEAD) {
                p->n_open--;
                p->mode = M_AFTER_HEAD;
                r = handle_chars(p, rest);
            } else {
                PyObject *battrs = PyList_New(0);
                int bid;
                if (battrs == NULL) {
                    Py_DECREF(rest);
                    return -1;
                }
                bid = insert_element(p, NM_body, battrs, T_BODY, F_SP, 1);
                Py_DECREF(battrs);
                if (bid < 0) {
                    Py_DECREF(rest);
                    return -1;
                }
                p->mode = M_IN_BODY;
                r = handle_chars(p, rest);
            }
            Py_DECREF(rest);
            return r;
        }
    }
    case M_IN_FRAMESET:
    case M_AFTER_FRAMESET: {
        /* leading whitespace inserted directly; non-ws ignored */
        Py_ssize_t i = lstrip_ws_index(s);
        if (i > 0) {
            PyObject *ws = PyUnicode_Substring(s, 0, i);
            int r;
            if (ws == NULL)
                return -1;
            r = pend_text(p, cur_top(p), ws);
            Py_DECREF(ws);
            CHECK(r);
        }
        return 0;
    }
    case M_AFTER_AFTER_FRAMESET: {
        /* leading whitespace per in-body rules; non-ws ignored */
        Py_ssize_t i = lstrip_ws_index(s);
        if (i > 0) {
            PyObject *ws = PyUnicode_Substring(s, 0, i);
            int r;
            if (ws == NULL)
                return -1;
            CHECK(reconstruct_afe(p));
            r = pend_text(p, cur_top(p), ws);
            Py_DECREF(ws);
            CHECK(r);
        }
        return 0;
    }
    case M_AFTER_BODY:
    case M_AFTER_AFTER_BODY: {
        Py_ssize_t i = lstrip_ws_index(s);
        if (i > 0) {
            /* ws processed per in-body rules */
            PyObject *ws = PyUnicode_Substring(s, 0, i);
            int r;
            if (ws == NULL)
                return -1;
            CHECK(reconstruct_afe(p));
            r = pend_text(p, cur_top(p), ws);
            Py_DECREF(ws);
            CHECK(r);
        }
        if (i == n)
            return 0;
        {
            PyObject *rest = PyUnicode_Substring(s, i, n);
            int r;
            if (rest == NULL)
                return -1;
            p->mode = M_IN_BODY;
            r = handle_chars(p, rest);
            Py_DECREF(rest);
            return r;
        }
    }
    default:
        ABORT(p);
    }
}

/* ---------------- comments / doctype / eof ---------------- */
static int handle_comment(P *p, PyObject *s)
{
    CNode *c;
    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->mode == M_IN_TABLE_TEXT)
        CHECK(flush_table_text(p));
    CHECK(flush_text(p));
    c = new_node(p, K_COMMENT);
    if (c == NULL)
        return -1;
    Py_INCREF(s);
    c->data = s;
    if (p->mode == M_INITIAL || p->mode == M_BEFORE_HTML
        || p->mode == M_AFTER_AFTER_BODY
        || p->mode == M_AFTER_AFTER_FRAMESET)
        link_append(p, 0, c->id);
    else if (p->mode == M_AFTER_BODY)
        link_append(p, p->open[0].id, c->id);
    else if (p->open[p->n_open - 1].tok == T_TEMPLATE)
        link_append(p, NODE(p, cur_top(p))->tc, c->id);
    else
        link_append(p, cur_top(p), c->id);
    return 0;
}

static int handle_doctype(P *p, PyObject *name, PyObject *rest, int eof)
{
    CNode *d;
    PyObject *d2;
    p->ignore_lf = 0;
    if (p->done)
        return 0;
    if (p->mode != M_INITIAL)
        return parse_error_str(p, "unexpected-doctype");  /* ignored */
    d = new_node(p, K_DOCTYPE);
    if (d == NULL)
        return -1;
    Py_INCREF(name);
    d->data = name;
    d2 = PyTuple_Pack(2, Py_None, Py_None);
    if (d2 == NULL)
        return -1;
    d->data2 = d2;
    link_append(p, 0, d->id);
    /* record the quirks inputs (only the INITIAL doctype reaches here) */
    Py_INCREF(name);
    p->quirks_name = name;
    Py_XINCREF(rest);
    p->quirks_rest = rest;
    p->quirks_eof = eof;
    p->mode = M_BEFORE_HTML;
    return 0;
}

static int handle_eof(P *p)
{
    if (p->done)
        return 0;
    if (p->mode == M_IN_TABLE_TEXT)
        CHECK(flush_table_text(p));
    if (p->mode == M_TEXT) {
        CHECK(flush_text(p));
        p->n_open--;
        p->mode = p->original_mode;
        return handle_eof(p);
    }
    CHECK(flush_text(p));
    if (p->mode == M_INITIAL || p->mode == M_BEFORE_HTML
        || p->mode == M_BEFORE_HEAD || p->mode == M_IN_HEAD
        || p->mode == M_AFTER_HEAD) {
        CHECK(synth_to_body(p));
        p->done = 1;
        return 0;
    }
    if (p->n_tmpl && template_on_stack(p)) {
        /* treebuilder._eof template arm: pop and reprocess */
        pop_until_tok(p, T_TEMPLATE);
        afe_clear_to_marker(p);
        p->n_tmpl--;
        reset_mode(p);
        return handle_eof(p);
    }
    p->done = 1;
    return 0;
}

/* default-scope check by element NAME (block-closer / pre / listing /
 * button end tags): interned-name pointer equality against the stack */
static int in_scope_name(P *p, PyObject *name)
{
    int i;
    for (i = p->n_open - 1; i >= 0; i--) {
        OpenEnt *e = &p->open[i];
        if (!(e->flags & F_NS_FOREIGN) && NODE(p, e->id)->name == name)
            return 1;
        if (e->flags & F_SCOPEB)
            return 0;
    }
    return 0;
}

/* ====================================================================
 * Scanner (the _scan.c macro-tokenizer core, direct-dispatch form).
 * Byte space: every span boundary is an ASCII delimiter, so slicing
 * the UTF-8 byte string at record offsets and decoding the slice is
 * exact (see ctokenizer.py module docstring).
 * ==================================================================== */

static int sc_is_ws(uint8_t c) { return c == '\t' || c == '\n' || c == '\f' || c == ' '; }
static uint8_t sc_lc(uint8_t c) { return (c >= 'A' && c <= 'Z') ? (uint8_t)(c + 32) : c; }
static int sc_is_alpha(uint8_t c) { return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'); }
static int sc_attr_name_ch(uint8_t c) { return !(sc_is_ws(c) || c == '/' || c == '=' || c == '>'); }
static int sc_unquoted_ch(uint8_t c) { return !(sc_is_ws(c) || c == '>'); }
static int sc_delim(uint8_t c) { return sc_is_ws(c) || c == '/' || c == '>'; }

#define MAX_NAME_SCRATCH 256

/* lowercase span into scratch; returns len or -1 (too long => abort) */
static Py_ssize_t lower_into(const uint8_t *s, Py_ssize_t a, Py_ssize_t b,
                             uint8_t *scratch)
{
    Py_ssize_t i, len = b - a;
    if (len > MAX_NAME_SCRATCH)
        return -1;
    for (i = 0; i < len; i++)
        scratch[i] = sc_lc(s[a + i]);
    return len;
}

/* decode a byte span to str, optionally charref-decoding */
/* the ~120 most common named references (exact `name;` form
 * only — legacy no-semicolon and anything else delegates to the
 * python longest-prefix decoder); values generated from the
 * public stdlib html.entities.html5 table */
typedef struct { const char *name; uint8_t nlen;
                 const char *out; uint8_t olen; } CEntEnt;
static const CEntEnt CENTS[] = {
    {"Agrave", 6, "\xc3\x80", 2},
    {"Auml", 4, "\xc3\x84", 2},
    {"Dagger", 6, "\xe2\x80\xa1", 3},
    {"Delta", 5, "\xce\x94", 2},
    {"Eacute", 6, "\xc3\x89", 2},
    {"Omega", 5, "\xce\xa9", 2},
    {"Ouml", 4, "\xc3\x96", 2},
    {"Pi", 2, "\xce\xa0", 2},
    {"Prime", 5, "\xe2\x80\xb3", 3},
    {"Sigma", 5, "\xce\xa3", 2},
    {"Uuml", 4, "\xc3\x9c", 2},
    {"aacute", 6, "\xc3\xa1", 2},
    {"acirc", 5, "\xc3\xa2", 2},
    {"aelig", 5, "\xc3\xa6", 2},
    {"agrave", 6, "\xc3\xa0", 2},
    {"alpha", 5, "\xce\xb1", 2},
    {"amp", 3, "\x26", 1},
    {"apos", 4, "\x27", 1},
    {"aring", 5, "\xc3\xa5", 2},
    {"asymp", 5, "\xe2\x89\x88", 3},
    {"auml", 4, "\xc3\xa4", 2},
    {"beta", 4, "\xce\xb2", 2},
    {"bull", 4, "\xe2\x80\xa2", 3},
    {"ccedil", 6, "\xc3\xa7", 2},
    {"cent", 4, "\xc2\xa2", 2},
    {"chi", 3, "\xcf\x87", 2},
    {"copy", 4, "\xc2\xa9", 2},
    {"curren", 6, "\xc2\xa4", 2},
    {"dagger", 6, "\xe2\x80\xa0", 3},
    {"darr", 4, "\xe2\x86\x93", 3},
    {"deg", 3, "\xc2\xb0", 2},
    {"delta", 5, "\xce\xb4", 2},
    {"divide", 6, "\xc3\xb7", 2},
    {"eacute", 6, "\xc3\xa9", 2},
    {"ecirc", 5, "\xc3\xaa", 2},
    {"egrave", 6, "\xc3\xa8", 2},
    {"epsilon", 7, "\xce\xb5", 2},
    {"equiv", 5, "\xe2\x89\xa1", 3},
    {"eta", 3, "\xce\xb7", 2},
    {"eth", 3, "\xc3\xb0", 2},
    {"euro", 4, "\xe2\x82\xac", 3},
    {"frac12", 6, "\xc2\xbd", 2},
    {"frac14", 6, "\xc2\xbc", 2},
    {"frac34", 6, "\xc2\xbe", 2},
    {"gamma", 5, "\xce\xb3", 2},
    {"ge", 2, "\xe2\x89\xa5", 3},
    {"gt", 2, "\x3e", 1},
    {"harr", 4, "\xe2\x86\x94", 3},
    {"hellip", 6, "\xe2\x80\xa6", 3},
    {"iacute", 6, "\xc3\xad", 2},
    {"iexcl", 5, "\xc2\xa1", 2},
    {"infin", 5, "\xe2\x88\x9e", 3},
    {"iota", 4, "\xce\xb9", 2},
    {"iquest", 6, "\xc2\xbf", 2},
    {"iuml", 4, "\xc3\xaf", 2},
    {"kappa", 5, "\xce\xba", 2},
    {"lambda", 6, "\xce\xbb", 2},
    {"laquo", 5, "\xc2\xab", 2},
    {"larr", 4, "\xe2\x86\x90", 3},
    {"ldquo", 5, "\xe2\x80\x9c", 3},
    {"le", 2, "\xe2\x89\xa4", 3},
    {"lowast", 6, "\xe2\x88\x97", 3},
    {"lsquo", 5, "\xe2\x80\x98", 3},
    {"lt", 2, "\x3c", 1},
    {"mdash", 5, "\xe2\x80\x94", 3},
    {"micro", 5, "\xc2\xb5", 2},
    {"middot", 6, "\xc2\xb7", 2},
    {"minus", 5, "\xe2\x88\x92", 3},
    {"mu", 2, "\xce\xbc", 2},
    {"nbsp", 4, "\xc2\xa0", 2},
    {"ndash", 5, "\xe2\x80\x93", 3},
    {"ne", 2, "\xe2\x89\xa0", 3},
    {"ntilde", 6, "\xc3\xb1", 2},
    {"nu", 2, "\xce\xbd", 2},
    {"oacute", 6, "\xc3\xb3", 2},
    {"omega", 5, "\xcf\x89", 2},
    {"omicron", 7, "\xce\xbf", 2},
    {"oplus", 5, "\xe2\x8a\x95", 3},
    {"ordf", 4, "\xc2\xaa", 2},
    {"ordm", 4, "\xc2\xba", 2},
    {"oslash", 6, "\xc3\xb8", 2},
    {"otimes", 6, "\xe2\x8a\x97", 3},
    {"ouml", 4, "\xc3\xb6", 2},
    {"para", 4, "\xc2\xb6", 2},
    {"permil", 6, "\xe2\x80\xb0", 3},
    {"perp", 4, "\xe2\x8a\xa5", 3},
    {"phi", 3, "\xcf\x86", 2},
    {"pi", 2, "\xcf\x80", 2},
    {"plusmn", 6, "\xc2\xb1", 2},
    {"pound", 5, "\xc2\xa3", 2},
    {"prime", 5, "\xe2\x80\xb2", 3},
    {"psi", 3, "\xcf\x88", 2},
    {"quot", 4, "\x22", 1},
    {"radic", 5, "\xe2\x88\x9a", 3},
    {"raquo", 5, "\xc2\xbb", 2},
    {"rarr", 4, "\xe2\x86\x92", 3},
    {"rdquo", 5, "\xe2\x80\x9d", 3},
    {"reg", 3, "\xc2\xae", 2},
    {"rho", 3, "\xcf\x81", 2},
    {"rsquo", 5, "\xe2\x80\x99", 3},
    {"sdot", 4, "\xe2\x8b\x85", 3},
    {"sect", 4, "\xc2\xa7", 2},
    {"shy", 3, "\xc2\xad", 2},
    {"sigma", 5, "\xcf\x83", 2},
    {"sup1", 4, "\xc2\xb9", 2},
    {"sup2", 4, "\xc2\xb2", 2},
    {"sup3", 4, "\xc2\xb3", 2},
    {"szlig", 5, "\xc3\x9f", 2},
    {"tau", 3, "\xcf\x84", 2},
    {"theta", 5, "\xce\xb8", 2},
    {"thorn", 5, "\xc3\xbe", 2},
    {"times", 5, "\xc3\x97", 2},
    {"trade", 5, "\xe2\x84\xa2", 3},
    {"uacute", 6, "\xc3\xba", 2},
    {"uarr", 4, "\xe2\x86\x91", 3},
    {"ucirc", 5, "\xc3\xbb", 2},
    {"upsilon", 7, "\xcf\x85", 2},
    {"uuml", 4, "\xc3\xbc", 2},
    {"xi", 2, "\xce\xbe", 2},
    {"yen", 3, "\xc2\xa5", 2},
    {"zeta", 4, "\xce\xb6", 2},
};
#define N_CENTS ((int)(sizeof(CENTS) / sizeof(CENTS[0])))

static const CEntEnt *cent_lookup(const uint8_t *s, Py_ssize_t len)
{
    int lo = 0, hi = N_CENTS - 1;
    if (len > 7)
        return NULL;
    while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const CEntEnt *e = &CENTS[mid];
        Py_ssize_t cl = len < e->nlen ? len : e->nlen;
        int c = memcmp(s, e->name, cl);
        if (c == 0)
            c = (int)(len - e->nlen);
        if (c == 0)
            return e;
        if (c < 0)
            hi = mid - 1;
        else
            lo = mid + 1;
    }
    return NULL;
}

/* WHATWG numeric-reference replacement (entities._NUMERIC_REPLACE);
 * writes the UTF-8 expansion, returns bytes written */
static int cent_numeric_utf8(unsigned long num, uint8_t *o)
{
    static const unsigned short c1map[32] = {
        0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
        0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
        0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
        0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178,
    };
    if (num == 0x00 || (num >= 0xD800 && num <= 0xDFFF) || num > 0x10FFFF)
        num = 0xFFFD;
    else if (num == 0x0D)
        num = 0x0D;  /* table maps it to itself */
    else if (num >= 0x80 && num <= 0x9F)
        num = c1map[num - 0x80];
    if (num < 0x80) {
        o[0] = (uint8_t)num;
        return 1;
    }
    if (num < 0x800) {
        o[0] = 0xC0 | (num >> 6);
        o[1] = 0x80 | (num & 0x3F);
        return 2;
    }
    if (num < 0x10000) {
        o[0] = 0xE0 | (num >> 12);
        o[1] = 0x80 | ((num >> 6) & 0x3F);
        o[2] = 0x80 | (num & 0x3F);
        return 3;
    }
    o[0] = 0xF0 | (num >> 18);
    o[1] = 0x80 | ((num >> 12) & 0x3F);
    o[2] = 0x80 | ((num >> 6) & 0x3F);
    o[3] = 0x80 | (num & 0x3F);
    return 4;
}

static int cent_alnum(uint8_t c)
{
    return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z')
        || (c >= 'A' && c <= 'Z');
}

/* decode charrefs over bytes [a, b) entirely in C, or set *delegate
 * when an ambiguous reference needs entities.decode_charrefs (the
 * longest-prefix legacy machinery).  Output is never longer than the
 * input span (every reference is >= its UTF-8 expansion). */
static PyObject *c_decode_span(P *p, Py_ssize_t a, Py_ssize_t b,
                               int *delegate)
{
    const uint8_t *s = p->b;
    Py_ssize_t i = a, o = 0;
    uint8_t *out = PyMem_Malloc((b - a) ? (b - a) : 1);
    PyObject *res;
    if (out == NULL) {
        PyErr_NoMemory();
        return NULL;
    }
    while (i < b) {
        const uint8_t *ap = memchr(s + i, '&', b - i);
        Py_ssize_t j, k;
        if (ap == NULL) {
            memcpy(out + o, s + i, b - i);
            o += b - i;
            break;
        }
        j = ap - s;
        memcpy(out + o, s + i, j - i);
        o += j - i;
        i = j;
        j = i + 1;
        if (j < b && s[j] == '#') {
            int hex = 0;
            unsigned long num = 0;
            Py_ssize_t d0;
            k = j + 1;
            if (k < b && (s[k] == 'x' || s[k] == 'X')) {
                hex = 1;
                k++;
            }
            d0 = k;
            while (k < b) {
                uint8_t c = s[k];
                unsigned v;
                if (c >= '0' && c <= '9')
                    v = c - '0';
                else if (hex && c >= 'a' && c <= 'f')
                    v = c - 'a' + 10;
                else if (hex && c >= 'A' && c <= 'F')
                    v = c - 'A' + 10;
                else
                    break;
                if (num < 0x110000)
                    num = num * (hex ? 16 : 10) + v;
                k++;
            }
            if (k == d0) {
                /* "&#"/"&#x" with no digits: '&' literal, rescan after */
                out[o++] = '&';
                i++;
                continue;
            }
            o += cent_numeric_utf8(num, out + o);
            if (k < b && s[k] == ';')
                k++;
            i = k;
            continue;
        }
        k = j;
        while (k < b && cent_alnum(s[k]))
            k++;
        if (k == j) {
            out[o++] = '&';
            i++;
            continue;
        }
        if (k < b && s[k] == ';') {
            const CEntEnt *e = cent_lookup(s + j, k - j);
            if (e != NULL) {
                memcpy(out + o, e->out, e->olen);
                o += e->olen;
                i = k + 1;
                continue;
            }
        }
        /* unknown or legacy (no-semicolon) reference: python decoder */
        PyMem_Free(out);
        *delegate = 1;
        return NULL;
    }
    res = PyUnicode_DecodeUTF8((const char *)out, o, "surrogatepass");
    PyMem_Free(out);
    return res;
}

static PyObject *span_str(P *p, Py_ssize_t a, Py_ssize_t b,
                          int amp, int in_attr)
{
    PyObject *s;
    if (amp) {
        int delegate = 0;
        s = c_decode_span(p, a, b, &delegate);
        if (s != NULL || !delegate)
            return s;
        /* ambiguous reference: the python longest-prefix decoder */
    }
    s = PyUnicode_DecodeUTF8((const char *)p->b + a, b - a,
                             "surrogatepass");
    if (s == NULL || !amp)
        return s;
    {
        PyObject *dec = PyObject_CallFunctionObjArgs(
            g_decode, s, in_attr ? Py_True : Py_False, NULL);
        Py_DECREF(s);
        return dec;
    }
}

typedef struct {
    Py_ssize_t ans, ane, vs, ve;
    int vamp;
} AttrSpan;

/* Scan one tag from name_start; fills name span + attr spans.
 * Returns resume pos, -1 on EOF-in-tag (drop tag), -3 on abort
 * (attr overflow). */
#define MAX_ATTRS 64
static Py_ssize_t scan_tag_spans(P *p, Py_ssize_t name_start, int end_tag,
                                 Py_ssize_t *ne_out, AttrSpan *attrs,
                                 int *nattrs_out, int *self_closing_out)
{
    const uint8_t *s = p->b;
    Py_ssize_t n = p->n, i = name_start;
    int nattrs = 0, self_closing = 0;

    while (i < n && !(sc_is_ws(s[i]) || s[i] == '/' || s[i] == '>'))
        i++;
    *ne_out = i;

    for (;;) {
        uint8_t c;
        Py_ssize_t ans, ane, vs = -1, ve = -1;
        int vflag = 0;
        while (i < n && sc_is_ws(s[i]))
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
        while (i < n && sc_attr_name_ch(s[i]))
            i++;
        ane = i;
        while (i < n && sc_is_ws(s[i]))
            i++;
        if (i < n && s[i] == '=') {
            uint8_t q;
            i++;
            while (i < n && sc_is_ws(s[i]))
                i++;
            if (i >= n)
                return -1;
            q = s[i];
            if (q == '"' || q == '\'') {
                const uint8_t *j = memchr(s + i + 1, q, n - i - 1);
                if (!j)
                    return -1;
                vs = i + 1;
                ve = j - s;
                i = ve + 1;
            } else {
                vs = i;
                while (i < n && sc_unquoted_ch(s[i]))
                    i++;
                ve = i;
                if (i >= n)
                    return -1;
            }
            if (ve > vs && memchr(s + vs, '&', ve - vs))
                vflag = 1;
        } else if (i >= n) {
            return -1;
        }
        if (!end_tag) {
            if (nattrs >= MAX_ATTRS)
                return -3;
            attrs[nattrs].ans = ans;
            attrs[nattrs].ane = ane;
            attrs[nattrs].vs = vs;
            attrs[nattrs].ve = ve;
            attrs[nattrs].vamp = vflag;
            nattrs++;
        }
    }
    *nattrs_out = nattrs;
    *self_closing_out = self_closing;
    return i;
}

/* build the Python attrs list ([None, name, value] inner lists, first
 * occurrence of a duplicate name wins) */
static PyObject *build_attrs(P *p, AttrSpan *spans, int n)
{
    PyObject *list = PyList_New(0);
    uint8_t scratch[MAX_NAME_SCRATCH];
    int i;
    if (list == NULL)
        return NULL;
    for (i = 0; i < n; i++) {
        Py_ssize_t len = lower_into(p->b, spans[i].ans, spans[i].ane, scratch);
        PyObject *aname, *value, *inner;
        Py_ssize_t j, have = 0;
        if (len < 0)
            goto fail;
        aname = intern_name(scratch, len);
        if (aname == NULL)
            goto fail;
        for (j = 0; j < PyList_GET_SIZE(list); j++)
            if (PyList_GET_ITEM(PyList_GET_ITEM(list, j), 1) == aname) {
                have = 1;
                break;
            }
        if (have)
            continue;
        if (spans[i].vs < 0) {
            Py_INCREF(g_empty_str);
            value = g_empty_str;
        } else {
            value = span_str(p, spans[i].vs, spans[i].ve, spans[i].vamp, 1);
            if (value == NULL)
                goto fail;
        }
        inner = PyList_New(3);
        if (inner == NULL) {
            Py_DECREF(value);
            goto fail;
        }
        Py_INCREF(Py_None);
        PyList_SET_ITEM(inner, 0, Py_None);
        Py_INCREF(aname);
        PyList_SET_ITEM(inner, 1, aname);
        PyList_SET_ITEM(inner, 2, value);
        if (PyList_Append(list, inner) < 0) {
            Py_DECREF(inner);
            goto fail;
        }
        Py_DECREF(inner);
    }
    return list;
fail:
    Py_DECREF(list);
    return NULL;
}

/* text record => handle_chars */
static int emit_text(P *p, Py_ssize_t a, Py_ssize_t b, int amp, int rcdata)
{
    PyObject *s;
    int r;
    if (b <= a)
        return 0;
    s = span_str(p, a, b, amp, 0);
    (void)rcdata;
    if (s == NULL)
        return -1;
    r = handle_chars(p, s);
    Py_DECREF(s);
    return r;
}

/* ---------------- raw-mode consumers (byte ports of ctokenizer) ------ */

/* find `</tag` + delimiter (case-insensitive), from `from`; -1 if none */
static Py_ssize_t find_raw_close(P *p, Py_ssize_t from)
{
    const uint8_t *s = p->b;
    Py_ssize_t n = p->n, i = from;
    const char *tag = p->raw_ne->name;
    int tlen = p->raw_ne->len;
    while (i < n) {
        const uint8_t *q = memchr(s + i, '<', n - i);
        Py_ssize_t qi;
        int k;
        if (q == NULL)
            return -1;
        qi = q - s;
        if (qi + 2 + tlen >= n)
            return -1;  /* lookahead cannot succeed */
        if (s[qi + 1] != '/') {
            i = qi + 1;
            continue;
        }
        for (k = 0; k < tlen; k++)
            if (sc_lc(s[qi + 2 + k]) != (uint8_t)tag[k])
                break;
        if (k == tlen && sc_delim(s[qi + 2 + tlen]))
            return qi;
        i = qi + 1;
    }
    return -1;
}

/* rcdata / rawtext: emit text, stop at the close tag (scanner parses
 * the close tag itself) */
static Py_ssize_t consume_rcdata_rawtext(P *p, Py_ssize_t pos, int *err)
{
    int rcdata = (p->raw_kind == 1);
    Py_ssize_t m = find_raw_close(p, pos);
    p->raw_kind = 0;
    if (m < 0) {
        if (pos < p->n && emit_text(p, pos, p->n,
                rcdata && memchr(p->b + pos, '&', p->n - pos) != NULL,
                rcdata) < 0)
            *err = 1;
        return p->n;
    }
    if (m > pos && emit_text(p, pos, m,
            rcdata && memchr(p->b + pos, '&', m - pos) != NULL, rcdata) < 0)
        *err = 1;
    return m;
}

/* script data: escaped / double-escaped state machine
 * (ctokenizer._consume_script) */
#define ST_COMSTART 0  /* <!--      */
#define ST_COMEND 1    /* -->       */
#define ST_CLOSE 2     /* </script  */
#define ST_OPEN 3      /* <script   */

static Py_ssize_t find_script_tok(P *p, Py_ssize_t from, int *kind)
{
    const uint8_t *s = p->b;
    Py_ssize_t n = p->n, i = from;
    while (i < n) {
        const uint8_t *q1 = memchr(s + i, '<', n - i);
        const uint8_t *q2 = memchr(s + i, '-', n - i);
        Py_ssize_t qi;
        if (q1 == NULL && q2 == NULL)
            return -1;
        if (q2 != NULL && (q1 == NULL || q2 < q1)) {
            qi = q2 - s;
            if (qi + 2 < n && s[qi + 1] == '-' && s[qi + 2] == '>') {
                *kind = ST_COMEND;
                return qi;
            }
            /* '<' may sit between this '-' and the next '-' run */
            if (q1 != NULL && q1 - s < qi + 1) {
                i = q1 - s;
                continue;
            }
            i = qi + 1;
            continue;
        }
        qi = q1 - s;
        if (qi + 3 < n && s[qi + 1] == '!' && s[qi + 2] == '-'
            && s[qi + 3] == '-') {
            *kind = ST_COMSTART;
            return qi;
        }
        if (qi + 1 < n && s[qi + 1] == '/') {
            int k;
            if (qi + 2 + 6 < n) {
                for (k = 0; k < 6; k++)
                    if (sc_lc(s[qi + 2 + k]) != (uint8_t)"script"[k])
                        break;
                if (k == 6 && sc_delim(s[qi + 2 + 6])) {
                    *kind = ST_CLOSE;
                    return qi;
                }
            }
        } else {
            int k;
            if (qi + 1 + 6 < n) {
                for (k = 0; k < 6; k++)
                    if (sc_lc(s[qi + 1 + k]) != (uint8_t)"script"[k])
                        break;
                if (k == 6 && sc_delim(s[qi + 1 + 6])) {
                    *kind = ST_OPEN;
                    return qi;
                }
            }
        }
        i = qi + 1;
    }
    return -1;
}

static Py_ssize_t consume_script(P *p, Py_ssize_t pos, int *err)
{
    Py_ssize_t n = p->n, scan = pos;
    int escaped = 0, dbl = 0;
    p->raw_kind = 0;
    for (;;) {
        int kind;
        Py_ssize_t m = find_script_tok(p, scan, &kind);
        if (m < 0) {
            if (pos < n && emit_text(p, pos, n, 0, 0) < 0)
                *err = 1;
            return n;
        }
        if (kind == ST_COMSTART) {
            if (!escaped) { escaped = 1; dbl = 0; }
            scan = m + 4;
        } else if (kind == ST_COMEND) {
            escaped = 0;
            dbl = 0;
            scan = m + 3;
        } else if (kind == ST_CLOSE) {
            if (dbl) {
                dbl = 0;
                scan = m + 8;
            } else {
                if (m > pos && emit_text(p, pos, m, 0, 0) < 0)
                    *err = 1;
                return m;
            }
        } else {  /* ST_OPEN */
            if (escaped && !dbl)
                dbl = 1;
            scan = m + 7;
        }
    }
}

/* ---------------- comment / doctype span scanners (_scan.c ports) ---- */
static Py_ssize_t scan_comment_span(P *p, Py_ssize_t start,
                                    Py_ssize_t *a, Py_ssize_t *b)
{
    const uint8_t *s = p->b;
    Py_ssize_t n = p->n;
    const uint8_t *p1, *p2;
    Py_ssize_t i1, j1;
    if (start < n && s[start] == '>') {
        *a = *b = start;
        return start + 1;
    }
    if (start + 1 < n && s[start] == '-' && s[start + 1] == '>') {
        *a = *b = start;
        return start + 2;
    }
    p1 = memmem(s + start, n - start, "-->", 3);
    p2 = memmem(s + start, n - start, "--!>", 4);
    i1 = p1 ? p1 - s : -1;
    j1 = p2 ? p2 - s : -1;
    if (j1 != -1 && (i1 == -1 || j1 < i1)) {
        *a = start;
        *b = j1;
        return j1 + 4;
    }
    if (i1 != -1) {
        *a = start;
        *b = i1;
        return i1 + 3;
    }
    *a = start;
    *b = n;
    return n;
}

/* tokenizer._bogus_comment: parse error + raw comment node up to
 * '>' (exclusive) or EOF; returns the resume position or -1 */
static Py_ssize_t bogus_comment(P *p, Py_ssize_t a)
{
    const uint8_t *e = memchr(p->b + a, '>', p->n - a);
    Py_ssize_t b = e ? (Py_ssize_t)(e - p->b) : p->n;
    PyObject *cm;
    int hr;
    if (parse_error_str(p, "bogus-comment") < 0)
        return -1;
    cm = span_str(p, a, b, 0, 0);
    if (cm == NULL)
        return -1;
    hr = handle_comment(p, cm);
    Py_DECREF(cm);
    if (hr < 0)
        return -1;
    return e ? b + 1 : p->n;
}

/* ---------------- main scan loop ---------------- */
static int run_scanner(P *p)
{
    const uint8_t *s = p->b;
    Py_ssize_t n = p->n, pos = 0;
    uint8_t scratch[MAX_NAME_SCRATCH];
    AttrSpan aspans[MAX_ATTRS];

    while (pos < n) {
        const uint8_t *ltp;
        Py_ssize_t lt, i;
        uint8_t c;

        if (p->raw_kind != 0) {
            int err = 0;
            if (p->raw_kind == 4) {
                /* plaintext: literal characters to EOF, no charrefs */
                p->raw_kind = 0;
                if (pos < n && emit_text(p, pos, n, 0, 0) < 0)
                    return -1;
                pos = n;
                if (p->aborted)
                    return -1;
                continue;
            }
            if (p->raw_kind == 3)
                pos = consume_script(p, pos, &err);
            else
                pos = consume_rcdata_rawtext(p, pos, &err);
            if (err || p->aborted)
                return -1;
            continue;
        }

        ltp = memchr(s + pos, '<', n - pos);
        lt = ltp ? (Py_ssize_t)(ltp - s) : n;
        if (lt > pos) {
            CHECK(emit_text(p, pos, lt,
                            memchr(s + pos, '&', lt - pos) != NULL, 0));
            pos = lt;
        }
        if (!ltp)
            break;
        i = pos + 1;
        if (i >= n) {
            CHECK(handle_chars(p, g_lt_str));
            break;
        }
        c = s[i];
        if (c == '/') {
            Py_ssize_t j = i + 1;
            if (j < n && sc_is_alpha(s[j])) {
                Py_ssize_t ne_pos, r;
                int na, selfc;
                Py_ssize_t nlen;
                const NameEnt *ent;
                PyObject *nm;
                r = scan_tag_spans(p, j, 1, &ne_pos, aspans, &na, &selfc);
                if (r == -1) { pos = n; break; }
                if (r == -3)
                    ABORT(p);
                nlen = lower_into(s, j, ne_pos, scratch);
                if (nlen < 0)
                    ABORT(p);
                ent = name_lookup(scratch, nlen);
                nm = intern_name(scratch, nlen);
                if (nm == NULL)
                    ABORT(p);
                CHECK(handle_end(p, ent, nm));
                if (p->aborted)
                    return -1;
                pos = r;
                continue;
            }
            if (j < n && s[j] == '>') { pos = j + 1; continue; }
            pos = bogus_comment(p, i);
            if (pos < 0 || p->aborted)
                return -1;
            continue;
        }
        if (sc_is_alpha(c)) {
            Py_ssize_t ne_pos, r;
            int na, selfc;
            Py_ssize_t nlen;
            const NameEnt *ent;
            PyObject *nm, *attrs;
            r = scan_tag_spans(p, i, 0, &ne_pos, aspans, &na, &selfc);
            if (r == -1) { pos = n; break; }
            if (r == -3)
                ABORT(p);
            nlen = lower_into(s, i, ne_pos, scratch);
            if (nlen < 0)
                ABORT(p);
            ent = name_lookup(scratch, nlen);
            nm = intern_name(scratch, nlen);
            if (nm == NULL)
                ABORT(p);
            attrs = build_attrs(p, aspans, na);
            if (attrs == NULL)
                ABORT(p);
            {
                int hr = handle_start(p, ent, nm, attrs, selfc);
                Py_DECREF(attrs);
                CHECK(hr);
            }
            if (p->aborted)
                return -1;
            pos = r;
            continue;
        }
        if (c == '!') {
            if (i + 2 < n && s[i + 1] == '-' && s[i + 2] == '-') {
                Py_ssize_t a, b;
                PyObject *cm;
                pos = scan_comment_span(p, i + 3, &a, &b);
                cm = span_str(p, a, b, 0, 0);
                if (cm == NULL)
                    return -1;
                {
                    int hr = handle_comment(p, cm);
                    Py_DECREF(cm);
                    CHECK(hr);
                }
                continue;
            }
            if (i + 8 <= n && sc_lc(s[i + 1]) == 'd' && sc_lc(s[i + 2]) == 'o'
                && sc_lc(s[i + 3]) == 'c' && sc_lc(s[i + 4]) == 't'
                && sc_lc(s[i + 5]) == 'y' && sc_lc(s[i + 6]) == 'p'
                && sc_lc(s[i + 7]) == 'e') {
                Py_ssize_t k = i + 8, ns, ne2, rend, nlen;
                const uint8_t *e;
                PyObject *nm, *rest;
                while (k < n && sc_is_ws(s[k]))
                    k++;
                ns = k;
                while (k < n && !sc_is_ws(s[k]) && s[k] != '>')
                    k++;
                ne2 = k;
                nlen = lower_into(s, ns, ne2, scratch);
                if (nlen < 0)
                    ABORT(p);
                nm = PyUnicode_DecodeUTF8((const char *)scratch, nlen,
                                          "surrogatepass");
                if (nm == NULL)
                    return -1;
                e = memchr(s + ne2, '>', n - ne2);
                rend = e ? e - s : n;
                rest = PyUnicode_DecodeUTF8((const char *)s + ne2,
                                            rend - ne2, "surrogatepass");
                if (rest == NULL) {
                    Py_DECREF(nm);
                    return -1;
                }
                {
                    int hr = handle_doctype(p, nm, rest, e == NULL);
                    Py_DECREF(nm);
                    Py_DECREF(rest);
                    CHECK(hr);
                }
                if (p->aborted)
                    return -1;
                pos = e ? rend + 1 : n;
                continue;
            }
            /* <![CDATA[ in foreign content: character tokens to "]]>"
             * (tokenizer._cdata; cdata_ok == current ns != HTML_NS).
             * Elsewhere it falls through to the bogus-comment arm */
            if (i + 8 <= n && memcmp(s + i + 1, "[CDATA[", 7) == 0
                && p->n_open
                && (p->open[p->n_open - 1].flags & F_NS_FOREIGN)) {
                Py_ssize_t a = i + 8, e2 = -1, q = a;
                PyObject *cm;
                while (q + 2 < n) {
                    const uint8_t *rb = memchr(s + q, ']', n - q - 2);
                    if (rb == NULL)
                        break;
                    q = rb - s;
                    if (s[q + 1] == ']' && s[q + 2] == '>') {
                        e2 = q;
                        break;
                    }
                    q++;
                }
                if (e2 == -1) {
                    cm = span_str(p, a, n, 0, 0);
                    pos = n;
                } else {
                    cm = span_str(p, a, e2, 0, 0);
                    pos = e2 + 3;
                }
                if (cm == NULL)
                    return -1;
                {
                    int hr = handle_chars(p, cm);
                    Py_DECREF(cm);
                    CHECK(hr);
                }
                if (p->aborted)
                    return -1;
                continue;
            }
            pos = bogus_comment(p, i + 1);
            if (pos < 0 || p->aborted)
                return -1;
            continue;
        }
        if (c == '?') {
            pos = bogus_comment(p, i);
            if (pos < 0 || p->aborted)
                return -1;
            continue;
        }
        /* literal '<': the char after stays in data */
        CHECK(handle_chars(p, g_lt_str));
        pos = i;
    }
    return handle_eof(p);
}

/* ============ CSS selector engine over CNode arenas ============
 *
 * Mirrors css/matcher.py exactly (itself faithful to the selectors-0.22
 * behavior bound by the reference Element impl, element.rs:13-218).
 * css/lower.py lowers a parsed selector AST to a flat IR;
 * compile_program() turns the IR into malloc'd structs held by a
 * capsule; select_all() then runs the preorder DFS of
 * stages/extract._select_all and api._matches_dfs in one C pass, and
 * text() is dom.Tree.text.  Any non-CNode in the arena (Python-created
 * nodes after DOM mutation, unpickled trees) => None return, the caller
 * falls back to the Python engine.
 */

static PyObject *NM_id_attr = NULL, *NM_class_attr = NULL,
                *NM_link_el = NULL;

typedef struct SComplex SComplex;

typedef struct {
    int kind;      /* 0 univ 1 type 2 #id 3 .class 4 [attr] 5 pseudo
                      6 nth 7 :not */
    int op;        /* attr op (0 presence .. 6 '*=', 7 never) / pseudo
                      code */
    int ci, a, b, flags;
    PyObject *s1, *s2, *val, *aux;  /* borrowed: program holds IR ref */
    SComplex *sub;                  /* :not selector list */
    int n_sub;
} SSimple;

typedef struct { SSimple *s; int n; } SCompound;
typedef struct { int comb; SCompound comp; } SPart;
struct SComplex { SPart *parts; int n; };

typedef struct {
    SComplex *sels; int n;
    PyObject **fast; int n_fast;    /* borrowed interned names */
    PyObject *ir;                   /* strong ref keeps strings alive */
} SProgram;

static void sel_free_complexes(SComplex *cs, int n);

static void sel_free_compound(SCompound *c)
{
    int i;
    if (c->s == NULL)
        return;
    for (i = 0; i < c->n; i++)
        if (c->s[i].sub != NULL)
            sel_free_complexes(c->s[i].sub, c->s[i].n_sub);
    PyMem_Free(c->s);
}

static void sel_free_complexes(SComplex *cs, int n)
{
    int i, j;
    if (cs == NULL)
        return;
    for (i = 0; i < n; i++) {
        if (cs[i].parts == NULL)
            continue;
        for (j = 0; j < cs[i].n; j++)
            sel_free_compound(&cs[i].parts[j].comp);
        PyMem_Free(cs[i].parts);
    }
    PyMem_Free(cs);
}

static void sel_free_program(SProgram *p)
{
    if (p == NULL)
        return;
    sel_free_complexes(p->sels, p->n);
    PyMem_Free(p->fast);
    Py_XDECREF(p->ir);
    PyMem_Free(p);
}

static void sprog_capsule_destroy(PyObject *capsule)
{
    SProgram *p = (SProgram *)PyCapsule_GetPointer(
        capsule, "nr_fastlane.SProgram");
    if (p != NULL)
        sel_free_program(p);
}

static int sel_build_complexes(PyObject *tup, SComplex **out, int *n_out);

static int sel_build_compound(PyObject *tup, SCompound *c)
{
    Py_ssize_t n, i;
    if (!PyTuple_Check(tup))
        goto bad;
    n = PyTuple_GET_SIZE(tup);
    c->s = PyMem_Calloc(n ? n : 1, sizeof(SSimple));
    if (c->s == NULL) {
        PyErr_NoMemory();
        return -1;
    }
    c->n = (int)n;
    for (i = 0; i < n; i++) {
        PyObject *row = PyTuple_GET_ITEM(tup, i);
        SSimple *s = &c->s[i];
        Py_ssize_t rn;
        long kind;
        if (!PyTuple_Check(row) || PyTuple_GET_SIZE(row) < 1)
            goto bad;
        rn = PyTuple_GET_SIZE(row);
        kind = PyLong_AsLong(PyTuple_GET_ITEM(row, 0));
        if (kind == -1 && PyErr_Occurred())
            return -1;
        s->kind = (int)kind;
        switch (kind) {
        case 0:
            break;
        case 1:
            if (rn < 3) goto bad;
            s->s1 = PyTuple_GET_ITEM(row, 1);
            s->s2 = PyTuple_GET_ITEM(row, 2);
            break;
        case 2:
        case 3:
            if (rn < 2) goto bad;
            s->s1 = PyTuple_GET_ITEM(row, 1);
            break;
        case 4:
            if (rn < 7) goto bad;
            s->s1 = PyTuple_GET_ITEM(row, 1);
            s->s2 = PyTuple_GET_ITEM(row, 2);
            s->op = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 3));
            s->val = PyTuple_GET_ITEM(row, 4);
            s->aux = PyTuple_GET_ITEM(row, 5);
            s->ci = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 6));
            break;
        case 5:
            if (rn < 2) goto bad;
            s->op = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 1));
            break;
        case 6:
            if (rn < 4) goto bad;
            s->flags = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 1));
            s->a = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 2));
            s->b = (int)PyLong_AsLong(PyTuple_GET_ITEM(row, 3));
            break;
        case 7:
            if (rn < 2) goto bad;
            if (sel_build_complexes(PyTuple_GET_ITEM(row, 1),
                                    &s->sub, &s->n_sub) < 0)
                return -1;
            break;
        default:
            goto bad;
        }
        if (PyErr_Occurred())
            return -1;
    }
    return 0;
bad:
    PyErr_SetString(PyExc_ValueError, "bad selector IR");
    return -1;
}

static int sel_build_complexes(PyObject *tup, SComplex **out, int *n_out)
{
    Py_ssize_t n, i, j;
    SComplex *cs;
    if (!PyTuple_Check(tup)) {
        PyErr_SetString(PyExc_ValueError, "bad selector IR");
        return -1;
    }
    n = PyTuple_GET_SIZE(tup);
    cs = PyMem_Calloc(n ? n : 1, sizeof(SComplex));
    if (cs == NULL) {
        PyErr_NoMemory();
        return -1;
    }
    *out = cs;          /* set early: caller frees on error */
    *n_out = (int)n;
    for (i = 0; i < n; i++) {
        PyObject *cx = PyTuple_GET_ITEM(tup, i);
        Py_ssize_t np;
        if (!PyTuple_Check(cx)) {
            PyErr_SetString(PyExc_ValueError, "bad selector IR");
            return -1;
        }
        np = PyTuple_GET_SIZE(cx);
        cs[i].parts = PyMem_Calloc(np ? np : 1, sizeof(SPart));
        if (cs[i].parts == NULL) {
            PyErr_NoMemory();
            return -1;
        }
        cs[i].n = (int)np;
        for (j = 0; j < np; j++) {
            PyObject *part = PyTuple_GET_ITEM(cx, j);
            if (!PyTuple_Check(part) || PyTuple_GET_SIZE(part) < 2) {
                PyErr_SetString(PyExc_ValueError, "bad selector IR");
                return -1;
            }
            cs[i].parts[j].comb =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(part, 0));
            if (PyErr_Occurred())
                return -1;
            if (sel_build_compound(PyTuple_GET_ITEM(part, 1),
                                   &cs[i].parts[j].comp) < 0)
                return -1;
        }
    }
    return 0;
}

static PyObject *fl_compile_program(PyObject *self, PyObject *arg)
{
    SProgram *p;
    PyObject *sels, *fast, *cap;
    (void)self;
    if (!PyTuple_Check(arg) || PyTuple_GET_SIZE(arg) != 2) {
        PyErr_SetString(PyExc_ValueError, "bad selector IR");
        return NULL;
    }
    sels = PyTuple_GET_ITEM(arg, 0);
    fast = PyTuple_GET_ITEM(arg, 1);
    p = PyMem_Calloc(1, sizeof(SProgram));
    if (p == NULL)
        return PyErr_NoMemory();
    Py_INCREF(arg);
    p->ir = arg;
    if (sel_build_complexes(sels, &p->sels, &p->n) < 0)
        goto fail;
    if (fast != Py_None) {
        Py_ssize_t nf, i;
        if (!PyTuple_Check(fast)) {
            PyErr_SetString(PyExc_ValueError, "bad selector IR");
            goto fail;
        }
        nf = PyTuple_GET_SIZE(fast);
        p->fast = PyMem_Calloc(nf ? nf : 1, sizeof(PyObject *));
        if (p->fast == NULL) {
            PyErr_NoMemory();
            goto fail;
        }
        p->n_fast = (int)nf;
        for (i = 0; i < nf; i++)
            p->fast[i] = PyTuple_GET_ITEM(fast, i);
    }
    cap = PyCapsule_New(p, "nr_fastlane.SProgram", sprog_capsule_destroy);
    if (cap == NULL)
        goto fail;
    return cap;
fail:
    sel_free_program(p);
    return NULL;
}

/* --------- matching (mirrors css/matcher.py line for line) --------- */

static int ueq(PyObject *a, PyObject *b)
{
    if (a == b)
        return 1;
    if (a == NULL || b == NULL)
        return 0;
    if (!PyUnicode_Check(a) || !PyUnicode_Check(b))
        return 0;
    return PyUnicode_Compare(a, b) == 0;
}

static int sel_is_html(CNode *n)
{
    return n->ns == g_html_ns || ueq(n->ns, g_html_ns);
}

/* attr entry accessors tolerant of [ns,name,value] lists or tuples */
static int sel_attr_entry(PyObject *a, PyObject **name, PyObject **value)
{
    if (PyList_Check(a) && PyList_GET_SIZE(a) >= 3) {
        *name = PyList_GET_ITEM(a, 1);
        *value = PyList_GET_ITEM(a, 2);
        return 1;
    }
    if (PyTuple_Check(a) && PyTuple_GET_SIZE(a) >= 3) {
        *name = PyTuple_GET_ITEM(a, 1);
        *value = PyTuple_GET_ITEM(a, 2);
        return 1;
    }
    return 0;
}

/* value of the FIRST attr named *want* (matcher.py break-on-name) */
static PyObject *sel_attr_first(CNode *n, PyObject *want)
{
    PyObject *attrs = n->attrs;
    Py_ssize_t i, len;
    if (attrs == NULL || !PyList_Check(attrs))
        return NULL;
    len = PyList_GET_SIZE(attrs);
    for (i = 0; i < len; i++) {
        PyObject *an, *av;
        if (!sel_attr_entry(PyList_GET_ITEM(attrs, i), &an, &av))
            continue;
        if (ueq(an, want))
            return av;
    }
    return NULL;
}

/* #id: ANY attr named id with the value (matcher.py loops past
 * non-matching values) */
static int sel_match_id(CNode *n, PyObject *value)
{
    PyObject *attrs = n->attrs;
    Py_ssize_t i, len;
    if (attrs == NULL || !PyList_Check(attrs))
        return 0;
    len = PyList_GET_SIZE(attrs);
    for (i = 0; i < len; i++) {
        PyObject *an, *av;
        if (!sel_attr_entry(PyList_GET_ITEM(attrs, i), &an, &av))
            continue;
        if (ueq(an, NM_id_attr) && ueq(av, value))
            return 1;
    }
    return 0;
}

/* Python str.split() whitespace in the ASCII range */
#define IS_PYSPACE(c) \
    ((c) == ' ' || ((c) >= 0x09 && (c) <= 0x0d) \
     || ((c) >= 0x1c && (c) <= 0x1f))

static int sel_ws_contains_slow(PyObject *val, PyObject *target)
{
    PyObject *list = PyUnicode_Split(val, NULL, -1);
    Py_ssize_t i, n;
    int found = 0;
    if (list == NULL)
        return -1;
    n = PyList_GET_SIZE(list);
    for (i = 0; i < n; i++)
        if (ueq(PyList_GET_ITEM(list, i), target)) {
            found = 1;
            break;
        }
    Py_DECREF(list);
    return found;
}

/* target in val.split() */
static int sel_ws_contains(PyObject *val, PyObject *target)
{
    if (PyUnicode_IS_ASCII(val) && PyUnicode_IS_ASCII(target)) {
        const uint8_t *v = PyUnicode_1BYTE_DATA(val);
        const uint8_t *t = PyUnicode_1BYTE_DATA(target);
        Py_ssize_t vl = PyUnicode_GET_LENGTH(val);
        Py_ssize_t tl = PyUnicode_GET_LENGTH(target);
        Py_ssize_t i = 0;
        if (tl == 0)
            return 0;   /* split() never yields "" */
        while (i < vl) {
            Py_ssize_t start;
            while (i < vl && IS_PYSPACE(v[i]))
                i++;
            start = i;
            while (i < vl && !IS_PYSPACE(v[i]))
                i++;
            if (i - start == tl && memcmp(v + start, t, tl) == 0)
                return 1;
        }
        return 0;
    }
    return sel_ws_contains_slow(val, target);
}

static int sel_attr_op(PyObject *actual, SSimple *s)
{
    Py_ssize_t r;
    switch (s->op) {
    case 1:
        return ueq(actual, s->val);
    case 2:
        return sel_ws_contains(actual, s->val);
    case 3:
        if (ueq(actual, s->val))
            return 1;
        r = PyUnicode_Tailmatch(actual, s->aux, 0, PY_SSIZE_T_MAX, -1);
        return r < 0 ? -1 : (int)r;
    case 4:
        r = PyUnicode_Tailmatch(actual, s->val, 0, PY_SSIZE_T_MAX, -1);
        return r < 0 ? -1 : (int)r;
    case 5:
        r = PyUnicode_Tailmatch(actual, s->val, 0, PY_SSIZE_T_MAX, 1);
        return r < 0 ? -1 : (int)r;
    case 6:
        return PyUnicode_Contains(actual, s->val);  /* -1 on error */
    }
    return 0;
}

static int sel_match_attr(CNode *n, SSimple *s)
{
    PyObject *want, *actual;
    int r;
    if (n->kind != K_ELEMENT)
        return 0;
    want = sel_is_html(n) ? s->s2 : s->s1;
    actual = sel_attr_first(n, want);   /* borrowed */
    if (actual == NULL)
        return 0;
    if (s->op == 0)
        return 1;
    if (s->op == 7)
        return 0;   /* precomputed never-matches */
    if (!PyUnicode_Check(actual))
        return 0;
    if (s->ci) {
        PyObject *low = PyObject_CallMethod(actual, "lower", NULL);
        if (low == NULL)
            return -1;
        r = sel_attr_op(low, s);
        Py_DECREF(low);
        return r;
    }
    return sel_attr_op(actual, s);
}

static int sel_prev_elem(PyObject *nodes, int nid)
{
    int s = ((CNode *)PyList_GET_ITEM(nodes, nid))->prev;
    while (s != -1) {
        CNode *sn = (CNode *)PyList_GET_ITEM(nodes, s);
        if (sn->kind == K_ELEMENT)
            return s;
        s = sn->prev;
    }
    return -1;
}

static int sel_next_elem(PyObject *nodes, int nid)
{
    int s = ((CNode *)PyList_GET_ITEM(nodes, nid))->next;
    while (s != -1) {
        CNode *sn = (CNode *)PyList_GET_ITEM(nodes, s);
        if (sn->kind == K_ELEMENT)
            return s;
        s = sn->next;
    }
    return -1;
}

static int sel_nth_index(PyObject *nodes, int nid, CNode *n,
                         int of_type, int from_end)
{
    int idx = 1;
    int sib = from_end ? sel_next_elem(nodes, nid)
                       : sel_prev_elem(nodes, nid);
    while (sib != -1) {
        if (!of_type)
            idx++;
        else {
            CNode *s = (CNode *)PyList_GET_ITEM(nodes, sib);
            if (n->kind == K_ELEMENT && s->kind == K_ELEMENT
                && ueq(s->name, n->name) && ueq(s->ns, n->ns))
                idx++;
        }
        sib = from_end ? sel_next_elem(nodes, sib)
                       : sel_prev_elem(nodes, sib);
    }
    return idx;
}

static int sel_match_pseudo(PyObject *nodes, int nid, CNode *n, int code)
{
    switch (code) {
    case 0:   /* :link / :any-link — the is_link() local-name quirk */
        return n->kind == K_ELEMENT && ueq(n->name, NM_link_el);
    case 1:   /* :visited never matches */
        return 0;
    case 2:   /* :root / :scope match the Document node */
        return n->kind == K_DOCUMENT;
    case 3: { /* :empty — no element or text children */
        int c = n->first_child;
        while (c != -1) {
            CNode *cd = (CNode *)PyList_GET_ITEM(nodes, c);
            if (cd->kind == K_ELEMENT || cd->kind == K_TEXT)
                return 0;
            c = cd->next;
        }
        return 1;
    }
    case 4:
        return sel_prev_elem(nodes, nid) == -1;
    case 5:
        return sel_next_elem(nodes, nid) == -1;
    case 6:
        return sel_prev_elem(nodes, nid) == -1
            && sel_next_elem(nodes, nid) == -1;
    case 7:
        return sel_nth_index(nodes, nid, n, 1, 0) == 1;
    case 8:
        return sel_nth_index(nodes, nid, n, 1, 1) == 1;
    case 9:
        return sel_nth_index(nodes, nid, n, 1, 0) == 1
            && sel_nth_index(nodes, nid, n, 1, 1) == 1;
    }
    return 0;
}

static int sel_match_complexes(PyObject *nodes, int nid,
                               SComplex *cs, int n);

static int sel_match_compound(PyObject *nodes, int nid, SCompound *c)
{
    CNode *n = (CNode *)PyList_GET_ITEM(nodes, nid);
    int i, r;
    for (i = 0; i < c->n; i++) {
        SSimple *s = &c->s[i];
        switch (s->kind) {
        case 0:
            break;
        case 1:
            if (n->kind != K_ELEMENT)
                return 0;
            if (!ueq(n->name, sel_is_html(n) ? s->s2 : s->s1))
                return 0;
            break;
        case 2:
            if (n->kind != K_ELEMENT || !sel_match_id(n, s->s1))
                return 0;
            break;
        case 3: {
            PyObject *val;
            if (n->kind != K_ELEMENT)
                return 0;
            val = sel_attr_first(n, NM_class_attr);
            if (val == NULL || !PyUnicode_Check(val))
                return 0;
            r = sel_ws_contains(val, s->s1);
            if (r <= 0)
                return r;
            break;
        }
        case 4:
            r = sel_match_attr(n, s);
            if (r <= 0)
                return r;
            break;
        case 5:
            r = sel_match_pseudo(nodes, nid, n, s->op);
            if (r <= 0)
                return r;
            break;
        case 6: {
            int idx, d;
            int of_type = s->flags & 1, from_end = s->flags & 2;
            if (of_type && n->kind != K_ELEMENT)
                idx = 1;
            else
                idx = sel_nth_index(nodes, nid, n, of_type, from_end);
            if (s->a == 0) {
                if (idx != s->b)
                    return 0;
            } else {
                d = idx - s->b;
                if (s->a > 0) {
                    if (!(d >= 0 && d % s->a == 0))
                        return 0;
                } else {
                    if (!(d <= 0 && (-d) % (-s->a) == 0))
                        return 0;
                }
            }
            break;
        }
        case 7:
            r = sel_match_complexes(nodes, nid, s->sub, s->n_sub);
            if (r < 0)
                return -1;
            if (r)
                return 0;
            break;
        }
    }
    return 1;
}

static int sel_match_parts(PyObject *nodes, int nid, SComplex *cx, int idx)
{
    int r = sel_match_compound(nodes, nid, &cx->parts[idx].comp);
    int comb;
    if (r <= 0)
        return r;
    if (idx == 0)
        return 1;
    comb = cx->parts[idx].comb;
    if (comb == 2) {        /* > */
        int parent = ((CNode *)PyList_GET_ITEM(nodes, nid))->parent;
        if (parent == -1)
            return 0;
        return sel_match_parts(nodes, parent, cx, idx - 1);
    }
    if (comb == 1) {        /* descendant */
        int parent = ((CNode *)PyList_GET_ITEM(nodes, nid))->parent;
        while (parent != -1) {
            r = sel_match_parts(nodes, parent, cx, idx - 1);
            if (r != 0)
                return r;
            parent = ((CNode *)PyList_GET_ITEM(nodes, parent))->parent;
        }
        return 0;
    }
    if (comb == 3) {        /* + */
        int sib = sel_prev_elem(nodes, nid);
        if (sib == -1)
            return 0;
        return sel_match_parts(nodes, sib, cx, idx - 1);
    }
    if (comb == 4) {        /* ~ */
        int sib = sel_prev_elem(nodes, nid);
        while (sib != -1) {
            r = sel_match_parts(nodes, sib, cx, idx - 1);
            if (r != 0)
                return r;
            sib = sel_prev_elem(nodes, sib);
        }
        return 0;
    }
    return 0;
}

static int sel_match_complexes(PyObject *nodes, int nid,
                               SComplex *cs, int n)
{
    int i, r;
    for (i = 0; i < n; i++) {
        r = sel_match_parts(nodes, nid, &cs[i], cs[i].n - 1);
        if (r != 0)
            return r;   /* matched or error */
    }
    return 0;
}

static int sel_match_program(PyObject *nodes, int nid, SProgram *p)
{
    if (p->n_fast > 0) {
        CNode *n = (CNode *)PyList_GET_ITEM(nodes, nid);
        int i, hit = 0;
        if (n->kind != K_ELEMENT)
            return 0;
        for (i = 0; i < p->n_fast; i++)
            if (ueq(n->name, p->fast[i])) {
                hit = 1;
                break;
            }
        if (!hit)
            return 0;
    }
    return sel_match_complexes(nodes, nid, p->sels, p->n);
}

static PyObject *fl_select_all(PyObject *self, PyObject *args)
{
    PyObject *nodes, *progs_in, *roots_in;
    PyObject *progs = NULL, *roots = NULL, *results = NULL;
    int include_node;
    Py_ssize_t N, K, R, i, k, ri;
    SProgram **P = NULL;
    int *stack = NULL;
    uint8_t *seen = NULL;
    int fallback = 0;
    (void)self;
    if (!PyArg_ParseTuple(args, "O!OOp", &PyList_Type, &nodes,
                          &progs_in, &roots_in, &include_node))
        return NULL;
    N = PyList_GET_SIZE(nodes);
    for (i = 0; i < N; i++)
        if (Py_TYPE(PyList_GET_ITEM(nodes, i)) != &CNodeType)
            Py_RETURN_NONE;
    if (N == 0)
        Py_RETURN_NONE;
    progs = PySequence_Fast(progs_in, "programs must be a sequence");
    if (progs == NULL)
        return NULL;
    roots = PySequence_Fast(roots_in, "roots must be a sequence");
    if (roots == NULL) {
        Py_DECREF(progs);
        return NULL;
    }
    K = PySequence_Fast_GET_SIZE(progs);
    R = PySequence_Fast_GET_SIZE(roots);
    P = PyMem_Malloc((K ? K : 1) * sizeof(SProgram *));
    if (P == NULL) {
        PyErr_NoMemory();
        goto fail;
    }
    for (k = 0; k < K; k++) {
        P[k] = PyCapsule_GetPointer(PySequence_Fast_GET_ITEM(progs, k),
                                    "nr_fastlane.SProgram");
        if (P[k] == NULL)
            goto fail;
    }
    results = PyList_New(K);
    if (results == NULL)
        goto fail;
    for (k = 0; k < K; k++) {
        PyObject *lst = PyList_New(0);
        if (lst == NULL)
            goto fail;
        PyList_SET_ITEM(results, k, lst);
    }
    stack = PyMem_Malloc((N + 1) * sizeof(int));
    if (stack == NULL) {
        PyErr_NoMemory();
        goto fail;
    }
    if (R > 1) {
        seen = PyMem_Calloc((size_t)(K ? K : 1) * (size_t)N, 1);
        if (seen == NULL) {
            PyErr_NoMemory();
            goto fail;
        }
    }
    for (ri = 0; ri < R; ri++) {
        long root = PyLong_AsLong(PySequence_Fast_GET_ITEM(roots, ri));
        Py_ssize_t sp = 0;
        if (root == -1 && PyErr_Occurred())
            goto fail;
        if (root < 0 || root >= N) {
            PyErr_SetString(PyExc_IndexError, "root out of range");
            goto fail;
        }
        if (include_node) {
            stack[sp++] = (int)root;
        } else {
            int c = ((CNode *)PyList_GET_ITEM(nodes, root))->last_child;
            while (c != -1) {
                if ((unsigned)c >= (unsigned)N || sp >= N) {
                    fallback = 1;
                    goto done;
                }
                stack[sp++] = c;
                c = ((CNode *)PyList_GET_ITEM(nodes, c))->prev;
            }
        }
        while (sp > 0) {
            int nid = stack[--sp];
            CNode *n = (CNode *)PyList_GET_ITEM(nodes, nid);
            int c = n->last_child;
            while (c != -1) {
                if ((unsigned)c >= (unsigned)N || sp >= N) {
                    fallback = 1;   /* corrupt links: Python decides */
                    goto done;
                }
                stack[sp++] = c;
                c = ((CNode *)PyList_GET_ITEM(nodes, c))->prev;
            }
            for (k = 0; k < K; k++) {
                int r;
                if (seen != NULL && seen[k * N + nid])
                    continue;
                r = sel_match_program(nodes, nid, P[k]);
                if (r < 0)
                    goto fail;
                if (r) {
                    PyObject *num;
                    if (seen != NULL)
                        seen[k * N + nid] = 1;
                    num = PyLong_FromLong(nid);
                    if (num == NULL)
                        goto fail;
                    if (PyList_Append(PyList_GET_ITEM(results, k),
                                      num) < 0) {
                        Py_DECREF(num);
                        goto fail;
                    }
                    Py_DECREF(num);
                }
            }
        }
    }
done:
    PyMem_Free(P);
    PyMem_Free(stack);
    PyMem_Free(seen);
    Py_DECREF(progs);
    Py_DECREF(roots);
    if (fallback) {
        Py_DECREF(results);
        Py_RETURN_NONE;
    }
    return results;
fail:
    PyMem_Free(P);
    PyMem_Free(stack);
    PyMem_Free(seen);
    Py_XDECREF(progs);
    Py_XDECREF(roots);
    Py_XDECREF(results);
    return NULL;
}

/* collect_attr(nodes, nids, name) -> [value, ...] for every nid that
 * carries the attribute (api Selection attrs:NAME rule kind), or None
 * to fall back on mixed arenas */
static PyObject *fl_collect_attr(PyObject *self, PyObject *args)
{
    PyObject *nodes, *nids, *name, *out;
    Py_ssize_t N, k, M;
    (void)self;
    if (!PyArg_ParseTuple(args, "O!O!U", &PyList_Type, &nodes,
                          &PyList_Type, &nids, &name))
        return NULL;
    N = PyList_GET_SIZE(nodes);
    M = PyList_GET_SIZE(nids);
    out = PyList_New(0);
    if (out == NULL)
        return NULL;
    for (k = 0; k < M; k++) {
        PyObject *io = PyList_GET_ITEM(nids, k);
        Py_ssize_t nid;
        PyObject *o;
        CNode *n;
        Py_ssize_t j, na;
        if (!PyLong_Check(io))
            goto fallback;
        nid = PyLong_AsSsize_t(io);
        if (nid < 0 || nid >= N)
            goto fallback;
        o = PyList_GET_ITEM(nodes, nid);
        if (Py_TYPE(o) != &CNodeType)
            goto fallback;
        n = (CNode *)o;
        if (n->kind != K_ELEMENT || n->attrs == NULL)
            continue;
        if (!PyList_Check(n->attrs))
            goto fallback;
        na = PyList_GET_SIZE(n->attrs);
        for (j = 0; j < na; j++) {
            PyObject *a = PyList_GET_ITEM(n->attrs, j);
            PyObject *an;
            if (!PyList_Check(a) || PyList_GET_SIZE(a) < 3)
                goto fallback;
            an = PyList_GET_ITEM(a, 1);
            if (an == name || ueq(an, name)) {
                if (PyList_Append(out, PyList_GET_ITEM(a, 2)) < 0) {
                    Py_DECREF(out);
                    return NULL;
                }
                break;
            }
        }
    }
    return out;
fallback:
    Py_DECREF(out);
    Py_RETURN_NONE;
}

static PyObject *fl_text(PyObject *self, PyObject *args)
{
    PyObject *nodes, *parts = NULL, *res;
    int nid;
    Py_ssize_t N, sp = 0;
    int *stack = NULL;
    (void)self;
    if (!PyArg_ParseTuple(args, "O!i", &PyList_Type, &nodes, &nid))
        return NULL;
    N = PyList_GET_SIZE(nodes);
    if (nid < 0 || nid >= N)
        Py_RETURN_NONE;     /* fall back: Python raises its own error */
    stack = PyMem_Malloc((N + 1) * sizeof(int));
    if (stack == NULL)
        return PyErr_NoMemory();
    parts = PyList_New(0);
    if (parts == NULL) {
        PyMem_Free(stack);
        return NULL;
    }
    stack[sp++] = nid;
    while (sp > 0) {
        int cur = stack[--sp];
        PyObject *o = PyList_GET_ITEM(nodes, cur);
        CNode *n;
        if (Py_TYPE(o) != &CNodeType)
            goto fallback;
        n = (CNode *)o;
        if (n->kind == K_ELEMENT) {
            int c = n->last_child;
            while (c != -1) {
                PyObject *co;
                if ((unsigned)c >= (unsigned)N || sp >= N)
                    goto fallback;
                stack[sp++] = c;
                co = PyList_GET_ITEM(nodes, c);
                if (Py_TYPE(co) != &CNodeType)
                    goto fallback;
                c = ((CNode *)co)->prev;
            }
        } else if (n->kind == K_TEXT) {
            if (n->data == NULL || !PyUnicode_Check(n->data))
                goto fallback;
            if (PyList_Append(parts, n->data) < 0) {
                PyMem_Free(stack);
                Py_DECREF(parts);
                return NULL;
            }
        }
    }
    PyMem_Free(stack);
    res = PyUnicode_Join(g_empty_str, parts);
    Py_DECREF(parts);
    return res;
fallback:
    PyMem_Free(stack);
    Py_DECREF(parts);
    Py_RETURN_NONE;
}

/* ---------------- entry points ---------------- */
static void p_free(P *p, int decref_nodes)
{
    int i;
    if (decref_nodes)
        for (i = 0; i < p->n_nodes; i++)
            Py_DECREF(p->nodes[i]);
    PyMem_Free(p->nodes);
    PyMem_Free(p->open);
    for (i = 0; i < p->n_afe; i++) {
        Py_XDECREF(p->afe[i].name);
        Py_XDECREF(p->afe[i].attrs);
    }
    PyMem_Free(p->afe);
    Py_XDECREF(p->pend);
    Py_XDECREF(p->tt);
    Py_XDECREF(p->errors);
    Py_XDECREF(p->quirks_name);
    Py_XDECREF(p->quirks_rest);
}

static PyObject *fl_parse(PyObject *self, PyObject *arg)
{
    P p;
    char *buf;
    Py_ssize_t blen;
    (void)self;
    if (g_decode == NULL) {
        PyErr_SetString(PyExc_RuntimeError, "fastlane.setup() not called");
        return NULL;
    }
    if (PyBytes_AsStringAndSize(arg, &buf, &blen) < 0)
        return NULL;
    if (blen > INT32_MAX / 2)
        Py_RETURN_NONE;
    memset(&p, 0, sizeof(p));
    p.b = (const uint8_t *)buf;
    p.n = blen;
    p.head_id = -1;
    p.form_id = -1;
    p.frameset_ok = 1;
    p.pend_parent = -1;
    p.pend_before = -1;
    p.pend_merge = -1;
    p.mode = M_INITIAL;
    p.original_mode = M_IN_BODY;

    if (new_node(&p, K_DOCUMENT) == NULL) {
        p_free(&p, 1);
        return NULL;
    }

    if (run_scanner(&p) < 0 || p.aborted) {
        /* abort => Python fallback; swallow any in-flight exception
         * (the Python machine recomputes and raises visibly if real) */
        PyErr_Clear();
        p_free(&p, 1);
        Py_RETURN_NONE;
    }

    {
        PyObject *list = PyList_New(p.n_nodes);
        PyObject *errors, *out;
        int i;
        if (list == NULL) {
            p_free(&p, 1);
            return NULL;
        }
        for (i = 0; i < p.n_nodes; i++)
            PyList_SET_ITEM(list, i, p.nodes[i]);  /* steal refs */
        p.n_nodes = 0;
        errors = p.errors != NULL ? p.errors : PyList_New(0);
        p.errors = NULL;
        if (errors == NULL) {
            Py_DECREF(list);
            p_free(&p, 0);
            return NULL;
        }
        {
            /* quirks inputs for the shared Python decision, or None
             * when no INITIAL-mode doctype was seen (-> quirks) */
            PyObject *q;
            if (p.quirks_name != NULL)
                q = PyTuple_Pack(3, p.quirks_name, p.quirks_rest,
                                 p.quirks_eof ? Py_True : Py_False);
            else {
                q = Py_None;
                Py_INCREF(q);
            }
            if (q == NULL) {
                Py_DECREF(list);
                Py_DECREF(errors);
                p_free(&p, 0);
                return NULL;
            }
            out = PyTuple_Pack(3, list, errors, q);
            Py_DECREF(q);
        }
        Py_DECREF(list);
        Py_DECREF(errors);
        p_free(&p, 0);
        return out;
    }
}

static PyObject *fl_setup(PyObject *self, PyObject *args)
{
    PyObject *decode, *html_ns, *node_from_state;
    PyObject *svg_ns, *mathml_ns, *svg_tag, *svg_attr, *foreign_attr;
    (void)self;
    if (!PyArg_ParseTuple(args, "OOOOOOOO", &decode, &html_ns,
                          &node_from_state, &svg_ns, &mathml_ns,
                          &svg_tag, &svg_attr, &foreign_attr))
        return NULL;
    Py_INCREF(decode);
    Py_XSETREF(g_decode, decode);
    Py_INCREF(html_ns);
    Py_XSETREF(g_html_ns, html_ns);
    Py_INCREF(node_from_state);
    Py_XSETREF(g_node_from_state, node_from_state);
    Py_INCREF(svg_ns);
    Py_XSETREF(g_svg_ns, svg_ns);
    Py_INCREF(mathml_ns);
    Py_XSETREF(g_mathml_ns, mathml_ns);
    Py_INCREF(svg_tag);
    Py_XSETREF(g_svg_tag_adj, svg_tag);
    Py_INCREF(svg_attr);
    Py_XSETREF(g_svg_attr_adj, svg_attr);
    Py_INCREF(foreign_attr);
    Py_XSETREF(g_foreign_attr_adj, foreign_attr);
    if (NM_definitionURL == NULL) {
        NM_definitionURL = PyUnicode_FromString("definitionURL");
        if (NM_definitionURL == NULL)
            return NULL;
        PyUnicode_InternInPlace(&NM_definitionURL);
    }
    if (g_nul_str == NULL) {
        g_nul_str = PyUnicode_FromStringAndSize("\0", 1);
        g_fffd_str = PyUnicode_FromOrdinal(0xFFFD);
        if (g_nul_str == NULL || g_fffd_str == NULL)
            return NULL;
    }
    if (g_lt_str == NULL) {
        g_lt_str = PyUnicode_FromString("<");
        g_empty_str = PyUnicode_FromString("");
        NM_html = intern_name((const uint8_t *)"html", 4);
        NM_head = intern_name((const uint8_t *)"head", 4);
        NM_body = intern_name((const uint8_t *)"body", 4);
        NM_p = intern_name((const uint8_t *)"p", 1);
        NM_img = intern_name((const uint8_t *)"img", 3);
        NM_rtc = intern_name((const uint8_t *)"rtc", 3);
        NM_colgroup = intern_name((const uint8_t *)"colgroup", 8);
        NM_tbody = intern_name((const uint8_t *)"tbody", 5);
        NM_tr = intern_name((const uint8_t *)"tr", 2);
        NM_type = intern_name((const uint8_t *)"type", 4);
        NM_id_attr = intern_name((const uint8_t *)"id", 2);
        NM_class_attr = intern_name((const uint8_t *)"class", 5);
        NM_link_el = intern_name((const uint8_t *)"link", 4);
        if (NM_id_attr == NULL || NM_class_attr == NULL
            || NM_link_el == NULL)
            return NULL;
        Py_INCREF(NM_id_attr);
        Py_INCREF(NM_class_attr);
        Py_INCREF(NM_link_el);
        if (g_lt_str == NULL || g_empty_str == NULL || NM_html == NULL
            || NM_head == NULL || NM_body == NULL || NM_p == NULL
            || NM_img == NULL || NM_rtc == NULL || NM_colgroup == NULL
            || NM_tbody == NULL || NM_tr == NULL || NM_type == NULL)
            return NULL;
        Py_INCREF(NM_html);  /* hold refs beyond the cache's */
        Py_INCREF(NM_head);
        Py_INCREF(NM_body);
        Py_INCREF(NM_p);
        Py_INCREF(NM_img);
        Py_INCREF(NM_rtc);
        Py_INCREF(NM_colgroup);
        Py_INCREF(NM_tbody);
        Py_INCREF(NM_tr);
        Py_INCREF(NM_type);
    }
    Py_RETURN_NONE;
}

static PyMethodDef fl_methods[] = {
    {"setup", fl_setup, METH_VARARGS,
     "setup(decode, html_ns, node_from_state, svg_ns, mathml_ns, "
     "svg_tag_adj, svg_attr_adj, foreign_attr_adj)"},
    {"parse", fl_parse, METH_O,
     "parse(utf8_bytes) -> arena node list, or None to fall back"},
    {"compile_program", fl_compile_program, METH_O,
     "compile_program(ir) -> capsule (see css/lower.py for the IR)"},
    {"select_all", fl_select_all, METH_VARARGS,
     "select_all(nodes, programs, roots, include_node) -> list of nid "
     "lists per program, or None to fall back (non-CNode arena)"},
    {"collect_attr", fl_collect_attr, METH_VARARGS,
     "collect_attr(nodes, nids, name) -> [values] or None"},
    {"text", fl_text, METH_VARARGS,
     "text(nodes, nid) -> concatenated subtree text, or None to fall "
     "back (non-CNode arena)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef fl_module = {
    PyModuleDef_HEAD_INIT, "nr_fastlane",
    "C fast lane for the nipper_ray HTML parser", -1, fl_methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_nr_fastlane(void)
{
    PyObject *m;
    if (PyType_Ready(&CNodeType) < 0)
        return NULL;
    m = PyModule_Create(&fl_module);
    if (m == NULL)
        return NULL;
    Py_INCREF(&CNodeType);
    if (PyModule_AddObject(m, "CNode", (PyObject *)&CNodeType) < 0) {
        Py_DECREF(&CNodeType);
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
