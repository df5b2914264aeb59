#!/usr/bin/env python3
"""Second-implementation oracle for the flagship extraction path (x1/x2).

Independently recomputes, in pure Python, what the Scala engine computes for
the x1 span dump and x2 kind histogram over the driver testdata corpora:

  documents.parquet row --(FromTable derivation)--> interleaved Doc
    --(extraction kernel: classify, markdown/HTML-boilerplate/layout-JSON
       parse, reading order, chart structuring)--> ordered output spans

DuckDB cannot twin these queries (the kernel is algorithmic, not
relational), so this transcriber-style recompute is the cross-implementation
check — the same discipline as tools/transcribe_fixtures.py and the
reference's golden comparisons (benchmark/extraction_utils.py:138-233).

The semantics implemented here mirror the *documented contracts* of the
Scala kernel (graft.kernel.*, graft.corpus.FromTable); Java-specific string
behaviors are reproduced explicitly (java_trim, ASCII-only \\s, URLEncoder's
'+' space encoding, Double wraparound via 64-bit masking).

Output: src/test/resources/graft/corpus_expected/x_expected_<sf>.json with
  {"histogram": {kind: count}, "spans": [[doc_id, offset, kind, media_ref,
   md5(text)] ...]}   (text as md5 keeps the resource small; CrossImplSpec
hashes the Spark side identically). Run with --dump-text to debug a
mismatch with full text.
"""
import hashlib
import json
import os
import re
import sys

MASK = (1 << 64) - 1
GOLDEN = 0x9E3779B97F4A7C15

# ---------------------------------------------------------------- PRNG

def splitmix64(x0):
    x = (x0 + GOLDEN) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


class Rng:
    def __init__(self, seed):
        self.s = seed & MASK

    def next_long(self):
        self.s = (self.s + GOLDEN) & MASK
        return splitmix64(self.s)

    def next_int(self, n):
        return (self.next_long() >> 1) % n

    def pick(self, xs):
        return xs[self.next_int(len(xs))]


WORD_BANK = [
    "ledger", "invoice", "summary", "report", "quarter", "total", "revenue",
    "district", "officer", "probation", "schedule", "annex", "form", "rule",
    "section", "clause", "figure", "table", "medal", "nation", "ranking",
    "gold", "silver", "bronze", "record", "page", "document", "extract",
    "layout", "span", "batch", "stream", "column", "order", "filter"]

# ------------------------------------------------- Java string helpers

def java_trim(s):
    """String.trim: strips chars <= U+0020 only (NOT Unicode whitespace)."""
    i, j = 0, len(s)
    while i < j and s[i] <= ' ':
        i += 1
    while j > i and s[j - 1] <= ' ':
        j -= 1
    return s[i:j]


def java_url_encode(s):
    """java.net.URLEncoder.encode(s, "UTF-8"): alnum and .-*_ kept,
    space -> '+', everything else %XX uppercase UTF-8 bytes."""
    out = []
    for ch in s:
        if (ch.isalnum() and ord(ch) < 128) or ch in '.-*_':
            out.append(ch)
        elif ch == ' ':
            out.append('+')
        else:
            out.extend('%%%02X' % b for b in ch.encode('utf-8'))
    return ''.join(out)


def java_url_decode(s):
    """java.net.URLDecoder.decode: '+' -> ' ', %XX -> UTF-8 bytes; raises
    ValueError on malformed escapes (mirrors IllegalArgumentException)."""
    buf = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == '+':
            buf.append(0x20)
            i += 1
        elif c == '%':
            if i + 2 >= len(s) + 1:
                raise ValueError('incomplete escape')
            buf.append(int(s[i + 1:i + 3], 16))
            i += 3
        else:
            buf.extend(c.encode('utf-8'))
            i += 1
    return buf.decode('utf-8')


def json_escape(s):
    out = []
    for c in s:
        if c == '"':
            out.append('\\"')
        elif c == '\\':
            out.append('\\\\')
        elif c == '\n':
            out.append('\\n')
        elif c < ' ':
            out.append('\\u%04x' % ord(c))
        else:
            out.append(c)
    return ''.join(out)


# ------------------------------------------------------- corpus (FromTable)

def media_ref_for(r, chart):
    x1 = 80 + r.next_int(300)
    y1 = 80 + r.next_int(800)
    if chart:
        w = 150 + r.next_int(500)
        h = 150 + r.next_int(300)
    elif r.next_int(3) == 0:
        w = 40 + r.next_int(50)
        h = 40 + r.next_int(50)
    else:
        w = 120 + r.next_int(600)
        h = 90 + r.next_int(400)
    base = 'synth://img/%d,%d,%d,%d' % (x1, y1, x1 + w, y1 + h)
    if not chart:
        return base
    cols = 2 + r.next_int(3)
    md = ['| cat']
    for i in range(1, cols):
        md.append(' | s%d' % i)
    md.append(' |\n|---' + '|---' * (cols - 1) + '|\n')
    for _ in range(2 + r.next_int(3)):
        md.append('| ' + r.pick(WORD_BANK))
        for _ in range(1, cols):
            md.append(' | %d' % r.next_int(900))
        md.append(' |\n')
    return base + '?md=' + java_url_encode(''.join(md))


def doc_from_row(doc_id, text, lang, source, n_chars):
    r = Rng(splitmix64((doc_id * GOLDEN + 17) & MASK))
    safe = text if text is not None else ''
    words = [w for w in re.split(r'\s+', safe, flags=re.ASCII) if w]
    spans = []

    def add(kind, t, ref):
        spans.append({'kind': kind, 'text': t, 'media_ref': ref,
                      'offset': len(spans)})

    m = doc_id % 3
    if m == 0:
        md = ('# Document %d\n\n%s\n\n| lang | source | n_chars |\n'
              '|---|---|---|\n| %s | %s | %d |\n'
              % (doc_id, safe, lang, source, n_chars))
        add('text', md, '')
    elif m == 1:
        html = ('<html><body>'
                '<nav class="nav"><a href="/">home</a><a href="/l">lang</a></nav>'
                '<article><h1>Document %d</h1><p>%s</p>'
                '<ul><li>lang %s</li><li>source %s</li></ul>'
                '</article><footer>%d</footer></body></html>'
                % (doc_id, safe, lang, source, doc_id % 97))
        add('text', html, '')
    else:
        chunks = [words[i:i + 12] for i in range(0, len(words), 12)][:6]
        parts = []
        for i, ws in enumerate(chunks):
            y1 = 100 + i * 80
            cat = 'Title' if i == 0 else 'Text'
            parts.append('{"bbox": [80, %d, 1100, %d], "category": "%s", '
                         '"text": "%s"}'
                         % (y1, y1 + 60, cat, json_escape(' '.join(ws))))
        add('text', '[' + ', '.join(parts) + ']', '')
    if doc_id % 3 == 0:
        add('media', '', media_ref_for(r, doc_id % 5 == 0))
    return 'tdoc_%08d' % doc_id, spans


# ------------------------------------------------------------ data model

class El:
    __slots__ = ('x1', 'y1', 'x2', 'y2', 'category', 'text', 'media_ref')

    def __init__(self, x1, y1, x2, y2, category, text, media_ref=''):
        self.x1, self.y1, self.x2, self.y2 = x1, y1, x2, y2
        self.category, self.text, self.media_ref = category, text, media_ref

    @property
    def width(self):
        return self.x2 - self.x1

    @property
    def height(self):
        return self.y2 - self.y1

    def bbox_ref(self):
        def f(d):
            import math
            if d == round(d) and abs(d) < 1e15:
                return str(int(d))
            return repr(d)
        return 'bbox://%s,%s,%s,%s' % (f(self.x1), f(self.y1),
                                       f(self.x2), f(self.y2))


CATEGORIES = {'Caption', 'Footnote', 'Formula', 'List-item', 'Page-footer',
              'Page-header', 'Picture', 'Section-header', 'Table', 'Text',
              'Title'}

SEVERITY = {'': 0, 'SCHEMA_VIOLATION': 1, 'TRUNCATED': 2, 'EMPTY_DOC': 3,
            'BBOX_REQUIRED': 4, 'JSON_RECOVERY_FAILED': 5}


def worse(a, b):
    return b if SEVERITY.get(b, 9) > SEVERITY.get(a, 9) else a


# ----------------------------------------------------------- layout JSON

def strip_fences(s):
    t = java_trim(s)
    if t.startswith('```'):
        nl = t.find('\n')
        t = t[nl + 1:] if nl >= 0 else ''
    if t.endswith('```'):
        t = t[:-3]
    return java_trim(t)


def _validate_element(obj):
    bbox = obj.get('bbox')
    cat = obj.get('category')
    text = obj.get('text')
    if not isinstance(bbox, list):
        return None
    nums = [x for x in bbox
            if isinstance(x, (int, float)) and not isinstance(x, bool)]
    if len(nums) != len(bbox) or len(nums) != 4:
        return None
    if not isinstance(cat, str) or cat not in CATEGORIES:
        return None
    if not isinstance(text, str) and cat != 'Picture':
        return None
    t = '' if cat == 'Picture' else text
    return El(float(nums[0]), float(nums[1]), float(nums[2]), float(nums[3]),
              cat, t, '')


def layout_parse(raw):
    t = strip_fences(raw)
    if not t.startswith('['):
        i = t.find('[')
        if i < 0:
            return [], 'JSON_RECOVERY_FAILED'
        t = t[i:]
    els = []
    truncated = False
    schema_violated = False
    dec = json.JSONDecoder()
    pos = 1
    while True:
        while pos < len(t) and t[pos] in ' \t\r\n,':
            pos += 1
        if pos >= len(t):
            truncated = True
            break
        if t[pos] == ']':
            break
        try:
            obj, pos = dec.raw_decode(t, pos)
        except ValueError:
            truncated = True
            break
        if isinstance(obj, dict):
            el = _validate_element(obj)
            if el is None:
                schema_violated = True
            else:
                els.append(el)
        else:
            schema_violated = True
    code = ('TRUNCATED' if truncated
            else 'SCHEMA_VIOLATION' if schema_violated else '')
    return els, code


# ------------------------------------------------------------- tables

SEP_LINE = re.compile(r'[|\s\-]+', re.ASCII)
FINANCE = ['Revenue', 'Sales', '$', '%', 'Total', 'million', 'billion']


def parse_markdown_table(text):
    rows = []
    in_table = False
    for raw_line in text.split('\n'):
        line = java_trim(raw_line)
        if '|' in line and len(line.split('|')) >= 3:
            if not SEP_LINE.fullmatch(line):
                row = [c for c in (java_trim(x) for x in line.split('|')) if c]
                if row:
                    rows.append(row)
                    in_table = True
        elif in_table and line == '':
            break
        elif not in_table:
            if (':' in line and any(c.isdigit() for c in line)
                    and any(k in line for k in FINANCE)):
                parts = line.split(':', 1)
                if len(parts) == 2:
                    category = java_trim(parts[0])
                    values = [v for v in
                              (java_trim(x) for x in
                               re.split(r'[,;]', parts[1])) if v]
                    if values:
                        rows.append([category] + values)
    return rows if len(rows) >= 2 else None


def table_to_html(rows):
    out = ['<table>']
    if rows:
        out.append('<thead><tr>')
        out.extend('<th>%s</th>' % c for c in rows[0])
        out.append('</tr></thead>')
        if len(rows) > 1:
            out.append('<tbody>')
            for r in rows[1:]:
                out.append('<tr>' + ''.join('<td>%s</td>' % c for c in r)
                           + '</tr>')
            out.append('</tbody>')
    out.append('</table>')
    return ''.join(out)


# ------------------------------------------------------------ markdown

HEADING_RE = re.compile(r'(#{1,6})\s+(.*)', re.ASCII)
LIST_RE = re.compile(r'([-*+]|\d{1,3}[.)])\s+(.*)', re.ASCII)
IMAGE_RE = re.compile(r'!\[([^\]]*)\]\(([^)]*)\)\s*', re.ASCII)
FORMULA_RE = re.compile(r'\$\$(.*)\$\$\s*', re.ASCII)


def is_table_line(l):
    return '|' in l and len(l.split('|')) >= 3


class Layout:
    def __init__(self):
        self.y = 80.0
        self.x1 = 80.0
        self.x2 = 1200.0

    def place(self, lines, gap=12.0):
        h = max(1, lines) * 28.0
        top = self.y
        self.y += h + gap
        return top, top + h


def text_lines(t):
    return max(1, (len(t) + 79) // 80)


def markdown_extract(text):
    out = []
    layout = Layout()

    def emit(category, txt, media_ref='', lines=1):
        t, b = layout.place(lines)
        out.append(El(layout.x1, t, layout.x2, b, category, txt, media_ref))

    lines_arr = text.split('\n')
    para = []

    def flush_para():
        if para:
            t = java_trim(' '.join(para))
            if t:
                emit('Text', t, lines=text_lines(t))
            para.clear()

    i = 0
    while i < len(lines_arr):
        line = java_trim(lines_arr[i])
        m_head = HEADING_RE.fullmatch(line)
        m_form = FORMULA_RE.fullmatch(line)
        m_img = IMAGE_RE.fullmatch(line)
        m_list = LIST_RE.fullmatch(line)
        if line == '':
            flush_para()
        elif m_head:
            flush_para()
            emit('Title' if len(m_head.group(1)) == 1 else 'Section-header',
                 java_trim(m_head.group(2)))
        elif m_form:
            flush_para()
            emit('Formula', java_trim(m_form.group(1)))
        elif m_img:
            flush_para()
            emit('Picture', '', media_ref=m_img.group(2), lines=8)
        elif is_table_line(line):
            flush_para()
            block = []
            while i < len(lines_arr) and is_table_line(java_trim(lines_arr[i])):
                block.append(java_trim(lines_arr[i]))
                i += 1
            i -= 1
            rows = parse_markdown_table('\n'.join(block))
            if rows is not None:
                emit('Table', table_to_html(rows), lines=len(rows) + 1)
            else:
                t = ' '.join(block)
                emit('Text', t, lines=text_lines(t))
        elif m_list:
            flush_para()
            emit('List-item', java_trim(m_list.group(2)))
        else:
            para.append(line)
        i += 1
    flush_para()
    return out


# ------------------------------------------------ HTML + boilerplate strip

VOID_TAGS = {'img', 'br', 'hr', 'meta', 'link', 'input'}
RAW_TEXT_TAGS = {'script', 'style'}
ATTR_RE = re.compile(
    r'([A-Za-z_:][-A-Za-z0-9_:.]*)\s*=\s*("([^"]*)"|\'([^\']*)\'|([^\s"\'>]+))',
    re.ASCII)


class TagNode:
    __slots__ = ('name', 'attrs', 'children')

    def __init__(self, name, attrs):
        self.name, self.attrs, self.children = name, attrs, []


class TextN:
    __slots__ = ('text',)

    def __init__(self, text):
        self.text = text


def decode_entities(s):
    return (s.replace('&lt;', '<').replace('&gt;', '>')
            .replace('&quot;', '"').replace('&#39;', "'")
            .replace('&amp;', '&'))


def parse_tag_inner(inner):
    trimmed = java_trim(inner)
    sp = -1
    for idx, ch in enumerate(trimmed):
        if ch.isspace():
            sp = idx
            break
    if sp < 0:
        return trimmed.lower(), {}
    name = trimmed[:sp].lower()
    attrs = {}
    for m in ATTR_RE.finditer(trimmed[sp:]):
        v = next((g for g in (m.group(3), m.group(4), m.group(5))
                  if g is not None), '')
        attrs[m.group(1).lower()] = v
    return name, attrs


def parse_html(html):
    root = TagNode('#root', {})
    stack = [root]
    i = 0
    n = len(html)
    html_lower = None
    text = []

    def flush_text():
        t = ''.join(text)
        if java_trim(t):
            stack[-1].children.append(TextN(decode_entities(t)))
        text.clear()

    while i < n:
        c = html[i]
        if c == '<' and i + 1 < n:
            nxt = html[i + 1]
            if nxt in '!?':
                flush_text()
                end = html.find('>', i)
                i = n if end < 0 else end + 1
            elif nxt == '/':
                flush_text()
                end = html.find('>', i)
                name = java_trim(html[i + 2:(n if end < 0 else end)]).lower()
                if any(t.name == name for t in stack):
                    while stack[-1].name != name and len(stack) > 1:
                        stack.pop()
                    if len(stack) > 1:
                        stack.pop()
                i = n if end < 0 else end + 1
            elif nxt.isalpha() and ord(nxt) < 128:
                flush_text()
                end = html.find('>', i)
                if end < 0:
                    i = n
                else:
                    inner = html[i + 1:end]
                    self_closed = inner.endswith('/')
                    if self_closed:
                        inner = inner[:-1]
                    name, attrs = parse_tag_inner(inner)
                    tag = TagNode(name, attrs)
                    stack[-1].children.append(tag)
                    if not self_closed and name not in VOID_TAGS:
                        if name in RAW_TEXT_TAGS:
                            if html_lower is None:
                                html_lower = html.lower()
                            close = '</' + name
                            j = html_lower.find(close, end + 1)
                            stop = n if j < 0 else j
                            tag.children.append(TextN(html[end + 1:stop]))
                            gt = html.find('>', stop)
                            i = n if gt < 0 else gt + 1
                        else:
                            stack.append(tag)
                            i = end + 1
                    else:
                        i = end + 1
            else:
                text.append(c)
                i += 1
        else:
            text.append(c)
            i += 1
    flush_text()
    return root


CHROME_TAGS = {'nav', 'aside', 'script', 'style', 'form', 'iframe'}
CHROME_CLASS_RE = re.compile(
    r'\b(nav|menu|sidebar|banner|advert|ads?|cookie|footer-links|share|'
    r'social|promo|related)\b', re.IGNORECASE | re.ASCII)
GENERIC_CONTAINERS = {'div', 'section', 'span'}
WS_RUN = re.compile(r'\s+', re.ASCII)


def node_stats(node, memo):
    """(text_len, link_text_len, tag_count)"""
    key = id(node)
    hit = memo.get(key)
    if hit is not None:
        return hit
    if isinstance(node, TextN):
        out = (len(java_trim(node.text)), 0, 0)
    else:
        tl, ll, tc = 0, 0, 1
        for ch in node.children:
            s = node_stats(ch, memo)
            tl += s[0]
            ll += s[1]
            tc += s[2]
        if node.name == 'a':
            ll = tl
        out = (tl, ll, tc)
    memo[key] = out
    return out


def is_boilerplate(tag, memo):
    if tag.name in ('main', 'article'):
        return False
    if tag.name in CHROME_TAGS:
        return True
    cls = tag.attrs.get('class', '') + ' ' + tag.attrs.get('id', '')
    if CHROME_CLASS_RE.search(cls):
        return True
    tl, ll, tc = node_stats(tag, memo)
    density = tl / max(1, tc)
    link_density = 1.0 if tl == 0 else ll / tl
    return ((link_density > 0.5 and tl < 200)
            or (tag.name in GENERIC_CONTAINERS
                and tl < 25 and density < 10 and tl > 0))


def inner_text(node):
    if isinstance(node, TextN):
        return node.text
    if node.name in RAW_TEXT_TAGS:
        return ''
    return java_trim(WS_RUN.sub(' ', ' '.join(inner_text(ch)
                                              for ch in node.children)))


def table_rows(table):
    rows = []

    def find_rows(node):
        if isinstance(node, TextN):
            return
        if node.name == 'tr':
            cells = [inner_text(c) for c in node.children
                     if isinstance(c, TagNode) and c.name in ('td', 'th')]
            if cells:
                rows.append(cells)
        else:
            for ch in node.children:
                find_rows(ch)

    for ch in table.children:
        find_rows(ch)
    return rows


HEADING_TAG_RE = re.compile(r'h([1-6])', re.ASCII)


def boilerplate_extract(html):
    root = parse_html(html)
    memo = {}
    out = []
    layout = Layout()

    def emit(category, text, media_ref='', lines=-1):
        t, b = layout.place(lines if lines > 0 else text_lines(text))
        out.append(El(layout.x1, t, layout.x2, b, category, text, media_ref))

    def walk(node):
        if isinstance(node, TextN):
            s = java_trim(WS_RUN.sub(' ', node.text))
            if s:
                emit('Text', s)
            return
        name = node.name
        if is_boilerplate(node, memo) and name not in ('header', 'footer'):
            return
        m_head = HEADING_TAG_RE.fullmatch(name)
        if name == 'header':
            txt = inner_text(node)
            if txt:
                emit('Page-header', txt, lines=1)
        elif name == 'footer':
            txt = inner_text(node)
            if txt:
                emit('Page-footer', txt, lines=1)
        elif m_head:
            txt = inner_text(node)
            if txt:
                emit('Title' if m_head.group(1) == '1' else 'Section-header',
                     txt, lines=1)
        elif name == 'p':
            txt = inner_text(node)
            if txt:
                emit('Text', txt)
        elif name == 'li':
            txt = inner_text(node)
            if txt:
                emit('List-item', txt, lines=1)
        elif name in ('figcaption', 'caption'):
            txt = inner_text(node)
            if txt:
                emit('Caption', txt, lines=1)
        elif name == 'img':
            src = node.attrs.get('src', '')
            try:
                h = float(node.attrs.get('height'))
            except (TypeError, ValueError):
                h = 300.0
            emit('Picture', '', media_ref=src, lines=max(1, int(h / 28.0)))
        elif name == 'table':
            rows = table_rows(node)
            if rows:
                emit('Table', table_to_html(rows), lines=len(rows) + 1)
        elif name in ('pre', 'code') and 'math' in node.attrs.get('class', ''):
            txt = inner_text(node)
            if txt:
                emit('Formula', txt, lines=1)
        else:
            for ch in node.children:
                walk(ch)

    for ch in root.children:
        walk(ch)
    return out


# --------------------------------------------------------- reading order

MIN_V_GAP = 16.0


def h_gaps(els):
    iv = sorted(((e.y1, e.y2) for e, _ in els), key=lambda p: p[0])
    cover_end = iv[0][1]
    for s, e in iv[1:]:
        if s > cover_end:
            return (s - cover_end, (cover_end + s) / 2.0)
        if e > cover_end:
            cover_end = e
    return None


def v_gaps(els):
    iv = sorted(((e.x1, e.x2) for e, _ in els), key=lambda p: p[0])
    cover_end = iv[0][1]
    best = None
    for s, e in iv[1:]:
        if s > cover_end:
            w = s - cover_end
            if w >= MIN_V_GAP and (best is None or w > best[0]):
                best = (w, (cover_end + s) / 2.0)
        if e > cover_end:
            cover_end = e
    return best


def xy_cut(els, allow_v):
    if len(els) <= 1:
        return els
    h = h_gaps(els)
    block_width = max(e.x2 for e, _ in els) - min(e.x1 for e, _ in els)
    block_yspan = max(e.y1 for e, _ in els) - min(e.y1 for e, _ in els)
    v = None
    if allow_v:
        vg = v_gaps(els)
        if vg is not None:
            w, split_x = vg
            left = [ie for ie in els if ie[0].x2 <= split_x]
            right = [ie for ie in els if not ie[0].x2 <= split_x]

            def yspan(s):
                return max(x.y1 for x, _ in s) - min(x.y1 for x, _ in s)

            if (len(left) >= 2 and len(right) >= 2
                    and w >= 0.08 * block_width
                    and yspan(left) >= 0.5 * block_yspan
                    and yspan(right) >= 0.5 * block_yspan):
                v = (w, split_x)
    if h is not None and v is not None and v[0] > h[0]:
        split_x = v[1]
        left = [ie for ie in els if ie[0].x2 <= split_x]
        right = [ie for ie in els if not ie[0].x2 <= split_x]
        return xy_cut(left, False) + xy_cut(right, False)
    if h is not None:
        split_y = h[1]
        top = [ie for ie in els if ie[0].y2 <= split_y]
        bottom = [ie for ie in els if not ie[0].y2 <= split_y]
        return xy_cut(top, True) + xy_cut(bottom, True)
    if v is not None:
        split_x = v[1]
        left = [ie for ie in els if ie[0].x2 <= split_x]
        right = [ie for ie in els if not ie[0].x2 <= split_x]
        return xy_cut(left, False) + xy_cut(right, False)
    return baseline_lines(els)


def baseline_lines(els):
    srt = sorted(els, key=lambda ie: (ie[0].y1, ie[0].x1, ie[1]))
    built = []
    for ie in srt:
        e = ie[0]
        target = None
        for ln in reversed(built):
            line_min_x = min(x.x1 for x, _ in ln)
            line_min_y = min(x.y1 for x, _ in ln)
            veto = (e.x1 < line_min_x
                    and (e.y1 - line_min_y) > 0.5 * e.height)
            if veto:
                continue
            hit = False
            for o, _ in ln:
                ov = min(e.y2, o.y2) - max(e.y1, o.y1)
                if ov > 0 and ov >= 0.65 * max(e.height, o.height):
                    hit = True
                    break
            if hit:
                target = ln
                break
        if target is not None:
            target.append(ie)
        else:
            built.append([ie])
    built.sort(key=lambda ln: min((x.y1, x.x1) for x, _ in ln))
    out = []
    for ln in built:
        out.extend(sorted(ln, key=lambda ie: (ie[0].x1, ie[0].y1, ie[1])))
    return out


def reading_order(elements):
    if len(elements) <= 1:
        return list(elements)
    idx = list(zip(elements, range(len(elements))))
    return [e for e, _ in xy_cut(idx, True)]


# -------------------------------------------------------------- charts

def is_likely_chart(e):
    return (e.category == 'Picture' and e.width >= 100 and e.height >= 100
            and e.height > 0
            and max(e.width / e.height, e.height / e.width) <= 5.0)


def chart_payload(media_ref):
    i = media_ref.find('?md=')
    if i < 0:
        return None
    try:
        return java_url_decode(media_ref[i + 4:])
    except ValueError:
        return None


def charts_process(ordered):
    out = []
    for e in ordered:
        out.append(e)
        if is_likely_chart(e):
            payload = chart_payload(e.media_ref)
            rows = parse_markdown_table(payload) if payload is not None else None
            if rows is not None:
                out.append(El(e.x1, e.y2 + 10, e.x2, e.y2 + 50,
                              'Table', table_to_html(rows), ''))
    return out


# ------------------------------------------------------------- extraction

TAG_SNIFF_RE = re.compile(r'<[a-zA-Z][^>]*>', re.ASCII)
SYNTH_IMG_RE = re.compile(
    r'synth://img/(-?[\d.]+),(-?[\d.]+),(-?[\d.]+),(-?[\d.]+)(\?.*)?',
    re.ASCII)


def classify(text):
    t = strip_fences(text)
    arr = t.find('[')
    if arr >= 0 and (t.find('"bbox"', arr) > arr
                     or t.find('"category"', arr) > arr):
        return 'layout-json'
    if TAG_SNIFF_RE.search(t):
        return 'html'
    return 'markdown'


def media_element(m):
    def num(v):
        try:
            return float(v)
        except ValueError:
            return None

    mm = SYNTH_IMG_RE.fullmatch(m['media_ref'])
    if mm:
        vals = [num(mm.group(i)) for i in (1, 2, 3, 4)]
        if all(v is not None for v in vals):
            return El(vals[0], vals[1], vals[2], vals[3], 'Picture', '',
                      m['media_ref'])
    y = 80.0 + 40.0 * m['offset']
    return El(80.0, y, 480.0, y + 300.0, 'Picture', '', m['media_ref'])


def paginate(spans):
    pages = []
    current = None
    media = []
    is_open = False
    for s in spans:
        if s['kind'] == 'media':
            media.append(s)
            is_open = True
        else:
            if is_open:
                pages.append((current, media))
                media = []
            current = s
            is_open = True
    if is_open:
        pages.append((current, media))
    return pages


def extract_page(page):
    source, media = page
    code = ''
    els = []
    if source is not None:
        kind = classify(source['text'])
        if kind == 'layout-json':
            parsed, pc = layout_parse(source['text'])
            code = worse(code, pc)
            els.extend(parsed)
        elif kind == 'html':
            els.extend(boilerplate_extract(source['text']))
        else:
            els.extend(markdown_extract(source['text']))
    for m in media:
        els.append(media_element(m))
    ordered = reading_order(els)
    return charts_process(ordered), code


def extract_doc(doc_id, spans):
    if not spans:
        return doc_id, [], False, 'EMPTY_DOC'
    pages = paginate(sorted(spans, key=lambda s: s['offset']))
    failure = ''
    all_els = []
    for page in pages:
        els, code = extract_page(page)
        failure = worse(failure, code)
        all_els.extend(els)
    out = []
    for i, e in enumerate(all_els):
        if e.category == 'Picture':
            ref = e.media_ref if e.media_ref else e.bbox_ref()
        else:
            ref = ''
        out.append({'kind': e.category, 'text': e.text, 'media_ref': ref,
                    'offset': i})
    fatal = failure not in ('', 'TRUNCATED', 'SCHEMA_VIOLATION')
    return doc_id, out, not fatal, failure


# ------------------------------------------------------------------ main

def main():
    import duckdb
    dump_text = '--dump-text' in sys.argv
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        'src/test/resources/graft/corpus_expected')
    os.makedirs(out_dir, exist_ok=True)
    for sf in ('sf0.001', 'sf0.01', 'sf0.1'):
        path = '/root/testdata/%s/documents.parquet' % sf
        rows = duckdb.connect().execute(
            "SELECT doc_id, text, lang, source, n_chars FROM '%s' "
            "ORDER BY doc_id" % path).fetchall()
        hist = {}
        span_rows = []
        for doc_id, text, lang, source, n_chars in rows:
            tid, spans = doc_from_row(doc_id, text, lang, source, n_chars)
            _, out, success, failure = extract_doc(tid, spans)
            assert success and failure == '', (tid, failure)
            for s in out:
                hist[s['kind']] = hist.get(s['kind'], 0) + 1
                body = (s['text'] if dump_text
                        else hashlib.md5(s['text'].encode('utf-8')).hexdigest())
                span_rows.append([tid, s['offset'], s['kind'],
                                  s['media_ref'], body])
        tag = sf.replace('.', '')
        name = 'x_expected_%s%s.json' % (tag, '_text' if dump_text else '')
        with open(os.path.join(out_dir, name), 'w') as f:
            json.dump({'sf': sf, 'histogram': hist, 'spans': span_rows},
                      f, ensure_ascii=False, indent=0)
        print(sf, 'docs:', len(rows), 'spans:', len(span_rows),
              'hist:', dict(sorted(hist.items())))


if __name__ == '__main__':
    main()
