"""HTML main-content extraction (boilerplate strip) via DOM heuristics.

No reference analog exists (the reference is PDF-only); required by the
north rule for text/html rows.  The approach is the public
Readability/Boilerpipe family of heuristics, implemented with only the
stdlib ``html.parser`` so it runs inside executor UDFs with zero extra
dependencies, fully deterministic:

1. drop subtrees of non-content tags (script/style/nav/header/footer/aside/
   form/noscript/template/svg/head/iframe/button/select)
2. split text into blocks at block-level tags
3. score each block: keep it when its link density (chars inside <a> /
   total chars) is low, or when it is long enough that prose is likely
4. normalize whitespace inside blocks; join kept blocks with '\\n'
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_DROP_SUBTREE = frozenset(
    "script style noscript template svg head nav header footer aside form "
    "iframe button select option".split()
)
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th article section main "
    "blockquote pre figure figcaption dl dt dd br hr body".split()
)
# void elements never get close tags; do not count them as "open"
_VOID = frozenset("br hr img meta link input area base col embed source wbr".split())

_WS = re.compile(r"\s+")

MIN_BLOCK_CHARS = 25  # short fragments are kept only if link-free
MAX_LINK_DENSITY = 0.33


class _Block:
    __slots__ = ("chars", "link_chars", "is_heading")

    def __init__(self, is_heading=False):
        self.chars: list[str] = []
        self.link_chars = 0
        self.is_heading = is_heading


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: list[_Block] = [_Block()]
        self._heading_depth = 0

    # -- tag handling ----------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREE:
            if tag not in _VOID:
                self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth += 1
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._heading_depth += 1
        if tag in _BLOCK_TAGS:
            self._new_block()

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREE:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a" and self.link_depth:
            self.link_depth -= 1
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6") and self._heading_depth:
            self._heading_depth -= 1
        if tag in _BLOCK_TAGS:
            self._new_block()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._new_block()

    def handle_data(self, data):
        if self.drop_depth:
            return
        b = self.blocks[-1]
        b.chars.append(data)
        if self.link_depth:
            b.link_chars += len(data.strip())
        if self._heading_depth:
            b.is_heading = True

    def _new_block(self):
        if self.blocks[-1].chars:
            self.blocks.append(_Block(is_heading=self._heading_depth > 0))

    # -- scoring ----------------------------------------------------------

    def result(self) -> str:
        kept: list[str] = []
        for b in self.blocks:
            text = _WS.sub(" ", "".join(b.chars)).strip()
            if not text:
                continue
            n = len(text)
            density = b.link_chars / n if n else 1.0
            if b.is_heading and density <= MAX_LINK_DENSITY:
                kept.append(text)
            elif n >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY:
                kept.append(text)
            elif density == 0.0 and n >= 3:
                kept.append(text)
        return "\n".join(kept)


_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)

_CHARSET_ALIASES = {
    "iso-8859-1": "latin-1", "iso8859-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "win-1252": "cp1252",
    "utf8": "utf-8", "utf-8": "utf-8", "ascii": "ascii",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "euc-jp": "euc_jp", "gb2312": "gb2312", "gbk": "gbk",
    "big5": "big5", "koi8-r": "koi8_r",
    "windows-1251": "cp1251", "iso-8859-2": "iso8859_2",
    "iso-8859-15": "iso8859_15", "utf-16": "utf-16",
}


def decode_payload(payload: bytes) -> str:
    """Deterministic charset handling: BOM, then declared charset (meta /
    http-equiv sniffed from the head), then utf-8 with replacement."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload[3:].decode("utf-8", "replace")
    if payload.startswith((b"\xff\xfe", b"\xfe\xff")):
        return payload.decode("utf-16", "replace")
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        codec = _CHARSET_ALIASES.get(name, name)
        try:
            return payload.decode(codec, "replace")
        except LookupError:
            pass
    return payload.decode("utf-8", "replace")


def extract_main_text(payload: bytes | str) -> str:
    """Extract main content text from an HTML payload.  Never raises on
    malformed markup (html.parser is fully tolerant)."""
    if isinstance(payload, (bytes, bytearray, memoryview)):
        html = decode_payload(bytes(payload))
    else:
        html = payload
    # an unterminated trailing comment makes html.parser flush the raw
    # '<!-- ...' tail as text data on close(); markup must never leak into
    # extracted prose, so truncate at the orphan comment opener instead
    i = html.rfind("<!--")
    if i != -1 and html.find("-->", i) == -1:
        html = html[:i]
    p = _Extractor()
    p.feed(html)
    p.close()
    return p.result()
