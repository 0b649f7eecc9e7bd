"""Font / encoding / Unicode resolution.

Re-implements the reference's fontcache.py (FontCache, Type0FontCache,
CIDWidthArrayToMap, DifferencesArrayToMap) and the CMap compiler
(parser/__init__.py:943-1046) against the plain-dict object model of cos.py.

Quirk parity (SURVEY.md §2.6, §4.1):
- dispatch order: Type0 -> Type1(AFM) -> string-encoding -> encoding-dict;
  any other shape is an error -> page drop (fontcache.py:62-79)
- WinAnsi footnote-3 rule: unmapped cid > 0o40 remaps to bullet (0o225),
  and the *remapped* cid indexes the widths array (fontcache.py:144-174)
- width bounds check uses ``>`` not ``>=`` (fontcache.py:158)
- Identity-V is effectively unsupported (reference bug ``self.f``,
  fontcache.py:406,435) -> error -> fallback event
- bfrange array form raises (parser/__init__.py:997)
- missing-glyph resolution: ToUnicode CMap, then hardcoded AdvP4C4E74 /
  AdvPSSym tables; the CFF FontFile3 path is recorded as a fallback
  (fontcache.py:231-368; CFF digging is out of scope for text parity --
  no fixture reaches it)
"""

from __future__ import annotations

from . import afm
from .cos import PdfError, Ref, Scanner, StreamObj
from .encodings import encoding_map, glyph_to_unicode


class FontError(PdfError):
    pass


# MathematicalPi-One: encoding code -> unicode (fontcache.py:282-366; the
# reference's hardcoded Greek/math table, public glyph-repertoire facts)
_MATHPI = {
    "A": "Α", "B": "Β", "C": "Ψ", "D": "Δ",
    "E": "Ε", "F": "Φ", "G": "Γ", "H": "Η",
    "I": "Ι", "J": "Ξ", "K": "Κ", "L": "Λ",
    "M": "Μ", "N": "Ν", "O": "Ο", "P": "Π",
    "Q": "ϴ", "R": "Ρ", "S": "Σ", "T": "Τ",
    "U": "Θ", "V": "Ω", "W": "ϐ", "X": "Χ",
    "Y": "Υ", "Z": "Ζ",
    "a": "α", "b": "β", "c": "ψ", "d": "δ",
    "e": "ε", "f": "φ", "g": "γ", "h": "η",
    "i": "ι", "j": "ξ", "k": "κ", "l": "λ",
    "m": "μ", "n": "ν", "o": "ο", "p": "π",
    "q": "ϑ", "r": "ρ", "s": "σ", "t": "τ",
    "u": "θ", "v": "ω", "w": "ϕ", "x": "χ",
    "y": "υ", "z": "ζ",
    "0": "″", "1": "(", "2": "−", "3": "×",
    "4": "÷", "5": "=", "6": "±", "7": "∓",
    "8": "°", "9": "′",
    "!": "≪", "@": "≫", "#": "≤", "$": "≥",
    "%": "≦", "^": "≧", "&": "≲", "*": "≳",
    "{": "-", "}": "—", "[": "∅", "]": "–",
    ":": "ℵ", ";": "∀", "?": "∙", "-": "‴",
    "+": "≶", "=": "∇",
}


class Glyph:
    __slots__ = ("cid", "width", "unicode")

    def __init__(self, cid: int, width: float, uni: str):
        self.cid = cid
        self.width = width
        self.unicode = uni


# -----------------------------------------------------------------------------
# CMap compiler (reference: CMapTokenizer.BuildMapper)


def compile_cmap(data: bytes):
    """Compile a ToUnicode/CID CMap program into mapper(cid)->str.

    Token model mirrors the reference's cmap lexer (parser/cmap.py): hex
    CODEs, INTs, begin/end bfchar/bfrange/cidrange keywords; everything else
    is PostScript scaffolding and ignored.
    """
    # cmap mode: the reference cmap lexer's own classes (parser/cmap.py —
    # PostScript scaffolding words are literal tokens, unknown runs are
    # lexer errors, '('/')' are bare tokens with no content rule)
    sc = Scanner(data, cmap=True)
    toks: list[tuple[str, object]] = []
    while True:
        kind, val = sc.next_token()
        if kind == "eof":
            break
        if kind == "hex":
            toks.append(("code", int(val.hexdigits, 16)))
        elif kind == "int":
            toks.append(("int", val))
        elif kind == "kw":
            toks.append(("kw", val))
        elif kind == "arr<":
            toks.append(("arr<", None))
        elif kind == "arr>":
            toks.append(("arr>", None))
        elif kind == "cmt":
            # the reference cmap lexer RETURNS comment tokens
            # (cmap.py:117-122): outside sections BuildMapper ignores
            # them, but inside bfchar/bfrange/cidrange they hit the
            # 'Unrecognized token' raise (probed r05) — keep them so the
            # _section allowed-kinds check sees them
            toks.append(("cmt", val))
        # names, floats, dict delims, literals: scaffolding -- skip

    mapdat: dict[int, str] = {}
    rangedat: dict[tuple[int, int], int] = {}

    def _section(begin: str, end: str, allowed: tuple):
        """Tokens of the FIRST begin..end section (reference parity,
        parser/__init__.py:952-1024: each loop breaks on its first end
        marker, so later same-kind sections are silently ignored —
        pinned by f44).  Inside an open section any token kind outside
        ``allowed`` raises (reference: NotImplementedError 'Unrecognized
        token' at :969/:998/:1023 — an UNTERMINATED section therefore
        raises on the next keyword, e.g. endcmap; pinned by f45).  A
        section still open when tokens run out maps nothing (the
        reference builds its map only in the end-marker branch)."""
        items: list[tuple[str, object]] = []
        on = False
        for kind, val in toks:
            if (kind, val) == ("kw", begin):
                on = True
                continue
            if on and (kind, val) == ("kw", end):
                return items
            if on:
                if kind == "arr<" and begin == "beginbfrange":
                    # reference: :996-997 explicit array-form raise (f39)
                    raise FontError("bfrange array form not supported")
                if kind not in allowed:
                    raise FontError(
                        "unrecognized %s token in %s section" % (kind, begin)
                    )
                items.append((kind, val))
        return []

    # bfchar: code pairs; an odd code count IndexErrors in the reference
    # (:961-963 codes[i+1]) -> page drop (pinned by f46)
    codes = [v for _k, v in _section("beginbfchar", "endbfchar", ("code",))]
    if len(codes) % 2:
        raise FontError("dangling bfchar code")
    for i in range(0, len(codes), 2):
        mapdat[codes[i]] = chr(codes[i + 1])

    # bfrange: code triples; partial triples IndexError in the reference
    # (:983-989)
    codes = [v for _k, v in _section("beginbfrange", "endbfrange", ("code",))]
    if len(codes) % 3:
        raise FontError("dangling bfrange code")
    for i in range(0, len(codes), 3):
        s, e, off = codes[i], codes[i + 1], codes[i + 2]
        for k in range(s, e + 1):
            mapdat[k] = chr(off + (k - s))

    # cidrange: CODE CODE INT triples via the reference's pop-two-on-INT
    # stack (:1013-1020); an INT with <2 stacked entries IndexErrors there,
    # and a leftover non-triple TypeErrors at :1010 (r[0] on an int)
    items = _section("begincidrange", "endcidrange", ("code", "int"))
    stack: list = []
    for kind, val in items:
        if kind == "code":
            stack.append(val)
        else:  # int
            if len(stack) < 2:
                raise FontError("cidrange value without a code pair")
            e = stack.pop()
            s = stack.pop()
            stack.append((s, e, val))
    for r in stack:
        if not isinstance(r, tuple):
            raise FontError("dangling cidrange code")
        rangedat[(r[0], r[1])] = r[2]

    def mapper(c):
        cc = c if isinstance(c, int) else ord(c)
        if cc in mapdat:
            return mapdat[cc]
        for (s, e), unistart in rangedat.items():
            if s <= cc <= e:
                return chr(unistart + (cc - s))
        raise KeyError(cc)

    return mapper


def identity_mapper(cid):
    """Identity-H semantics: CID == code == unicode ordinal, exactly what
    the reference gets from compiling the embedded Adobe Identity-H CMap
    (cmap_identity_h.py: cidranges covering 0000-FFFF with offset == start)."""
    cc = cid if isinstance(cid, int) else ord(cid)
    if not 0 <= cc <= 0xFFFF:
        raise KeyError(cid)
    return chr(cc)


# -----------------------------------------------------------------------------
# width helpers (reference: fontcache.py:454-514)


_FONT_SUBTYPES = ("Type0", "Type1", "Type3", "TrueType",
                  "CIDFontType0", "CIDFontType2")


def validate_font_dict(fd) -> None:
    """Reference _ParseFont parity (parser/__init__.py:666-689, diff_fuzz
    r04): EVERY font object load reads o['Type'] and o['Subtype'] (a
    missing key KeyErrors -> page drop) and rejects subtypes outside the
    six-entry dispatch ('Unrecognized object type ... neither Type1,
    Type3, or TrueType')."""
    if not isinstance(fd, dict):
        raise FontError("font object is not a dictionary")
    if "Type" not in fd:
        raise FontError("font missing /Type")
    if "Subtype" not in fd:
        raise FontError("font missing /Subtype")
    if fd["Subtype"] not in _FONT_SUBTYPES:
        raise FontError(
            "unrecognized font subtype %r" % (fd["Subtype"],))


def cid_width_array_to_map(arr: list) -> dict[int, float]:
    """Both /W forms: ``start [w...]`` and ``lo hi w``.

    Float parity (probed r04, fontcache.py:455-492 CIDWidthArrayToMap):
    the reference accepts floats in either form but never coerces — a
    float base code produces FLOAT map keys (so integer cid lookups miss
    -> draw-time page drop, f103), and a float range bound hits range()
    and TypeErrors at font-cache build (also a page drop, f104).  Do NOT
    int() these values."""
    out: dict[int, float] = {}
    i = 0
    n = len(arr)
    while i < n:
        a = arr[i]
        if isinstance(a, (int, float)) and i + 1 < n and isinstance(arr[i + 1], list):
            base = a
            for v in arr[i + 1]:
                out[base] = v
                base += 1
            i += 2
        elif (
            isinstance(a, (int, float))
            and i + 2 < n
            and isinstance(arr[i + 1], (int, float))
            and isinstance(arr[i + 2], (int, float))
        ):
            for k in range(a, arr[i + 1] + 1):
                out[k] = arr[i + 2]
            i += 3
        else:
            raise FontError("unrecognized entry in CID width array: %r" % (a,))
    return out


def differences_array_to_map(arr: list) -> dict[int, str]:
    """/Differences: int sets the next code; EVERYTHING else (names —
    and, reference parity, even stray floats: the type check is
    ``type(item) == int``, fontcache.py:496-514, pinned by f72) is
    assigned as a glyph name at the auto-incremented code."""
    out: dict[int, str] = {}
    code = 0
    # reference parity (diff_fuzz r04): a MISSING /Differences reaches
    # DifferencesArrayToMap as None and dies iterating it
    # (fontcache.py:505 TypeError) -> page drop; do NOT default to empty
    for item in arr:
        if isinstance(item, int):
            code = item
        else:
            out[code] = item
            code += 1
    return out


# -----------------------------------------------------------------------------
# the resolver


_TYPE1_GLYPH_MEMO: dict[tuple, Glyph] = {}


class FontResolver:
    """Per-document glyph resolution with parse-once caches, mirroring the
    reference's FontCache (glyph map, diff map, Type0 cache, CMapper memo)."""

    def __init__(self, doc):
        self.doc = doc
        # nested cache: id(font) -> {cid -> Glyph}; the interpreter fetches
        # the inner dict once per show-text op so the per-glyph hit is one
        # plain dict.get with no tuple allocation
        self._glyphs: dict[int, dict[int, Glyph]] = {}
        self._diff_maps: dict[int, dict[int, str]] = {}
        self._cmappers: dict[int, object] = {}
        self._type0: dict[int, dict] = {}
        self.fallbacks = 0  # fallback-rate metric events

    def glyph_cache(self, font: dict) -> dict:
        fid = id(font)
        d = self._glyphs.get(fid)
        if d is None:
            d = self._glyphs[fid] = {}
        return d

    def get_glyph(self, font: dict, cid: int) -> Glyph:
        cache = self.glyph_cache(font)
        g = cache.get(cid)
        if g is not None:
            return g
        validate_font_dict(font)
        subtype = font.get("Subtype")
        if subtype == "Type0":
            g = self._glyph_type0(font, cid)
        elif subtype == "Type1":
            g = self._glyph_type1(font, cid)
        else:
            raw_enc = font.get("Encoding")
            enc = self.doc.resolve(raw_enc)
            if isinstance(enc, str):
                g = self._glyph_enc_str(font, cid)
            elif isinstance(enc, dict) and isinstance(raw_enc, Ref):
                # dict-Encoding path requires an INDIRECT value: only
                # indirect /Encoding routes through GetFontEncoding and
                # becomes a FontEncoding (parser/__init__.py:847-854); an
                # INLINE dict stays a raw Dictionary and the dispatch
                # TypeErrors -> page drop (pinned by f71)
                g = self._glyph_enc_dict(font, cid)
            else:
                raise FontError(
                    "unrecognized font encoding type %r for cid %d" % (enc, cid)
                )
        cache[cid] = g
        return g

    # --- Type1 standard-font path (fontcache.py:102-135) -------------------

    def _glyph_type1(self, font: dict, cid: int) -> Glyph:
        # pure function of (BaseFont, encoding name, cid) over static AFM +
        # encoding-map data, so memoized ACROSS documents (Glyph instances
        # are immutable-by-convention); the per-document cache in get_glyph
        # still short-circuits repeats within a document
        enc = self.doc.resolve(font.get("Encoding"))
        if enc is None:
            encname = "Std"
        elif isinstance(enc, str):
            encname = enc
        else:
            # quirk parity (fontcache.py:115-117): the reference passes the
            # FontEncoding OBJECT of a Type1 font straight into
            # MapCIDToGlyphName, which KeyErrors on any non-name -> page
            # drop.  A dict /Encoding on a standard Type1 font is therefore
            # never honored (fixture f30_type1_dict_encoding).
            raise FontError(
                "Type1 font with non-name /Encoding %r (reference drops "
                "the page here)" % (enc,)
            )
        basefont = font.get("BaseFont") or ""
        key = (basefont, encname, cid)
        g = _TYPE1_GLYPH_MEMO.get(key)
        if g is not None:
            return g
        fm = afm.get_font_metrics(basefont)
        encmap = encoding_map(encname)
        if cid not in encmap:
            raise FontError(
                "cid %d not in encoding map for %r" % (cid, enc)
            )
        gname = encmap[cid]
        u = glyph_to_unicode(gname)
        if u is None:
            raise FontError("no unicode for glyph %r" % gname)
        rec = fm.get(gname)
        if rec is None:
            raise FontError("glyph %r not in AFM for %r" % (gname, basefont))
        g = Glyph(cid, rec[1], u)
        _TYPE1_GLYPH_MEMO[key] = g
        return g

    # --- named-encoding path (fontcache.py:137-174) -------------------------

    def _glyph_enc_str(self, font: dict, cid: int) -> Glyph:
        enc = self.doc.resolve(font.get("Encoding"))
        encmap = encoding_map(enc)
        if cid not in encmap and enc == "WinAnsiEncoding" and cid > 0o40:
            cid = 0o225  # bullet remap, Appendix D footnote 3
        if cid not in encmap:
            raise FontError("cid %d not in encoding map %s" % (cid, enc))
        widths = self.doc.resolve(font.get("Widths"))
        first = self.doc.resolve(font.get("FirstChar"))
        if widths is None or first is None:
            raise FontError("font with named encoding lacks /Widths")
        if cid - first > len(widths):  # NB: '>' as in the reference
            raise FontError(
                "cid %d beyond widths array (first=%d len=%d)"
                % (cid, first, len(widths))
            )
        gname = encmap[cid]
        u = glyph_to_unicode(gname)
        if u is None:
            raise FontError("no unicode for glyph %r" % gname)
        return Glyph(cid, widths[cid - first], u)

    # --- encoding-dictionary path (fontcache.py:176-229) --------------------

    def _glyph_enc_dict(self, font: dict, cid: int) -> Glyph:
        enc_ref = font.get("Encoding")
        enc = self.doc.resolve(enc_ref)
        base = enc.get("BaseEncoding") or "StandardEncoding"
        encmap = encoding_map(base)
        dkey = id(enc)
        diffs = self._diff_maps.get(dkey)
        if diffs is None:
            diffs = differences_array_to_map(self.doc.resolve(enc.get("Differences")))
            self._diff_maps[dkey] = diffs
        # Reference parity (probed r04, fontcache.py:204-205): on the
        # encoding-dict path the ToUnicode CMapper is built EAGERLY —
        # before any glyph resolution — so a malformed ToUnicode stream
        # kills the page even when every glyph name resolves without it
        # (f112).  Named-encoding fonts never touch ToUnicode at all.
        tounicode = self.doc.resolve(font.get("ToUnicode"))
        if isinstance(tounicode, StreamObj) and \
                id(tounicode) not in self._cmappers:
            self._cmappers[id(tounicode)] = compile_cmap(tounicode.data)
        if cid in diffs:
            gname = diffs[cid]
        elif cid in encmap:
            gname = encmap[cid]
        else:
            raise FontError(
                "cid %d in neither differences nor base %s" % (cid, base)
            )
        u = glyph_to_unicode(gname)
        if u is None:
            u = self._missing_glyph(font, cid, gname)
        widths = self.doc.resolve(font.get("Widths"))
        first = self.doc.resolve(font.get("FirstChar"))
        if widths is None or first is None:
            raise FontError("font with encoding dict lacks /Widths")
        return Glyph(cid, widths[cid - first], u)

    def _missing_glyph(self, font: dict, cid: int, gname: str) -> str:
        """fontcache.py:231-368 MissingGlyphName."""
        tounicode = self.doc.resolve(font.get("ToUnicode"))
        if isinstance(tounicode, StreamObj):
            mapper = self._cmappers.get(id(tounicode))
            if mapper is None:
                mapper = compile_cmap(tounicode.data)
                self._cmappers[id(tounicode)] = mapper
            try:
                return mapper(cid)
            except KeyError:
                pass
        basefont = font.get("BaseFont") or ""
        if basefont.endswith("AdvP4C4E74"):
            t = {"C0": "−", "C6": "±", "C14": "°",
                 "C15": "•", "C211": "©"}
            if gname in t:
                return t[gname]
        if basefont.endswith("AdvPSSym") and gname == "C211":
            return "©"
        # last resort: dig the embedded CFF (FontFile3) for the glyph name
        # and map its encoding code through the MathematicalPi-One table
        # (fontcache.py:268-366)
        u = self._cff_lookup(font, gname, basefont)
        if u is not None:
            return u
        self.fallbacks += 1
        raise FontError("unable to find unicode for cid %d (%r)" % (cid, gname))

    def _cff_lookup(self, font: dict, gname: str, basefont: str):
        from .cff import parse_cff

        fd = self.doc.resolve(font.get("FontDescriptor"))
        if not isinstance(fd, dict):
            return None
        ff3 = self.doc.resolve(fd.get("FontFile3"))
        if not isinstance(ff3, StreamObj):
            return None
        key = id(ff3)
        parsed = self._cmappers.get(("cff", key))
        if parsed is None:
            parsed = parse_cff(ff3.data)
            self._cmappers[("cff", key)] = parsed
        gmatch = None
        for g in parsed["glyphs"]:
            if g["cname"] == gname:
                gmatch = g
                break
        if gmatch and basefont.endswith("MathematicalPi-One"):
            return _MATHPI.get(chr(gmatch["cid"]))
        return None

    # --- Type0 path (fontcache.py:370-452) -----------------------------------

    def _type0_state(self, font: dict) -> dict:
        key = id(font)
        st = self._type0.get(key)
        if st is not None:
            return st
        widthmap: dict[int, float] = {}
        for sub in self.doc.resolve(font.get("DescendantFonts")) or []:
            sub = self.doc.resolve(sub)
            # each descendant loads through _ParseFont in the reference:
            # Type/Subtype required, subtype must be in the dispatch set
            # (a flipped 'CIDFonôType2' kills the page — diff_fuzz r04);
            # W is then read UNCONDITIONALLY (None dies in len())
            validate_font_dict(sub)
            w = self.doc.resolve(sub.get("W"))
            widthmap.update(cid_width_array_to_map(w))
        st = {"widthmap": widthmap, "mapper": None}
        self._type0[key] = st
        return st

    def _glyph_type0(self, font: dict, cid: int) -> Glyph:
        st = self._type0_state(font)
        mapper = st["mapper"]
        enc = self.doc.resolve(font.get("Encoding"))
        if mapper is None:
            tounicode = self.doc.resolve(font.get("ToUnicode"))
            if isinstance(tounicode, StreamObj):
                mapper = compile_cmap(tounicode.data)
            elif enc == "Identity-H":
                mapper = identity_mapper
            elif enc == "Identity-V":
                # reference bug: Identity-V path dereferences self.f ->
                # AttributeError -> page drop (fontcache.py:406)
                self.fallbacks += 1
                raise FontError("Identity-V is unsupported (reference parity)")
            else:
                self.fallbacks += 1
                raise FontError("Type0 without ToUnicode or Identity encoding")
            st["mapper"] = mapper
        try:
            u = mapper(cid)
        except KeyError:
            if enc == "Identity-H":
                u = identity_mapper(cid)
            else:
                raise FontError("cid %d unmapped in Type0 CMap" % cid) from None
        widthmap = st["widthmap"]
        if cid not in widthmap:
            raise FontError("cid %d not in Type0 width map" % cid)
        return Glyph(cid, widthmap[cid], u)


# -----------------------------------------------------------------------------
# document-level width synthesis (reference: __init__.py:160-230 GetFontWidths)


def font_widths(doc, font: dict) -> list:
    """Contiguous widths list used by the implied-space heuristic."""
    subtype = font.get("Subtype")
    if subtype in ("TrueType", "Type1"):
        widths = doc.resolve(font.get("Widths"))
        if widths is None:
            fm = afm.get_font_metrics(font.get("BaseFont") or "")
            first = doc.resolve(font.get("FirstChar"))
            last = doc.resolve(font.get("LastChar"))
            widths, first, last = afm.synthesized_widths(fm, first, last)
            font["Widths"] = widths  # memoize like the reference (f.Widths =)
            font.setdefault("FirstChar", first)
            font.setdefault("LastChar", last)
        return widths
    if subtype == "Type0":
        merged: dict[int, float] = {}
        for sub in doc.resolve(font.get("DescendantFonts")) or []:
            sub = doc.resolve(sub)
            validate_font_dict(sub)
            merged.update(cid_width_array_to_map(doc.resolve(sub.get("W"))))
        return [merged[k] for k in sorted(merged)]
    raise FontError("unrecognized font subtype %r" % subtype)
