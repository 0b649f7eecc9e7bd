"""Minimal CFF (Compact Font Format) unpacker for the missing-glyph path.

Re-implements the subset of the reference's CFF tokenizer
(parser/cff.py:437-907) that its MissingGlyphName resolver actually consumes
(fontcache.py:268-366): header, Name/Top-DICT/String/Global-Subr INDEXes,
Top-DICT integer operands + charset/Encoding/CharStrings operators, charset
formats 0-2, encoding format 0, and the per-gid glyph table
(gid, cid=encoding code, cname=charset SID resolved against standard or
custom strings).  CharStrings bodies are never interpreted (the reference's
ParseCharStrings is likewise unimplemented, cff.py:693).

Binary layout from the public Adobe CFF spec (tech note #5176).  Standard
strings SIDs 1..95 are exactly the StandardEncoding glyph names in code
order (32..126), so the table is derived from the encoding map; higher SIDs
are resolved from the font's own String INDEX (custom strings), and
unreferenced standard SIDs raise (recorded as a fallback upstream).
"""

from __future__ import annotations

import struct

from .cos import PdfError


class CffError(PdfError):
    pass


N_STD_STRINGS = 391  # SIDs 0..390 are standard


def _standard_strings() -> dict[int, str]:
    from .encodings import encoding_map

    std = encoding_map("Std")
    out = {0: ".notdef"}
    sid = 1
    for code in sorted(std):
        if 32 <= code <= 126:
            out[sid] = std[code]
            sid += 1
    return out


_STD_STRINGS: dict[int, str] | None = None


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self):
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self):
        v = struct.unpack_from(">H", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def u24(self):
        b = self.buf[self.pos : self.pos + 3]
        self.pos += 3
        return (b[0] << 16) | (b[1] << 8) | b[2]

    def u32(self):
        v = struct.unpack_from(">L", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def offset_at(self, size):
        try:
            return {1: self.u8, 2: self.u16, 3: self.u24, 4: self.u32}[size]()
        except KeyError:
            raise CffError("invalid offSize %d" % size) from None

    def index(self):
        """Read an INDEX at the current position; returns list[bytes]."""
        count = self.u16()
        if count == 0:
            return []
        off_size = self.u8()
        offsets = [self.offset_at(off_size) for _ in range(count + 1)]
        base = self.pos - 1  # offsets are 1-based from last offset byte
        data = [self.buf[base + offsets[i] : base + offsets[i + 1]]
                for i in range(count)]
        self.pos = base + offsets[-1]
        return data


def _parse_dict(dat: bytes) -> list:
    """Top DICT to a flat [operand..., opname, ...] list (the reference's
    ParseTopDict shape; only integer operands + the three operators the
    resolver needs are materialized, others keep their opcode number)."""
    ops = {15: "charset", 16: "Encoding", 17: "CharStrings"}
    out: list = []
    i = 0
    n = len(dat)
    while i < n:
        b = dat[i]
        if 32 <= b <= 246:
            out.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            out.append(((b - 247) << 8) + dat[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            out.append(-((b - 251) << 8) - dat[i + 1] - 108)
            i += 2
        elif b == 28:
            out.append(struct.unpack_from(">h", dat, i + 1)[0])
            i += 3
        elif b == 29:
            out.append(struct.unpack_from(">l", dat, i + 1)[0])
            i += 5
        elif b == 30:
            raise CffError("real-number operands not supported")
        elif b == 12:
            out.append("esc%d" % dat[i + 1])
            i += 2
        else:
            out.append(ops.get(b, "op%d" % b))
            i += 1
    return out


def parse_cff(buf: bytes) -> dict:
    """Parse a CFF font program; returns
    {'glyphs': [{'gid', 'cid', 'cname'}], 'name': fontname}."""
    r = _Reader(buf)
    major, minor, hdr_size, _off_size = r.u8(), r.u8(), r.u8(), r.u8()
    if major != 1:
        raise CffError("unsupported CFF major version %d" % major)
    r.pos = hdr_size
    names = r.index()
    top_dicts = r.index()
    strings = r.index()
    r.index()  # global subrs (unused)
    if not top_dicts:
        raise CffError("no Top DICT")
    font = _parse_dict(top_dicts[0])

    def _operand_before(opname):
        if opname not in font:
            return None
        i = font.index(opname)
        if i == 0 or not isinstance(font[i - 1], int):
            raise CffError("missing operand for /%s" % opname)
        return font[i - 1]

    cs_off = _operand_before("CharStrings")
    if cs_off is None:
        raise CffError("no CharStrings offset")
    r.pos = cs_off
    charstrings = r.index()
    n_glyphs = len(charstrings)

    # charset (SID per gid >= 1)
    sids: list[int] = []
    chs_off = _operand_before("charset")
    if chs_off is None or chs_off in (0, 1, 2):
        raise CffError("predefined charsets not supported (parity)")
    r.pos = chs_off
    fmt = r.u8()
    if fmt == 0:
        sids = [r.u16() for _ in range(n_glyphs - 1)]
    elif fmt in (1, 2):
        remaining = n_glyphs - 1
        while remaining > 0:
            sid = r.u16()
            n_left = r.u8() if fmt == 1 else r.u16()
            sids.append(sid)
            remaining -= 1
            sids.extend(sid + i for i in range(1, n_left + 1))
            remaining -= n_left
    else:
        raise CffError("charset format %d not supported" % fmt)

    # encoding (code per gid >= 1), format 0 only (reference parity)
    enc_off = _operand_before("Encoding")
    if enc_off is None or enc_off in (0, 1):
        raise CffError("predefined encodings not supported (parity)")
    r.pos = enc_off
    fmt = r.u8()
    if fmt != 0:
        raise CffError("encoding format %d not supported" % fmt)
    n_codes = r.u8()
    codes = [r.u8() for _ in range(n_codes)]

    global _STD_STRINGS
    if _STD_STRINGS is None:
        _STD_STRINGS = _standard_strings()

    def sid_name(sid: int) -> str:
        if sid >= N_STD_STRINGS:
            k = sid - N_STD_STRINGS
            if k >= len(strings):
                raise CffError("custom SID %d beyond String INDEX" % sid)
            return strings[k].decode("latin-1")
        name = _STD_STRINGS.get(sid)
        if name is None:
            raise CffError("standard SID %d outside derived table" % sid)
        return name

    glyphs = []
    for i in range(n_glyphs - 1):
        glyphs.append(
            {
                "gid": i + 1,
                "cid": codes[i] if i < len(codes) else 0,
                "cname": sid_name(sids[i]) if i < len(sids) else ".notdef",
            }
        )
    return {
        "name": names[0].decode("latin-1") if names else "",
        "glyphs": glyphs,
    }


# -----------------------------------------------------------------------------
# synthesis (test support): build a minimal CFF binary


def _enc_int(v: int) -> bytes:
    return b"\x1d" + struct.pack(">l", v)  # 29 = 5-byte int


def _index(items: list[bytes]) -> bytes:
    if not items:
        return b"\x00\x00"
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    out = struct.pack(">H", len(items)) + b"\x04"
    for o in offs:
        out += struct.pack(">L", o)
    return out + b"".join(items)


def build_cff(fontname: str, glyphs: list[tuple[str, int]]) -> bytes:
    """Synthesize a CFF with custom-named glyphs: [(cname, code), ...].
    Used by the fixture generator; glyph outlines are stub bytes."""
    header = bytes([1, 0, 4, 4])
    name_index = _index([fontname.encode("latin-1")])
    strings = [cname.encode("latin-1") for cname, _ in glyphs]
    string_index = _index(strings)
    gsubr_index = b"\x00\x00"
    charstrings = _index([b"\x0e"] * (len(glyphs) + 1))  # endchar stubs
    charset = b"\x00" + b"".join(
        struct.pack(">H", N_STD_STRINGS + i) for i in range(len(glyphs))
    )
    encoding = bytes([0, len(glyphs)]) + bytes(code for _, code in glyphs)

    # top dict with three absolute offsets; compute with a fixed-size dict
    top_body_len = 3 * (5 + 1)  # three 5-byte ints + 1-byte ops
    top_index_overhead = 2 + 1 + 2 * 4  # count, offSize, 2 u32 offsets
    pre = len(header) + len(name_index)
    top_len = top_index_overhead + top_body_len
    base = pre + top_len + len(string_index) + len(gsubr_index)
    charset_off = base
    enc_off = charset_off + len(charset)
    cs_off = enc_off + len(encoding)
    top_dict = (
        _enc_int(charset_off) + bytes([15])
        + _enc_int(enc_off) + bytes([16])
        + _enc_int(cs_off) + bytes([17])
    )
    top_index = _index([top_dict])
    assert len(top_index) == top_len, (len(top_index), top_len)
    return (header + name_index + top_index + string_index + gsubr_index
            + charset + encoding + charstrings)
