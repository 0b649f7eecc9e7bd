"""Content-stream tokenizer: decoded stream bytes -> [Op(name, operands)].

Re-implements the reference's PLY content lexer + postfix->prefix regrouping
(parser/text.py:1-621) as a single operand-stack pass over bytes: operands
are pushed; when an operator keyword is read, its operands are popped and an
``Op`` is emitted — semantically identical to the reference's per-arity
regrouping for well-formed streams, O(n) in one pass.

Error parity: the reference's lexer raises on any byte it has no rule for
(an operator outside its token list, parser/text.py:229-231), and its
regrouper raises on operand-count mismatches (the ``lastidx`` checks).  Both
become ContentError here; the interpreter's caller drops the page exactly as
the reference's RenderPages does (__init__.py:287-296).
"""

from __future__ import annotations

import re as _re_mod

from .cos import LitStr, PdfError, Scanner


class ContentError(PdfError):
    pass


class Op:
    __slots__ = ("name", "operands")

    def __init__(self, name: str, operands: list):
        self.name = name
        self.operands = operands

    def __repr__(self):
        return "Op(%s, %r)" % (self.name, self.operands)


# The reference's operator vocabulary (parser/text.py:7-113), keyed by the
# raw keyword; values are the canonical op names used by the interpreter
# ('* -> star' renames follow the reference's token names).
_OPS = {
    "BT": "BT", "ET": "ET",
    "Tc": "Tc", "Tw": "Tw", "Tz": "Tz", "TL": "TL", "Tf": "Tf",
    "Tr": "Tr", "Ts": "Ts", "Tk": "Tk",
    "Td": "Td", "TD": "TD", "Tm": "Tm",
    "T*": "Tstar", "'": "TstarTj", '"': "TwTcTstarTj",
    "Tj": "Tj", "TJ": "TJ",
    "CS": "CS", "cs": "cs", "SCN": "SCN", "SC": "SC", "scn": "scn",
    "sc": "sc", "G": "G", "g": "g", "RG": "RG", "rg": "rg", "K": "K",
    "k": "k",
    "MP": "MP", "DP": "DP", "BMC": "BMC", "BDC": "BDC", "EMC": "EMC",
    "q": "q", "Q": "Q", "cm": "cm", "w": "w", "j": "j", "J": "J",
    "M": "M", "d": "d", "ri": "ri", "i": "i", "gs": "gs",
    "m": "m", "l": "l", "c": "c", "v": "v", "y": "y", "h": "h", "re": "re",
    "S": "S", "s": "s", "f": "f", "F": "F", "f*": "fstar",
    "B": "B", "B*": "Bstar", "b": "b", "b*": "bstar", "n": "n",
    "W": "W", "W*": "Wstar",
    "Do": "Do",
}

# Fixed arities (reference: parser/text.py:343-621 regrouping classes).
#
# Quirk parity: the reference's zero-arity membership list contains the
# LITERAL strings 'B*' and 'b*' (parser/text.py:351), which can never equal
# the PLY token TYPES it actually produces ('Bstar'/'bstar',
# parser/text.py:191,193) — so those two painting operators fall through to
# the regrouper's final "Unrecognized token type" raise (text.py:619) and
# drop the page, while fstar/Wstar are listed correctly and work.  Pinned
# by fixture f24_graphics_soup.
_REGROUPER_UNRECOGNIZED = frozenset(("Bstar", "bstar"))

_ARITY = {}
for _n in ("q", "Q", "h", "S", "s", "F", "f", "fstar", "B", "b",
           "n", "W", "Wstar", "BT", "ET", "Tstar", "EMC"):
    _ARITY[_n] = 0
for _n in ("w", "J", "j", "M", "ri", "i", "gs", "CS", "cs", "G", "g", "Do",
           "Tc", "Tw", "Tz", "TL", "Tr", "Ts", "Tj", "TstarTj", "MP", "BMC"):
    _ARITY[_n] = 1
for _n in ("m", "l", "Tf", "Td", "TD", "DP", "BDC"):
    _ARITY[_n] = 2
for _n in ("RG", "rg", "TwTcTstarTj"):
    _ARITY[_n] = 3
for _n in ("v", "y", "re", "K", "k"):
    _ARITY[_n] = 4
for _n in ("cm", "c", "Tm"):
    _ARITY[_n] = 6
# TJ: one array operand; d: array + number; SC/sc/SCN/scn: variadic.


_FLOAT_RE = _re_mod.compile(r"[+-]?[0-9]*\.[0-9]*")
_INT_RE = _re_mod.compile(r"[+-]?[0-9]+")


def _split_run(run: str) -> list:
    """PLY master-regex emulation over one delimiter-free keyword run.

    The reference's text lexer (parser/text.py) has no generic keyword
    rule: PLY tries the function rules t_FLOAT / t_INT first, then the
    per-operator string rules longest-regex-first, at EVERY position — so
    'ETBT' lexes as two operators, 'q1' as q + INT 1, and an unmatched
    byte (NUL, \\x0c, '%', '{', an unknown operator letter) hits t_error
    and drops the page (text.py:229-231).  Probed round 4 (tools/
    probe_r3.py run_unspaced/run_nul/...).  Runs that are a single known
    operator (the overwhelmingly common case) bypass this via the _OPS
    fast path in tokenize_content.
    """
    out = []
    i, n = 0, len(run)
    while i < n:
        m = _FLOAT_RE.match(run, i)
        if m and m.group():
            try:
                out.append(("float", float(m.group())))
            except ValueError:
                raise ContentError(
                    "malformed number %r in content stream (reference "
                    "t_FLOAT ValueError)" % m.group()
                ) from None
            i = m.end()
            continue
        m = _INT_RE.match(run, i)
        if m:
            out.append(("int", int(m.group())))
            i = m.end()
            continue
        for L in (3, 2, 1):
            op = run[i:i + L]
            if op in _OPS:
                out.append(("kw", op))
                i += L
                break
        else:
            raise ContentError(
                "bad character %r in content stream (reference t_error)"
                % run[i]
            )
    return out


def tokenize_content(data: bytes) -> list[Op]:
    """Tokenize + regroup a decoded content stream."""
    sc = Scanner(data, content=True)
    stack: list = []
    ops: list[Op] = []
    pending: list = []
    while True:
        if pending:
            kind, val = pending.pop(0)
        else:
            try:
                kind, val = sc.next_token()
            except PdfError as e:
                raise ContentError(str(e)) from None
            if kind == "kw" and val not in _OPS:
                pending = _split_run(val)
                continue
        if kind == "eof":
            break
        if kind in ("int", "float", "name", "lit", "hex"):
            stack.append(val)
            continue
        if kind == "arr<":
            arr = []
            while True:
                k2, v2 = sc.next_token()
                if k2 == "arr>":
                    break
                if k2 == "eof":
                    raise ContentError("unterminated array in content stream")
                if k2 not in ("int", "float", "name", "lit", "hex"):
                    raise ContentError("unexpected %s inside array" % k2)
                arr.append(v2)
            stack.append(arr)
            continue
        if kind == "dict<":
            stack.append(_parse_inline_dict(sc))
            continue
        if kind != "kw":
            raise ContentError("unexpected token %r in content stream" % kind)

        name = _OPS.get(val)
        if name is None:
            # reference lexer has no rule for this keyword -> lex error ->
            # page dropped (parser/text.py:229-231)
            raise ContentError("unknown content operator %r" % val)
        if name in _REGROUPER_UNRECOGNIZED:
            # lexed by the reference but unhandled in its regrouper (the
            # 'B*'/'b*'-vs-'Bstar'/'bstar' membership bug, see above)
            raise ContentError(
                "operator %r unrecognized by regrouper (reference parity)"
                % val
            )

        if name == "TJ":
            if not stack or not isinstance(stack[-1], list):
                raise ContentError("TJ without array operand")
            operands = stack.pop()
            if stack:
                raise ContentError("stray operands before TJ")
        elif name == "d":
            if len(stack) != 2 or not isinstance(stack[0], list):
                raise ContentError("d expects [array num]")
            operands = [stack[0], stack[1]]
            stack = []
        elif name in ("SC", "sc", "SCN", "scn"):
            # quirk parity (parser/text.py:567-610): the reference's
            # backward operand scan collects only INT/FLOAT for SC/sc and
            # INT/FLOAT/LIT for SCN/scn — despite its own comment listing
            # the "c1 name SC" pattern-name form — and any uncollected
            # token (a NAME, a hexstring) then trips the skipped-token
            # consistency check (ValueError at :610) and drops the page.
            # Pinned differentially by fixture f24_graphics_soup page 2.
            allowed = (
                (int, float) if name in ("SC", "sc") else (int, float, LitStr)
            )
            for v in stack:
                if not isinstance(v, allowed):
                    raise ContentError(
                        "operand %r not collected by %s scan "
                        "(reference skipped-token parity)" % (v, name)
                    )
            operands = stack
            stack = []
        else:
            arity = _ARITY[name]
            if len(stack) != arity:
                raise ContentError(
                    "operator %s expected %d operands, got %d"
                    % (name, arity, len(stack))
                )
            operands = stack
            stack = []
        ops.append(Op(name, operands))
    # trailing operands with no operator: the reference returns them as
    # 'residual' (parser/text.py:621) and RenderPage ignores it -- drop.
    return ops


def _parse_inline_dict(sc: Scanner) -> dict:
    items = []
    while True:
        kind, val = sc.next_token()
        if kind == "dict>":
            break
        if kind == "eof":
            raise ContentError("unterminated dictionary in content stream")
        if kind == "dict<":
            items.append(_parse_inline_dict(sc))
        elif kind in ("int", "float", "name", "lit", "hex"):
            items.append(val)
        elif kind == "arr<":
            arr = []
            while True:
                k2, v2 = sc.next_token()
                if k2 == "arr>":
                    break
                if k2 == "eof":
                    # truncated payload: without this guard the scanner
                    # returns 'eof' forever and the loop never terminates
                    raise ContentError(
                        "unterminated array in inline dictionary"
                    )
                arr.append(v2)
            items.append(arr)
        else:
            raise ContentError("unexpected %s in inline dict" % kind)
    if len(items) % 2:
        items.append(None)
    return {items[k]: items[k + 1] for k in range(0, len(items), 2)}


def split_literal(raw: bytes) -> list[str]:
    """Split a literal string into drawable characters, replicating the
    reference's SplitLiteral escape semantics exactly (__init__.py:659-719):
    ``\\\\`` keeps one backslash; ``\\n``-style named escapes decode;
    escaped *actual* control characters pass through; 1-3 digit octal
    decodes; anything else is an error (-> page drop).  Operates on the
    latin-1 view, as the reference does throughout."""
    lit = raw.decode("latin-1")
    if "\\" not in lit:
        # fast path: no escapes — every character is drawable as-is
        # (identical to the loop below, which only branches on '\\')
        return list(lit)
    ret: list[str] = []
    i = 0
    imax = len(lit)
    while i < imax:
        ch = lit[i]
        if ch != "\\":
            ret.append(ch)
            i += 1
            continue
        if i + 1 >= imax:
            raise ContentError("dangling backslash in literal")
        nxt = lit[i + 1]
        if nxt == "\\":
            ret.append("\\")
            i += 2
        elif nxt in ("\n", "\r", "\t", "\b", "\f"):
            ret.append(nxt)
            i += 2
        elif nxt == "n":
            ret.append("\n")
            i += 2
        elif nxt == "r":
            ret.append("\r")
            i += 2
        elif nxt == "t":
            ret.append("\t")
            i += 2
        elif nxt == "b":
            ret.append("\b")
            i += 2
        elif nxt == "f":
            ret.append("\f")
            i += 2
        elif nxt.isdigit():
            # The reference's digit lookahead is UNGUARDED (__init__.py:
            # 700-710): after one octal digit it always reads lit[i+2],
            # and after two digits lit[i+3] — so 1 or 2 digits sitting at
            # the very end of the literal die with IndexError (page drop,
            # f126), they do NOT decode as short octal.  Short octal only
            # works when a non-digit follows (f125 '\\41B' -> '!B').
            if i + 2 >= imax:
                raise ContentError("octal escape truncated at literal end")
            if lit[i + 2].isdigit():
                if i + 3 >= imax:
                    raise ContentError(
                        "octal escape truncated at literal end")
                if lit[i + 3].isdigit():
                    ret.append(chr(int(lit[i + 1 : i + 4], 8)))
                    i += 4
                else:
                    ret.append(chr(int(lit[i + 1 : i + 3], 8)))
                    i += 3
            else:
                ret.append(chr(int(nxt, 8)))
                i += 2
        else:
            raise ContentError(
                "unhandled escape '\\%s' in literal at %d" % (nxt, i)
            )
    return ret


def split_hex(hexdigits: str, bytesize: int) -> list[str]:
    """Split a hex string into ``bytesize``-byte characters (reference:
    __init__.py:721-740): odd length gets one trailing '0'; a length not a
    multiple of 2*bytesize is an error."""
    txt = hexdigits
    if len(txt) % 2 == 1:
        txt += "0"
    width = bytesize * 2
    if len(txt) % width != 0:
        raise ContentError(
            "cannot split hex string len=%d into %d-byte chars"
            % (len(txt), bytesize)
        )
    return [chr(int(txt[i : i + width], 16)) for i in range(0, len(txt), width)]
