"""Content-stream interpreter: Op list -> render events.

Re-implements the reference's dispatch loop and state machine
(_RenderPage_Tokens __init__.py:344-543 + parser/state.py:57-507) with the
callback architecture turned into a returned **event list** (SURVEY.md §2.5):
('change_font', name, size), ('text', chars), ('space_draw', w),
('glyph_draw', (x, y), Glyph), ('text_start',), ('text_end',).

Parity notes:
- q/Q copy the FULL state incl. text state (deep copy in the reference,
  state.py:96-105); here states are small immutable-field objects so Copy is
  a cheap field copy.
- glyph position m = [Tfs*Tz 0; 0 Tfs; 0 Tr] x Tm x cm — including the
  reference's un-normalized Tz (NOT divided by 100 in this matrix,
  __init__.py:521).
- advances (state.py:384-416): kern tx = (-w/1000*Tfs)*(Tz/100); glyph
  tx = (gw/1000*Tfs + Tc + Tw)*(Tz/100) — Tw applied to every glyph (the
  reference's acknowledged FIXME), both premultiplied onto Tm.
- unsupported operators (' " Tk MP DP BMC, and gs keys D/BG/BG2/UCR/UCR2/
  TR/HT/SMask/TK) raise -> the caller drops the page (__init__.py:373-413,
  542-543).
"""

from __future__ import annotations

from .content import Op, split_hex, split_literal, tokenize_content
from .cos import HexStr, LitStr, PdfError, StreamObj
from .fonts import FontResolver


class InterpError(PdfError):
    pass


class Mat:
    """3x3 matrix, PDF text-matrix convention [a b 0; c d 0; e f 1]
    (reference: state.py:422-483 Mat3x3, same element-wise product)."""

    __slots__ = ("A", "B", "C", "D", "E", "F", "G", "H", "I")

    def __init__(self, a, b, c, d, e, f, g=0.0, h=0.0, i=1.0):
        self.A = float(a)
        self.B = float(b)
        self.C = float(c)
        self.D = float(d)
        self.E = float(e)
        self.F = float(f)
        self.G = float(g)
        self.H = float(h)
        self.I = float(i)

    def __mul__(a, b):
        return Mat(
            a.A * b.A + a.B * b.C + a.G * b.E,
            a.A * b.B + a.B * b.D + a.G * b.F,
            a.C * b.A + a.D * b.C + a.H * b.E,
            a.C * b.B + a.D * b.D + a.H * b.F,
            a.E * b.A + a.F * b.C + a.I * b.E,
            a.E * b.B + a.F * b.D + a.I * b.F,
            a.A * b.G + a.B * b.H + a.G * b.I,
            a.C * b.G + a.D * b.H + a.H * b.I,
            a.E * b.G + a.F * b.H + a.I * b.I,
        )

    @staticmethod
    def identity():
        return Mat(1, 0, 0, 1, 0, 0)

    @classmethod
    def _make(cls, a, b, c, d, e, f):
        """Fast constructor for already-float affine matrices (G=H=0, I=1)."""
        m = cls.__new__(cls)
        m.A = a
        m.B = b
        m.C = c
        m.D = d
        m.E = e
        m.F = f
        m.G = 0.0
        m.H = 0.0
        m.I = 1.0
        return m

    def translated(self, tx, ty):
        """T(tx,ty) x self — bit-identical to the full product when
        G=H=0, I=1 (the only matrices the text machine ever builds):
        E' = tx*A + ty*C + E, F' = tx*B + ty*D + F, rest unchanged."""
        return Mat._make(
            self.A, self.B, self.C, self.D,
            tx * self.A + ty * self.C + self.E,
            tx * self.B + ty * self.D + self.F,
        )


class TextState:
    __slots__ = ("Tf", "Tfs", "Tc", "TL", "Tr", "Ts", "Tw", "Tz", "Tm", "Tlm")

    def __init__(self):
        self.Tf = None
        self.Tfs = None
        self.Tc = 0.0
        self.TL = 0.0
        self.Tr = 0
        self.Ts = 0.0
        self.Tw = 0.0
        self.Tz = 100.0
        self.Tm = None
        self.Tlm = None

    def copy(self):
        c = TextState.__new__(TextState)
        for k in self.__slots__:
            setattr(c, k, getattr(self, k))
        return c

    def text_begin(self):
        self.Tm = Mat.identity()
        self.Tlm = Mat.identity()

    def text_end(self):
        self.Tm = None
        self.Tlm = None

    def set_Tm(self, m: Mat):
        self.Tm = m
        self.Tlm = m

    def do_Td(self, x, y):
        m = self.Tlm.translated(float(x), float(y))
        self.Tm = m
        self.Tlm = m

    def do_TD(self, x, y):
        self.TL = -float(y)
        self.do_Td(x, y)

    def do_Tstar(self):
        self.do_Td(0, self.TL)

    # Reference parity (probed round 4, pinned f87): TextState.Tm is a
    # PROPERTY whose setter assigns BOTH matrices (state.py:364
    # ``self._Tm = self._Tlm = v``), so every glyph/kern advance moves the
    # "line" matrix too — Td/TD/T* translate relative to the END of the
    # previous show, not the line start.  There is no independent line
    # matrix in the reference at all.

    def advance_kern(self, w):
        tx = ((0.0 - w) / 1000.0 * self.Tfs) * (self.Tz / 100.0)
        self.Tm = self.Tlm = self.Tm.translated(tx, 0.0)

    def advance_glyph(self, gw):
        tx = ((gw - 0.0) / 1000.0 * self.Tfs + self.Tc + self.Tw) * (
            self.Tz / 100.0
        )
        self.Tm = self.Tlm = self.Tm.translated(tx, 0.0)


class GState:
    __slots__ = ("cm", "text")

    def __init__(self):
        self.cm = Mat.identity()
        self.text = TextState()

    def copy(self):
        c = GState.__new__(GState)
        c.cm = self.cm  # Mats are immutable-by-convention
        c.text = self.text.copy()
        return c


class StateStack:
    """q/Q stack (reference: state.py:57-105)."""

    def __init__(self):
        self.stack = [GState()]

    @property
    def S(self) -> GState:
        return self.stack[-1]

    @property
    def T(self) -> TextState:
        return self.S.text

    def push(self):
        self.stack.append(self.S.copy())

    def pop(self):
        if len(self.stack) <= 1:
            raise InterpError("cannot pop initial state")
        self.stack.pop()


# operators tracked for graphics-path side effects only; text extraction
# needs no path geometry, so they are consumed without state (the reference
# tracks positions but nothing downstream of text reads them)
_PATH_NOOPS = frozenset(
    "m l c v y h re S s f F fstar B Bstar b bstar n W Wstar".split()
)
_SIMPLE_PARAMS = frozenset("i d j J M ri w".split())
_COLOR = frozenset("cs CS sc SC scn SCN G g RG rg K k".split())
_UNSUPPORTED = frozenset("TstarTj TwTcTstarTj Tk MP DP BMC".split())

# gs dictionary keys the reference refuses (NotImplementedError,
# __init__.py:373-413)
_GS_UNSUPPORTED = ("D", "BG", "BG2", "UCR", "UCR2", "TR", "HT", "SMask", "TK")


class PageInterpreter:
    """Interprets one page (plus XObject recursion) into an event list."""

    def __init__(self, doc, resolver: FontResolver, resources_stack: list,
                 on_event=None, on_glyph=None, on_text_run=None):
        self.doc = doc
        self.fonts = resolver
        # shared, document-lifetime resource stack (the reference's
        # PDF.resources list; survives page exceptions un-popped)
        self.resources = resources_stack
        self.events: list = []
        # events are delivered to the sink AS they happen so that a mid-page
        # exception leaves the same partial fold state as the reference's
        # callback architecture (__init__.py:273-298)
        self._sink = on_event
        # optional fast path for the one event class that dominates volume
        # (~95% of events are glyph draws): called as on_glyph(x, y, glyph)
        # directly, skipping tuple construction + string dispatch per glyph
        self._on_glyph = on_glyph
        # optional batched variant: one call per constant-y glyph run
        # (on_text_run(x0, y, concatenated_unicode)); only engaged when the
        # fast path PROVES y is bit-identical across the run (see
        # _show_text preconditions)
        self._on_text_run = on_text_run

    def _emit(self, ev) -> None:
        # with a sink attached (the assembler), events are consumed as they
        # happen and NOT retained -- retaining every glyph tuple doubles the
        # hot-path cost and grows an unused list; without a sink (inspect
        # tooling) they accumulate for the caller
        if self._sink is not None:
            self._sink(ev)
        else:
            self.events.append(ev)

    # --- resource resolution (reference: __init__.py:128-158 GetFont) ------

    def lookup_font(self, fontname: str) -> dict:
        for recs in self.resources:
            # reference parity (diff_fuzz r04): a page with NO /Resources
            # pushes None onto the stack, and GetFont does `recs.Font` on
            # it (AttributeError, __init__.py:141) — and because errored
            # pages never pop their entry, the leaked None kills font
            # lookups on every LATER page too.  Skipping None here was a
            # silent superset.
            if recs is None:
                raise InterpError(
                    "page resources are None (reference recs.Font "
                    "AttributeError)")
            # indirect /Font resource dicts go through the reference's
            # GetDictionary (intolerant of trailing comments — r05)
            fonts = self.doc.resolve_resource_dict(recs.get("Font"))
            if fonts is None:
                continue
            if fontname not in fonts:
                # NB: fontname can be a NON-STRING (e.g. a Ref when an
                # ExtGState /Font entry set Tf to an indirect reference,
                # f134) — tuple-typed values need the 1-tuple wrap or the
                # %-format itself TypeErrors (as the reference's own
                # GetFont error formatting does, __init__.py:146)
                raise InterpError(
                    "unrecognized font name %r for page" % (fontname,)
                )
            return self.doc.resolve(fonts[fontname])
        raise InterpError("unable to find font %r" % fontname)

    def _ext_gstate(self, page: dict, name: str) -> dict:
        recs = self.doc.resolve(page.get("Resources")) or {}
        egs = self.doc.resolve_resource_dict(recs.get("ExtGState")) or {}
        if name not in egs:
            raise InterpError("unrecognized ExtGState %r" % name)
        return self.doc.resolve(egs[name])

    # --- main loop -----------------------------------------------------------

    def run_page(self, page: dict) -> list:
        return self.run_content(page, self.doc.page_content(page))

    def run_content(self, page: dict, content: bytes) -> list:
        ops = tokenize_content(content)
        s = StateStack()
        self._dispatch(page, ops, s)
        return self.events

    def _dispatch(self, page: dict, ops: list[Op], s: StateStack) -> None:
        emit = self._emit
        for op in ops:
            name = op.name
            if name == "q":
                s.push()
            elif name == "Q":
                s.pop()
            elif name in _PATH_NOOPS or name in _SIMPLE_PARAMS or name in _COLOR:
                pass
            elif name == "gs":
                gs = self._ext_gstate(page, op.operands[0])
                for k in _GS_UNSUPPORTED:
                    if gs.get(k) is not None:
                        raise InterpError(
                            "ExtGState key /%s not supported (parity)" % k
                        )
                fnt = gs.get("Font")
                if fnt is not None:
                    s.T.Tf = fnt[0]
                    s.T.Tfs = float(fnt[1])
            elif name == "Do":
                self._do_xobject(page, op.operands[0], s)
            elif name == "cm":
                s.S.cm = Mat(*[float(v) for v in op.operands])
            elif name == "BT":
                s.T.text_begin()
            elif name == "ET":
                s.T.text_end()
            elif name == "Tc":
                s.T.Tc = float(op.operands[0])
            elif name == "Tw":
                s.T.Tw = float(op.operands[0])
            elif name == "Tz":
                s.T.Tz = float(op.operands[0])
            elif name == "TL":
                s.T.TL = float(op.operands[0])
            elif name == "Ts":
                s.T.Ts = float(op.operands[0])
            elif name == "Tr":
                s.T.Tr = int(op.operands[0])
            elif name == "Tf":
                s.T.Tf = op.operands[0]
                s.T.Tfs = float(op.operands[1])
                emit(("change_font", s.T.Tf, s.T.Tfs))
            elif name == "Tm":
                s.T.set_Tm(Mat(*[float(v) for v in op.operands]))
            elif name == "Td":
                s.T.do_Td(float(op.operands[0]), float(op.operands[1]))
            elif name == "TD":
                s.T.do_TD(float(op.operands[0]), float(op.operands[1]))
            elif name == "Tstar":
                s.T.do_Tstar()
            elif name in ("Tj", "TJ"):
                self._show_text(page, op, s)
            elif name in ("BDC", "EMC"):
                pass
            elif name in _UNSUPPORTED:
                raise InterpError("cannot render %r token (parity)" % name)
            else:
                raise InterpError("cannot render %r token" % name)

    def _do_xobject(self, page: dict, xname: str, s: StateStack) -> None:
        """Do operator (reference: __init__.py:447-461): resolve via the
        PAGE's resources (not the stack), push the XObject's resources,
        recurse into its content."""
        recs = self.doc.resolve(page.get("Resources")) or {}
        xobjs = self.doc.resolve_resource_dict(recs.get("XObject")) or {}
        if xname not in xobjs:
            raise InterpError("unknown XObject %r" % xname)
        x = self.doc.resolve(xobjs[xname])
        if not isinstance(x, StreamObj):
            raise InterpError("XObject %r is not a stream" % xname)
        # reference _ParseXObject (parser/__init__.py:715-726): d['Subtype']
        # KeyErrors when absent and anything but Form/Image ValueErrors —
        # both page drops at load time (deep diff_fuzz r05: a NBSP inside
        # '/Subtype' renames the key and the page must die).  The VALUE is
        # read raw (an indirect Subtype is an IndirectObject there ->
        # ValueError; a Ref here -> same raise).
        if "Subtype" not in x.dict:
            raise InterpError(
                "XObject %r has no /Subtype (reference KeyError)" % xname)
        styp = x.dict["Subtype"]
        if styp not in ("Form", "Image"):
            raise InterpError(
                "XObject %r Subtype %r is neither Form nor Image" %
                (xname, styp))
        xres = self.doc.resolve(x.dict.get("Resources"))
        # verbatim push (reference __init__.py:454): a Resources-less
        # XObject pushes None with the same poisoning semantics
        self.resources.append(xres)
        ops = tokenize_content(x.data)
        self._dispatch(page, ops, s)
        self.resources.pop()

    def _show_text(self, page: dict, op: Op, s: StateStack) -> None:
        emit = self._emit
        on_glyph = self._on_glyph
        emit(("text_start",))
        # the font can only change BETWEEN show-text ops (Tf), so resolve it
        # on the first string sub and reuse — lazily, because a missing font
        # must raise only when the first string is reached, AFTER any
        # leading TJ kern numbers already emitted their space_draw events
        # (partial-state parity on error pages)
        font = None
        for sub in op.operands:
            if isinstance(sub, (int, float)):
                s.T.advance_kern(float(sub))
                emit(("space_draw", float(sub)))
                continue
            if font is None:
                font = self.lookup_font(s.T.Tf)
            if isinstance(sub, HexStr):
                enc = self.doc.resolve(font.get("Encoding"))
                if isinstance(enc, str) and enc.startswith("Identity"):
                    chars = split_hex(sub.hexdigits, bytesize=2)
                else:
                    raise InterpError(
                        "unknown encoding for hexstring: %r" % enc
                    )
            elif isinstance(sub, LitStr):
                chars = split_literal(sub.raw)
            else:
                raise InterpError("unexpected Tj operand %r" % (sub,))
            emit(("text", "".join(chars)))
            T = s.T
            cm = s.S.cm
            get_glyph = self.fonts.get_glyph
            cached_glyph = self.fonts.glyph_cache(font).get
            # glyph position = [Tfs*Tz 0; 0 Tfs; 0 Tr] x Tm x cm; only the
            # translation row (E,F) is observed, and all matrices here have
            # G=H=0, I=1, so the scalar form below is bit-identical to the
            # reference's two full 3x3 products (__init__.py:521).  Within
            # one string only translations touch Tm, so A-D are loop
            # constants and E/F evolve as scalars; the advance arithmetic
            # below is advance_glyph + translated(tx, 0.0) verbatim
            # (incl. the 0.0* terms — their signed zeros are observable).
            Tr = float(T.Tr)
            Tm = T.Tm
            ta, tb, tc, td = Tm.A, Tm.B, Tm.C, Tm.D
            te, tf = Tm.E, Tm.F
            cmA, cmB, cmC, cmD, cmE, cmF = cm.A, cm.B, cm.C, cm.D, cm.E, cm.F
            Tfs, Tc, Tw = T.Tfs, T.Tc, T.Tw
            Tzq = T.Tz / 100.0  # loop-constant; same value every glyph
            # constant-y fast path: with no rotation coupling (tb == 0 and
            # cmB == 0) only te evolves within the string, and te reaches y
            # solely through m1e*cmB = +-0.0 — absorbed exactly when the
            # rest of the sum is nonzero.  The bit-exactness proof needs
            #   tf != 0      (tf += +-0.0 per glyph is exact iff tf != 0)
            #   K  != 0      (+-0.0 + K == K exactly iff K != 0)
            #   y0 == y0     (a NaN y makes the slow path newline EVERY
            #                 glyph — NaN != NaN — so it must stay slow)
            # Under those, every glyph's y is bit-identical to y0, x is
            # observable only at the line change (first glyph), and the run
            # collapses to ONE on_text_run call.  A non-finite te (giant
            # widths) falls back mid-string to the exact slow loop.
            on_run = self._on_text_run
            i = 0
            n_chars = len(chars)
            fast = (
                on_run is not None and tb == 0.0 and cmB == 0.0 and tf != 0.0
                # te must be finite on ENTRY: a nonfinite te makes the
                # exact path compute y = m1e*cmB = NaN per glyph (newline
                # every glyph), which the constant-y collapse cannot model
                and te - te == 0.0
            )
            if fast:
                m1f0 = 0.0 * tb + Tr * td + tf
                k0 = m1f0 * cmD
                y0 = k0 + cmF
                fast = k0 != 0.0 and y0 == y0
            try:
                if fast:
                    buf = []
                    buf_append = buf.append
                    x0 = 0.0
                    try:
                        while i < n_chars:
                            cid = ord(chars[i])
                            g = cached_glyph(cid)
                            if g is None:
                                g = get_glyph(font, cid)
                            if not buf:
                                m1e = 0.0 * ta + Tr * tc + te
                                x0 = m1e * cmA + m1f0 * cmC + cmE
                            buf_append(g.unicode)
                            tx = ((g.width - 0.0) / 1000.0 * Tfs + Tc + Tw) * Tzq
                            te = tx * ta + 0.0 * tc + te
                            i += 1
                            if te - te != 0.0:
                                # te went inf/NaN: replicate the exact
                                # path's tf update for THIS glyph (tx*tb
                                # is NaN when tx itself is nonfinite, and
                                # exactly +-0.0 absorbed by tf != 0.0
                                # otherwise), then finish slow, exact
                                tf = tx * tb + 0.0 * td + tf
                                break
                    finally:
                        # flush BEFORE any exception propagates: the slow
                        # path had already drawn these glyphs (partial-state
                        # parity on error pages)
                        if buf:
                            on_run(x0, y0, "".join(buf))
                for ch in chars[i:] if i else chars:
                    cid = ord(ch)
                    g = cached_glyph(cid)
                    if g is None:
                        g = get_glyph(font, cid)
                    m1e = 0.0 * ta + Tr * tc + te
                    m1f = 0.0 * tb + Tr * td + tf
                    x = m1e * cmA + m1f * cmC + cmE
                    y = m1e * cmB + m1f * cmD + cmF
                    if on_glyph is not None:
                        on_glyph(x, y, g)
                    else:
                        emit(("glyph_draw", (x, y), g))
                    # == T.advance_glyph(g.width), scalarized
                    tx = ((g.width - 0.0) / 1000.0 * Tfs + Tc + Tw) * Tzq
                    te = tx * ta + 0.0 * tc + te
                    tf = tx * tb + 0.0 * td + tf
            finally:
                # write back even when a glyph lookup raises mid-string:
                # the reference advanced per glyph, and the un-popped state
                # is observable through XObject recursion unwind
                # Tlm aliases Tm on every advance (reference state.py:364
                # property setter) — see TextState.advance_glyph
                T.Tm = T.Tlm = Mat._make(ta, tb, tc, td, te, tf)
        emit(("text_end",))
