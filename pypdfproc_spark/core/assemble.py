"""Text assembly: render-event fold -> per-page text (+ span offsets).

Re-implements the reference's GetFullText callback (__init__.py:548-620)
byte-for-byte, including every parity-critical quirk (SURVEY.md §2.7, §4.1):

- y initialized to -1.0 and NEVER reset: the first glyph of the document
  emits '\\n', and a page whose first glyph sits at the same y as the
  previous page's last glyph gets NO leading newline
- implied space: a TJ kern with |w| > 0.5 * average nonzero width of the
  CURRENT font emits one ' '; the average is recomputed on every change_font
- a page exception leaves the partial text buffer in place, leaking it into
  the NEXT page's string, and the failed page contributes no list entry
- a space_draw before any change_font crashes (widths is None) -> page drop,
  exactly like the reference's TypeError

Spans (north_star requirement, no reference analog): per emitted line we
record (page, start, end, x, y) character offsets into that page's text.
"""

from __future__ import annotations

from .fonts import font_widths


class TextAssembler:
    __slots__ = ("doc", "_lookup_font", "fulltxt", "spans", "txt", "y",
                 "widths", "_txt_len", "_line_start", "_line_x", "_line_y",
                 "_page_spans")

    def __init__(self, doc, lookup_font):
        self.doc = doc
        self._lookup_font = lookup_font
        self.fulltxt: list[str] = []
        self.spans: list[list[tuple]] = []
        self.txt: list[str] = []
        self.y = -1.0
        self.widths = None
        # span tracking (extension; does not affect text bytes)
        self._txt_len = 0  # running sum(len(t) for t in txt)
        self._line_start = 0
        self._line_x = None
        self._line_y = None
        self._page_spans: list[tuple] = []

    # ------------------------------------------------------------------

    def on_change_font(self, fontname: str, fontsize: float) -> None:
        f = self._lookup_font(fontname)
        w = font_widths(self.doc, f)
        if isinstance(w, dict):
            vals = [v[0] for v in list(w.values()) if v[0] != 0]
        else:
            vals = [v for v in w if v != 0]
        self.widths = {
            "avg": sum(vals) / float(len(vals)),
            "min": min(vals),
            "max": max(vals),
        }

    def on_glyph_draw(self, x, y, glyph) -> None:
        # flat (x, y, glyph) signature: the interpreter calls this once per
        # glyph — the hot path of the whole engine — and a positional flat
        # call avoids one tuple alloc + unpack per glyph
        if self.y != y:
            self._close_line()
            self.txt.append("\n")
            self._txt_len += 1
            self.y = y
            self._line_start = self._txt_len
            self._line_x, self._line_y = x, y
        u = glyph.unicode
        self.txt.append(u)
        self._txt_len += len(u)

    def on_text_run(self, x, y, text) -> None:
        """Batched same-y glyph run (the interpreter's fast path): byte-
        equivalent to on_glyph_draw per glyph GIVEN that every glyph in
        ``text`` shares ``y`` bit-exactly — the caller proves that before
        batching (interp.py fast-path preconditions)."""
        if self.y != y:
            self._close_line()
            self.txt.append("\n")
            self._txt_len += 1
            self.y = y
            self._line_start = self._txt_len
            self._line_x, self._line_y = x, y
        self.txt.append(text)
        self._txt_len += len(text)

    def on_space_draw(self, w) -> None:
        if abs(w) > 0.5 * self.widths["avg"]:
            self.txt.append(" ")
            self._txt_len += 1

    def on_page_end(self) -> None:
        self._close_line()
        self.fulltxt.append("".join(self.txt))
        self.spans.append(self._page_spans)
        self.txt.clear()
        self._txt_len = 0
        self._page_spans = []
        self._line_start = 0

    def _close_line(self) -> None:
        end = self._txt_len
        if self._line_y is not None and end > self._line_start:
            self._page_spans.append(
                (len(self.fulltxt), self._line_start, end,
                 self._line_x, self._line_y)
            )
        self._line_y = None

    # ------------------------------------------------------------------

    def feed_one(self, ev) -> None:
        kind = ev[0]
        if kind == "glyph_draw":
            self.on_glyph_draw(ev[1][0], ev[1][1], ev[2])
        elif kind == "space_draw":
            self.on_space_draw(ev[1])
        elif kind == "change_font":
            self.on_change_font(ev[1], ev[2])
        # text/text_start/text_end: not consumed by the full-text fold

    def feed(self, events: list) -> None:
        for ev in events:
            self.feed_one(ev)
