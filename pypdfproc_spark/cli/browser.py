"""Interactive COS object-graph browser (SURVEY.md S12).

The reference ships a filesystem-metaphor CLI over open PDFs
(PDFCmd/PDFCmdState, reference __init__.py:821-1218: open/close, a pwd
stack, ls/cd/cat/pwd, array indices, dict keys, stream dict/data views).
This is the same tool re-expressed over THIS engine's COS model
(core.cos.PdfDocument: plain dicts/lists, Ref, StreamObj) — a dev/debug
surface, deliberately Spark-free; at corpus scale inspection goes through
jobs/inspect_pdf.py instead.

Design deltas from the reference (documented, intentional):
- commands are a pure function of (state, line) returning text, so the
  shell is scriptable/testable (``run_commands``) and the interactive
  REPL is a 10-line wrapper;
- indirect references are resolved on ``cd`` (the reference's lazy
  attribute loader does the same on property access);
- no single-filename restriction beyond the reference's (same-basename
  collision raises, reference :872-874).
"""

from __future__ import annotations

import os

from ..core.cos import PdfDocument, Ref, StreamObj


class CmdError(Exception):
    """User-facing command error (reference CmdError, __init__.py:821-829):
    the message prints, the shell keeps running."""


def _type_name(v) -> str:
    if isinstance(v, StreamObj):
        return "stream"
    if isinstance(v, dict):
        return "dict(%d)" % len(v)
    if isinstance(v, list):
        return "array(%d)" % len(v)
    if isinstance(v, Ref):
        return "ref(%d %d)" % (v.objid, v.gen)
    return type(v).__name__


def _preview(v, limit: int = 60) -> str:
    s = repr(v)
    return s if len(s) <= limit else s[: limit - 3] + "..."


class BrowserState:
    """pwd-stack navigation over open documents (reference PDFCmdState).

    The stack mirrors the reference's: [] = root (open files); [fname] =
    file root (catalog / trailer / xref / pages); deeper entries are
    (label, value) pairs — the reference stores bare objects plus
    display tuples (:898-906); one uniform pair keeps pwd rendering
    trivial."""

    def __init__(self):
        self._docs: dict[str, PdfDocument] = {}
        self._sizes: dict[str, int] = {}
        self._pwd: list = []  # [fname, (label, value), ...]

    # -- file management ---------------------------------------------------

    def open(self, path: str) -> str:
        path = path.strip()
        if not path:
            raise CmdError("usage: open <file.pdf>")
        if not os.path.exists(path):
            raise CmdError("File '%s' does not exist" % path)
        fname = os.path.basename(os.path.abspath(path))
        if fname in self._docs:
            # same restriction as the reference (:872-874)
            raise CmdError(
                "Cannot open more than one file with the same filename: '%s'"
                % path
            )
        with open(path, "rb") as fh:
            data = fh.read()
        self._docs[fname] = PdfDocument(data)
        self._sizes[fname] = len(data)
        return "opened %s (%d bytes, PDF %s)" % (
            fname, len(data), self._docs[fname].version,
        )

    def open_bytes(self, name: str, data: bytes) -> str:
        """Test/driver hook: open an in-memory document."""
        if name in self._docs:
            raise CmdError("'%s' already open" % name)
        self._docs[name] = PdfDocument(data)
        self._sizes[name] = len(data)
        return "opened %s (%d bytes)" % (name, len(data))

    def close(self, name: str) -> str:
        name = name.strip()
        if self._pwd and self._pwd[0] == name:
            self._pwd = []
        if name not in self._docs:
            raise CmdError("File '%s' not found, cannot close it" % name)
        del self._docs[name]
        del self._sizes[name]
        return "closed %s" % name

    # -- navigation ---------------------------------------------------------

    def _doc(self) -> PdfDocument:
        return self._docs[self._pwd[0]]

    def _here(self):
        """Value at the top of the pwd stack."""
        if len(self._pwd) <= 1:
            return None
        return self._pwd[-1][1]

    def pwd(self) -> str:
        if not self._pwd:
            return "/"
        return "/" + "/".join(
            [self._pwd[0]] + [label for label, _v in self._pwd[1:]]
        )

    def cd(self, line: str) -> str:
        line = line.strip()
        if line in ("", "/"):
            self._pwd = []
            return ""
        if line.startswith("/"):  # absolute path: reset, then walk
            self._pwd = []
            line = line.lstrip("/")
        for part in line.rstrip("/").split("/"):
            self._cd_one(part)
        return ""

    def _cd_one(self, part: str) -> None:
        if part in ("", "."):
            return
        if part == "..":
            if self._pwd:
                self._pwd.pop()
            return
        if not self._pwd:
            if part not in self._docs:
                raise CmdError(
                    "File '%s' not opened, open it first to use it" % part
                )
            self._pwd.append(part)
            return
        if len(self._pwd) == 1:
            doc = self._doc()
            top = part.lower()
            if top == "catalog":
                self._pwd.append(("catalog", doc.catalog()))
            elif top == "trailer":
                self._pwd.append(("trailer", doc.trailer))
            elif top == "xref":
                self._pwd.append(("xref", doc.objmap))
            elif top == "pages":
                self._pwd.append(("pages", doc.pages()))
            else:
                raise CmdError("No PDF root level of '%s'" % part)
            return
        here = self._resolved_here()
        if isinstance(here, StreamObj):
            low = part.lower()
            if low == "dict":
                self._pwd.append(("dict", here.dict))
            elif low in ("stream", "streamraw"):
                self._pwd.append((low, here))
            else:
                raise CmdError("Stream has no property '%s'" % part)
            return
        if isinstance(here, list):
            try:
                idx = int(part)
            except ValueError:
                raise CmdError("'%s' is not an array index" % part)
            if not (0 <= idx < len(here)):
                raise CmdError("index %d out of range (0..%d)"
                               % (idx, len(here) - 1))
            self._pwd.append(("[%d]" % idx, self._doc().resolve(here[idx])))
            return
        if isinstance(here, dict):
            if part not in here:
                raise CmdError("Object does not have property '%s'" % part)
            self._pwd.append((part, self._doc().resolve(here[part])))
            return
        raise CmdError("Cannot cd into a %s" % _type_name(here))

    def _resolved_here(self):
        here = self._here()
        if isinstance(here, Ref):
            return self._doc().resolve(here)
        return here

    # -- listing / display ---------------------------------------------------

    def ls(self) -> str:
        if not self._pwd:
            lines = ["total %d" % len(self._docs)]
            for name in sorted(self._docs):
                lines.append("%-30s %d bytes" % (name, self._sizes[name]))
            return "\n".join(lines)
        if len(self._pwd) == 1:
            return "\n".join(["catalog", "trailer", "xref", "pages"])
        here = self._resolved_here()
        if len(self._pwd) == 2 and self._pwd[1][0] == "xref":
            lines = ["total %d objects" % len(here)]
            for (objid, gen), loc in sorted(here.items()):
                where = (
                    "offset %d" % loc if isinstance(loc, int)
                    else "objstm %d[%d]" % (loc[1], loc[2])
                )
                lines.append("%5d %5d  %s" % (objid, gen, where))
            return "\n".join(lines)
        if isinstance(here, StreamObj):
            return "\n".join(
                ["dict", "stream (%d bytes decoded)" % len(here.data),
                 "streamraw (%d bytes raw)" % len(here.raw)]
            )
        if isinstance(here, dict):
            lines = []
            for k in here:
                v = here[k]
                lines.append("%-20s %-12s %s"
                             % (k, _type_name(v), _preview(v)))
            return "\n".join(lines)
        if isinstance(here, list):
            lines = []
            for i, v in enumerate(here):
                lines.append("[%3d] %-12s %s" % (i, _type_name(v), _preview(v)))
            return "\n".join(lines)
        return "%s %s" % (_type_name(here), _preview(here, 200))

    def cat(self) -> str:
        here = self._resolved_here()
        if here is None:
            raise CmdError("Nothing to cat at %s" % self.pwd())
        if isinstance(here, StreamObj):
            label = self._pwd[-1][0]
            data = here.raw if label == "streamraw" else here.data
            try:
                return data.decode("latin-1")
            except Exception:  # pragma: no cover - latin-1 can't fail
                return repr(data)
        return repr(here)

    def text(self, line: str) -> str:
        """Beyond-reference convenience: extracted text of the current file
        (optionally one 0-based page), through the SAME engine the Spark
        pipeline runs."""
        if not self._pwd:
            raise CmdError("cd into a file first")
        from ..core.extract import extract_document

        r = extract_document(self._docs[self._pwd[0]].data)
        if line.strip():
            idx = int(line.strip())
            if not (0 <= idx < len(r.pages)):
                raise CmdError("page %d out of range (0..%d)"
                               % (idx, len(r.pages) - 1))
            return r.pages[idx]
        return "\f".join(r.pages)

    def prompt(self) -> str:
        if not self._pwd:
            return "/ $ "
        return "%s $ " % (
            self._pwd[-1][0] if len(self._pwd) > 1 else self._pwd[0]
        )


def run_line(state: BrowserState, line: str) -> str:
    """Dispatch one command line; returns the text to print."""
    line = line.strip()
    if not line or line.startswith("#"):
        return ""
    cmd, _, rest = line.partition(" ")
    cmd = cmd.lower()
    try:
        if cmd == "open":
            return state.open(rest)
        if cmd == "close":
            return state.close(rest)
        if cmd == "ls":
            return state.ls()
        if cmd == "cd":
            return state.cd(rest)
        if cmd == "pwd":
            return state.pwd()
        if cmd == "cat":
            return state.cat()
        if cmd == "text":
            return state.text(rest)
        if cmd in ("quit", "exit"):
            raise EOFError
        if cmd == "help":
            return ("commands: open <f> | close <f> | ls | cd <path> | "
                    "pwd | cat | text [page] | quit")
        raise CmdError("Unknown command '%s' (try help)" % cmd)
    except CmdError as e:
        return "error: %s" % e


def run_commands(lines, state: BrowserState | None = None) -> list[str]:
    """Scripted driver: run commands, return per-command outputs."""
    state = state or BrowserState()
    out = []
    for line in lines:
        try:
            out.append(run_line(state, line))
        except EOFError:
            break
    return out


def main() -> None:  # pragma: no cover - interactive
    import sys

    state = BrowserState()
    for path in sys.argv[1:]:
        print(run_line(state, "open %s" % path))
    while True:
        try:
            line = input(state.prompt())
        except EOFError:
            break
        try:
            out = run_line(state, line)
        except EOFError:
            break
        if out:
            print(out)


if __name__ == "__main__":  # pragma: no cover
    main()
