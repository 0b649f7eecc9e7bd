"""Differential fuzz: deterministic byte mutations of every fixture PDF,
run through the REFERENCE and our engine, comparing extracted pages
byte-for-byte (doc-level raise in the reference == pages [] + error here).

This sweeps the parity surface far beyond the hand-built fixtures: every
mutation lands somewhere different (xref offsets, stream bytes, dict
keys, content operators), and any behavioral divergence shows up as a
page-text mismatch.

Usage: python tools/diff_fuzz.py [--mutations N]
Prints one line per MISMATCH and a summary; exit 0 iff none.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools", "ply_shim"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, REPO)


def mutations(data: bytes, name: str = "", deep: int = 1):
    """Deterministic, position-diverse mutations of one document.  The
    hashpos family derives extra positions from md5(fixture name) so
    every fixture also gets scattered, fixture-specific hits.  ``deep``
    multiplies the hash-scattered families (one-off deep sweeps)."""
    import hashlib

    n = len(data)
    for k in range(8 * deep):
        h = hashlib.md5(("%s:%d" % (name, k)).encode()).digest()
        pos = int.from_bytes(h[:4], "big") % n
        kind = h[4] % 3
        if kind == 0:
            yield "hx%d_flip@%d" % (k, pos), (
                data[:pos] + bytes([data[pos] ^ 0x80]) + data[pos + 1:])
        elif kind == 1:
            yield "hx%d_zero@%d" % (k, pos), (
                data[:pos] + b"\x00" + data[pos + 1:])
        else:
            yield "hx%d_del@%d" % (k, pos), data[:pos] + data[pos + 1:]
    yield "trunc50", data[: n // 2]
    yield "trunc75", data[: int(n * 0.75)]
    yield "trunc95", data[: int(n * 0.95)]
    yield "zero5", data[: n // 5] + b"\x00" + data[n // 5 + 1 :]
    yield "zero3", data[: n // 3] + b"\x00" + data[n // 3 + 1 :]
    yield "zero23", data[: 2 * n // 3] + b"\x00" + data[2 * n // 3 + 1 :]
    yield "flip4", data[: n // 4] + bytes([data[n // 4] ^ 0x80]) + data[n // 4 + 1 :]
    yield "flip2", data[: n // 2] + bytes([data[n // 2] ^ 0x80]) + data[n // 2 + 1 :]
    yield "flip34", (data[: 3 * n // 4]
                     + bytes([data[3 * n // 4] ^ 0x80]) + data[3 * n // 4 + 1 :])
    yield "del_mid", data[: n // 2] + data[n // 2 + 1 :]
    yield "dup_mid", data[: n // 2] + data[n // 2 : n // 2 + 1] + data[n // 2 :]
    yield "ins_A", data[: n // 3] + b"A" + data[n // 3 :]
    yield "flip8", data[: n // 8] + bytes([data[n // 8] ^ 0x80]) + data[n // 8 + 1 :]
    yield "flip78", (data[: 7 * n // 8]
                     + bytes([data[7 * n // 8] ^ 0x80]) + data[7 * n // 8 + 1 :])
    yield "zero6", data[: n // 6] + b"\x00" + data[n // 6 + 1 :]
    yield "zero56", data[: 5 * n // 6] + b"\x00" + data[5 * n // 6 + 1 :]
    yield "del_q", data[: n // 4] + data[n // 4 + 1 :]
    yield "dup_3q", (data[: 3 * n // 4]
                     + data[3 * n // 4 : 3 * n // 4 + 1] + data[3 * n // 4 :])
    # r05: COMMENT tokens are positional in the reference (returned by
    # t_COMMENT, consumed by positional Convert/consolidation) and
    # unicode-whitespace bytes are stripped by some line readers but
    # lexer-fatal elsewhere — scatter comment/NBSP insertions so every
    # consumption context gets hit across the corpus.
    for k in range(3 * deep):
        h = hashlib.md5(("cmt:%s:%d" % (name, k)).encode()).digest()
        pos = int.from_bytes(h[:4], "big") % n
        yield "cmt%d_ins@%d" % (k, pos), data[:pos] + b"% c\n" + data[pos:]
    for k in range(2 * deep):
        h = hashlib.md5(("nbsp:%s:%d" % (name, k)).encode()).digest()
        pos = int.from_bytes(h[:4], "big") % n
        yield "nbsp%d_ins@%d" % (k, pos), data[:pos] + b"\xa0" + data[pos:]
    # fixed-position comment insertions at structural thirds
    yield "cmt_3", data[: n // 3] + b"% x\n" + data[n // 3 :]
    yield "cmt_23", data[: 2 * n // 3] + b"% x\n" + data[2 * n // 3 :]
    # bare-CR insertions: the reference's line readers end lines at \r
    # too (betterfile; r05 f169-f171), so a stray CR splits lines there
    # but is plain whitespace to the lexers
    for k in range(2 * deep):
        h = hashlib.md5(("cr:%s:%d" % (name, k)).encode()).digest()
        pos = int.from_bytes(h[:4], "big") % n
        yield "cr%d_ins@%d" % (k, pos), data[:pos] + b"\r" + data[pos:]


class _RefTimeout(Exception):
    pass


def run_reference(path: str, timeout_s: int = 10):
    """(pages list, doc_failed, hung) from the reference.

    The reference can loop FOREVER on some corrupt inputs (e.g. its
    backward startxref line scan); we cannot and should not mirror a
    hang — a mutant that hangs the reference is accepted as parity as
    long as OUR engine extracts no text from it (typed error instead)."""
    import signal

    import pypdfproc

    def _alarm(_s, _f):
        raise _RefTimeout()

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout_s)
    try:
        doc = pypdfproc.PDF(path)
        return doc.GetFullText(), False, False
    except _RefTimeout:
        return [], True, True
    except Exception:
        return [], True, False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", nargs="*", default=None)
    ap.add_argument("--deep", type=int, default=1,
                    help="multiply the hash-scattered mutation families")
    args = ap.parse_args()

    from fixtures.pdfgen import build_all
    from pypdfproc_spark.core.extract import extract_document

    fixtures = build_all()
    names = args.fixtures or sorted(fixtures)
    tmp = tempfile.mkdtemp(prefix="diff_fuzz_")
    total = 0
    mismatches = 0
    for name in names:
        base = fixtures[name]
        for mname, data in mutations(base, name, deep=args.deep):
            total += 1
            p = os.path.join(tmp, "%s__%s.pdf" % (name, mname))
            with open(p, "wb") as fh:
                fh.write(data)
            ref_pages, ref_doc_failed, ref_hung = run_reference(p)
            r = extract_document(data)
            ours_doc_failed = r.error is not None and not r.pages and \
                r.n_pages == 0
            if ref_hung:
                # accepted delta: the reference loops forever; we fail
                # fast with a typed error and must produce NO text
                ok = not r.pages
            elif r.parser != "pdf":
                # the magic-byte router sent this mutant to the HTML path
                # (a DESIGNED delta: the reference is a PDF-only library
                # with no router, while the north rule requires an HTML
                # fallback).  The parity claim for these is only that the
                # reference cannot extract text from it either.
                ok = ref_doc_failed
            else:
                ok = (r.pages == ref_pages)
            # doc-level classification: both yield pages==[], so the text
            # compare is the gate; classification shown for diagnosis only
            if not ok:
                mismatches += 1
                print("MISMATCH %s %s: ref=%r(%s) ours=%r(%s err=%r)" % (
                    name, mname, ref_pages[:2],
                    "DOCFAIL" if ref_doc_failed else "ok",
                    r.pages[:2],
                    "DOCFAIL" if ours_doc_failed else "ok",
                    str(r.error)[:60]))
    print("diff_fuzz: %d mutations, %d mismatches" % (total, mismatches))
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
