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


def mutations(data: bytes):
    """Deterministic, position-diverse mutations of one document."""
    n = len(data)
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


def run_reference(path: str):
    """(pages list, doc_failed) from the reference."""
    import pypdfproc

    try:
        doc = pypdfproc.PDF(path)
        return doc.GetFullText(), False
    except Exception:
        return [], True
    except BaseException:  # RecursionError subclasses land here on 3.11? no
        return [], True


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", nargs="*", default=None)
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
        for mname, data in mutations(base):
            total += 1
            p = os.path.join(tmp, "%s__%s.pdf" % (name, mname))
            with open(p, "wb") as fh:
                fh.write(data)
            ref_pages, ref_doc_failed = run_reference(p)
            r = extract_document(data)
            ours_doc_failed = r.error is not None and not r.pages and \
                r.n_pages == 0
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
