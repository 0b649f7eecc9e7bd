"""Object-graph inspection CLI — the analog of the reference's PDFCmd
browser (S12, __init__.py:821-1218), reshaped for a batch engine: instead of
an interactive shell over one file, a one-shot dump of what the engine sees
in a payload (document structure, per-page text, metrics).

    python jobs/inspect_pdf.py <file.pdf> [--objects] [--events]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypdfproc_spark.core.cos import PdfDocument, Ref, StreamObj
from pypdfproc_spark.core.extract import extract_document


def _fmt(v, depth=0):
    if isinstance(v, Ref):
        return "%d %d R" % (v.objid, v.gen)
    if isinstance(v, StreamObj):
        return "<stream %d bytes, dict=%s>" % (len(v.raw), _fmt(v.dict, depth + 1))
    if isinstance(v, dict):
        if depth > 2:
            return "{...}"
        return "{" + ", ".join(
            "/%s: %s" % (k, _fmt(x, depth + 1)) for k, x in v.items()
        ) + "}"
    if isinstance(v, list):
        if depth > 2:
            return "[...]"
        return "[" + ", ".join(_fmt(x, depth + 1) for x in v) + "]"
    return repr(v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--objects", action="store_true",
                    help="dump every object in the xref map")
    ap.add_argument("--events", action="store_true",
                    help="dump the render event stream per page")
    args = ap.parse_args()
    payload = open(args.path, "rb").read()

    res = extract_document(payload)
    print("parser=%s n_pages=%d dropped=%d decode_failures=%d fallbacks=%d"
          % (res.parser, res.n_pages, res.pages_dropped,
             res.decode_failures, res.fallbacks))
    if res.error:
        print("error: %s" % res.error)

    if res.parser == "pdf" and (args.objects or args.events):
        doc = PdfDocument(payload)
        if args.objects:
            print("\n== objects (%d in xref) ==" % len(doc.objmap))
            for (objid, gen) in sorted(doc.objmap):
                try:
                    v = doc.get(Ref(objid, gen))
                    print("%4d %d: %s" % (objid, gen, _fmt(v)[:120]))
                except Exception as e:
                    print("%4d %d: <error: %s>" % (objid, gen, e))
        if args.events:
            from pypdfproc_spark.core.fonts import FontResolver
            from pypdfproc_spark.core.interp import PageInterpreter

            resolver = FontResolver(doc)
            stack: list = []
            for i, page in enumerate(doc.pages()):
                print("\n== page %d events ==" % i)
                interp = PageInterpreter(doc, resolver, stack)
                try:
                    resources = doc.resolve(page.get("Resources"))
                    stack.append(resources if isinstance(resources, dict) else {})
                    for ev in interp.run_page(page):
                        print("  %s" % (ev,))
                    stack.pop()
                except Exception as e:
                    print("  <page exception: %s>" % e)

    for i, text in enumerate(res.pages):
        print("\n== page %d text ==\n%s" % (i, text))


if __name__ == "__main__":
    main()
