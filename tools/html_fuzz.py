"""HTML-path mutation fuzz (VERDICT r04 item 3).

`tools/diff_fuzz.py` sweeps the PDF parity surface differentially; the
HTML extractor has no reference engine, so its fuzz claim is different:

1. **never-crash**: `extract_document` must return a typed result for
   EVERY mutant (the Arrow UDF contract — one hostile capture must never
   kill a batch); an uncaught exception is a failure.
2. **determinism**: extracting the same mutant twice must give identical
   output (the resumable pipeline and all frozen goldens depend on it).
3. **boundary safety**: every emitted page string must survive utf-8
   encoding after the shared `utf8_safe` boundary rule (parquet/Arrow
   validity — mutants routinely create invalid byte sequences).

The mutation set is diff_fuzz's (33 deterministic mutations per fixture,
including comment/NBSP insertions — inert for HTML but they keep the two
sweeps aligned), applied to every h-fixture AND to the h-fixtures with
their DOCTYPE stripped (a second routing shape).

Usage: python tools/html_fuzz.py ; exit 0 iff no failures.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.diff_fuzz import mutations  # noqa: E402


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--deep", type=int, default=1)
    args = ap.parse_args()

    from fixtures.htmlgen import build_all
    from pypdfproc_spark.core.extract import extract_document, utf8_safe

    fixtures = dict(build_all())
    # second routing shape: DOCTYPE stripped
    for name, data in list(fixtures.items()):
        if data.lstrip().lower().startswith(b"<!doctype"):
            stripped = data.split(b">", 1)[1]
            fixtures[name + "_nodoctype"] = stripped

    total = 0
    failures = 0
    for name in sorted(fixtures):
        base = fixtures[name]
        for mname, data in mutations(base, name, deep=args.deep):
            total += 1
            try:
                r1 = extract_document(data)
                r2 = extract_document(data)
            except Exception as e:  # noqa: BLE001 — the claim under test
                failures += 1
                print("CRASH %s %s: %s: %s" % (name, mname,
                                               type(e).__name__, e))
                continue
            if (r1.pages, r1.parser, r1.error) != (r2.pages, r2.parser,
                                                   r2.error):
                failures += 1
                print("NONDETERMINISTIC %s %s" % (name, mname))
                continue
            try:
                for p in r1.pages:
                    utf8_safe(p).encode("utf-8")
            except Exception as e:  # noqa: BLE001
                failures += 1
                print("BOUNDARY %s %s: %s" % (name, mname, e))
    print("html_fuzz: %d mutations, %d failures" % (total, failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
