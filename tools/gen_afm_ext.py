"""Generate pypdfproc_spark/data/std14_ext.json — the extended AFM data
model (char metrics incl. bounding boxes, ligatures, kerning pairs) behind
core.afm's accessor layer (reference fontmetrics.py:119-292).

Parses the 14 standard-font AFM files from the reference's
StandardFonts_AFM.zip with a from-scratch line parser (public Adobe AFM 4.1
spec), then exports the REFERENCE-VISIBLE view, mirroring two parse quirks
of the reference loader (parser/__init__.py:1188-1208):

1. drop-last-record: the reference commits a char metric only when the NEXT
   ``C`` token arrives, so the final record of every file (always the
   unencoded ``Euro``) never lands in CharMetrics.  Invisible to width
   synthesis (C is -1) but visible through GetCharacter — mirrored.
2. off-by-one ligature base: an ``L`` record is attributed to ``lastchar``,
   the PREVIOUSLY committed char metric, not the char on whose line it
   appears (e.g. Times-Roman's "f" line carries "L i fi", but the reference
   stores base = the record before "f").  Mirrored verbatim.

As a differential gate, the script ALSO loads the actual reference parser
(via tools/ply_shim) and asserts the exported view matches its CharMetrics/
Ligatures/Kerning exactly before writing.

Usage: python tools/gen_afm_ext.py
"""

from __future__ import annotations

import json
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP_PATH = "/root/reference/pypdfproc/StandardFonts_AFM.zip"
OUT_PATH = os.path.join(REPO, "pypdfproc_spark", "data", "std14_ext.json")


def _num(s: str):
    return float(s) if "." in s else int(s)


def parse_afm(txt: str) -> dict:
    """From-scratch AFM parse -> file-order char records + ligatures + kerns
    (spec-faithful; the reference-view quirks are applied afterwards)."""
    records = []  # [{'N','C','WX','B','L':[(succ,lig)...]}] in file order
    kerns = []  # [(c1, c2, dx)] in file order
    in_chars = in_kerns = False
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("StartCharMetrics"):
            in_chars = True
            continue
        if line.startswith("EndCharMetrics"):
            in_chars = False
            continue
        if line.startswith("StartKernPairs"):
            in_kerns = True
            continue
        if line.startswith("EndKernPairs"):
            in_kerns = False
            continue
        if in_chars and line.startswith("C "):
            rec = {"L": []}
            for part in line.split(";"):
                part = part.strip()
                if not part:
                    continue
                key, _, rest = part.partition(" ")
                rest = rest.strip()
                if key == "C":
                    rec["C"] = int(rest)
                elif key == "WX":
                    rec["WX"] = _num(rest)
                elif key == "N":
                    rec["N"] = rest
                elif key == "B":
                    rec["B"] = [int(x) for x in rest.split()]
                elif key == "L":
                    succ, lig = rest.split()
                    rec["L"].append((succ, lig))
            records.append(rec)
        elif in_kerns and line.startswith("KPX "):
            _, c1, c2, dx = line.split()
            kerns.append((c1, c2, int(dx)))
    return {"records": records, "kerns": kerns}


def reference_view(parsed: dict) -> dict:
    """Apply the reference loader's quirks (module docstring) to the
    spec-faithful parse."""
    records = parsed["records"]
    chars = {}
    ligatures = []
    for i, rec in enumerate(records):
        for succ, lig in rec["L"]:
            base = records[i - 1]["N"] if i > 0 else None
            ligatures.append([base, succ, lig])
        if i < len(records) - 1:  # drop-last-record quirk
            chars[rec["N"]] = [rec["C"], rec["WX"]] + rec["B"]
    kern = [[c1, c2, dx] for c1, c2, dx in parsed["kerns"]]
    return {"chars": chars, "ligatures": ligatures, "kern": kern}


def check_against_reference(fontname: str, txt: str, view: dict) -> None:
    """Differential gate: the exported view must equal the actual reference
    parser's output field-for-field."""
    sys.path.insert(0, os.path.join(REPO, "tools", "ply_shim"))
    sys.path.insert(0, "/root/reference")
    from pypdfproc.fontmetrics import FontMetricsData_String

    ref = FontMetricsData_String(txt)
    ref_chars = {
        n: [v["C"], v["W"][0]] + v["B"] for n, v in ref.CharMetrics.items()
    }
    assert view["chars"] == ref_chars, fontname
    ref_ligs = [
        [l["base"]["N"] if l["base"] else None, l["successor"], l["ligature"]]
        for l in ref.Ligatures
    ]
    assert view["ligatures"] == ref_ligs, fontname
    ref_kern = {(c1, c2): v for (c1, c2), v in ref.Kerning["Pairs"].items()}
    mine_kern = {(c1, c2): (dx, 0) for c1, c2, dx in view["kern"]}
    assert mine_kern == ref_kern, fontname


def main() -> None:
    z = zipfile.ZipFile(ZIP_PATH)
    out = {}
    for name in sorted(z.namelist()):
        font = name[: -len(".afm")]
        txt = z.read(name).decode("latin-1")
        view = reference_view(parse_afm(txt))
        check_against_reference(font, txt, view)
        out[font] = view
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, separators=(",", ":"))
    n_lig = sum(len(v["ligatures"]) for v in out.values())
    n_kern = sum(len(v["kern"]) for v in out.values())
    print("wrote %s: %d fonts, %d ligatures, %d kern pairs (reference-"
          "verified)" % (OUT_PATH, len(out), n_lig, n_kern))


if __name__ == "__main__":
    main()
