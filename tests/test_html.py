"""HTML extractor unit tests: boilerplate strip, charset sniffing,
malformed-input tolerance."""

from pypdfproc_spark.core.htmltext import decode_payload, extract_main_text

LONG = ("This block of prose is comfortably longer than the minimum block "
        "length heuristic requires for retention in the output.")


def test_strip_script_style_nav():
    html = ("<html><head><script>x()</script><style>a{}</style></head><body>"
            "<nav>home about contact and other navigation words</nav>"
            "<p>%s</p></body></html>" % LONG)
    out = extract_main_text(html.encode())
    assert out == LONG


def test_link_density_drops_linkfarms():
    html = ("<body><div><a href=x>one link</a> <a href=y>two link</a> "
            "<a href=z>three link</a></div><p>%s</p></body>" % LONG)
    out = extract_main_text(html.encode())
    assert "one link" not in out
    assert LONG in out


def test_headings_kept():
    html = "<body><h1>Title Words</h1><p>%s</p></body>" % LONG
    out = extract_main_text(html.encode())
    assert out.splitlines()[0] == "Title Words"


def test_entities_and_whitespace():
    html = "<body><p>a&amp;b   c\n\nd &eacute;%s</p></body>" % LONG
    out = extract_main_text(html.encode())
    assert out.startswith("a&b c d é")


def test_charset_meta_latin1():
    text = "café résumé " + LONG
    html = ('<html><head><meta charset="iso-8859-1"></head>'
            "<body><p>%s</p></body></html>" % text)
    out = extract_main_text(html.encode("latin-1"))
    assert "café résumé" in out


def test_charset_bom_utf8():
    html = "﻿<body><p>%s ümlaut</p></body>" % LONG
    out = extract_main_text(html.encode("utf-8-sig"))
    assert "ümlaut" in out


def test_decode_payload_unknown_charset_falls_back():
    payload = b'<meta charset="no-such-codec"><p>ok</p>'
    assert "ok" in decode_payload(payload)


def test_never_raises_on_garbage():
    for payload in (b"", b"\x00\xff" * 100, b"<" * 1000, b"</p>" * 500,
                    "\udcff".encode("utf-8", "surrogatepass")):
        extract_main_text(payload)  # must not raise
