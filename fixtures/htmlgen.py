"""Deterministic HTML fixtures (FIXTURES.md §3). No reference analog; the
HTML extractor's goldens are frozen from our own deterministic output and
act as regression pins."""

from __future__ import annotations


def h01_article() -> bytes:
    return b"""<!DOCTYPE html>
<html><head><title>Ignored title tag</title>
<style>body { color: red }</style>
<script>var tracking = "evil";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<header><h1>Site Banner Not Kept? Actually headings are kept</h1></header>
<article>
<h2>The Actual Headline</h2>
<p>This is the first paragraph of the main article content, which is
long enough to pass the minimum block length heuristic.</p>
<p>A second paragraph with more meaningful prose content that should
also be preserved by the extractor.</p>
</article>
<aside>Related links and other boilerplate live here.</aside>
<footer>Copyright 2026 Example Corp. All rights reserved.</footer>
</body></html>"""


def h02_linkfarm() -> bytes:
    return b"""<html><body>
<div><a href="/1">Link one</a> <a href="/2">Link two</a> <a href="/3">Link
three</a> <a href="/4">Link four</a> <a href="/5">Link five</a></div>
<div>This prose block carries genuine sentence content with no links at
all and therefore must be kept in the extraction output.</div>
<div>Short <a href="/x">mostly link text here honestly</a></div>
</body></html>"""


def h03_entities() -> bytes:
    return b"""<html><body>
<p>Entities: &amp; &lt;tag&gt; &quot;quoted&quot; &#8212; em&nbsp;dash and
caf&eacute; visits r&eacute;sum&eacute;s.</p>
<p>Nested <b>bold <i>italic</i></b> inline tags   with
   irregular      whitespace.</p>
</body></html>"""


def h04_malformed() -> bytes:
    return b"""<html><body>
<p>Unclosed paragraph with enough text to be kept by the extractor
<div>Stray close tags follow</div></span></div>
<p>Another paragraph that never closes either but is long enough to keep
<totallyboguselement attr=>bogus element text inside a long enough block</p>
</body>"""


def h05_tables_comments() -> bytes:
    return b"""<html><body>
<!-- navigation comment that must never appear -->
<table><tr><th>Quarter</th><th>Revenue figure</th></tr>
<tr><td>Q1 period total</td><td>1.2M in sales for the quarter</td></tr>
<tr><td>Q2 period total</td><td>1.9M in sales for the quarter</td></tr></table>
<p>Table context paragraph explaining the quarterly revenue trend in
enough prose to clear the retention threshold.</p>
<!--[if IE]>conditional comment junk<![endif]-->
</body></html>"""


def h06_utf16() -> bytes:
    text = ("<html><body><p>UTF-16 encoded body with café and "
            "ümlaut prose long enough to keep for the block "
            "heuristic.</p></body></html>")
    return b"\xff\xfe" + text.encode("utf-16-le")


def h07_deep_lists() -> bytes:
    return b"""<html><body>
<ul><li>First top-level bullet carrying a full sentence of real content.
<ul><li>Nested bullet with another complete sentence of prose inside.</li>
<li><a href="/x">tiny link</a></li></ul></li>
<li>Second top-level bullet also long enough to be retained.</li></ul>
<dl><dt>Term</dt><dd>A definition sentence with sufficient length to
clear the minimum block size.</dd></dl>
<img src="banner.png"/><hr/>
<p>Closing paragraph after the self-closing void elements above.</p>
</body></html>"""


def h08_script_in_body() -> bytes:
    return b"""<html><head>
<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">
</head><body>
<p>Opening paragraph with enough words to clear the keep threshold
easily.</p>
<script type="text/javascript">document.write("<p>injected junk</p>");
var long_string_that_must_not_leak = "boilerplate boilerplate";</script>
<div>Mid-document prose block that follows an inline script tag and must
be preserved intact.</div>
<style>.mid { display: none }</style>
<p>Final paragraph following an inline style block in the body.</p>
</body></html>"""


FIXTURES = {
    "h01_article": h01_article,
    "h02_linkfarm": h02_linkfarm,
    "h03_entities": h03_entities,
    "h04_malformed": h04_malformed,
    "h05_tables_comments": h05_tables_comments,
    "h06_utf16": h06_utf16,
    "h07_deep_lists": h07_deep_lists,
    "h08_script_in_body": h08_script_in_body,
}


def build_all() -> dict[str, bytes]:
    return {name: fn() for name, fn in FIXTURES.items()}
