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


FIXTURES = {
    "h01_article": h01_article,
    "h02_linkfarm": h02_linkfarm,
    "h03_entities": h03_entities,
    "h04_malformed": h04_malformed,
}


def build_all() -> dict[str, bytes]:
    return {name: fn() for name, fn in FIXTURES.items()}
