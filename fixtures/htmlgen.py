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


def h09_markup_in_attributes() -> bytes:
    """Markup-shaped strings inside attribute values must never leak into
    the text: onclick handlers with '<p>' literals, javascript: hrefs,
    unquoted attributes, and a '>' inside a quoted value."""
    return b"""<html><body>
<p onclick="if(x<1){document.write('<p>injected attr markup</p>')}">Real
paragraph text around a hostile onclick attribute, long enough to be
kept by the extractor.</p>
<a href="javascript:alert('<script>nope</script>')">tiny link</a>
<div title="a > b && b < c" data-x=unquoted>Prose following attributes
that contain angle brackets in quoted values stays intact.</div>
</body></html>"""


def h10_unclosed_script() -> bytes:
    """A <script> that never closes: html.parser switches to CDATA mode
    and swallows the rest of the document — the pinned behavior is that
    only the text BEFORE the script survives."""
    return b"""<html><body>
<p>Visible paragraph before the unterminated script element, long
enough to clear the keep threshold.</p>
<script>var everything_after_this_is_swallowed = true;
<p>This paragraph must NOT appear: it is inside script CDATA.</p>
</body></html>"""


def h11_deep_nested_boilerplate() -> bytes:
    """Drop-tags nested inside each other and inside kept containers, plus
    a 60-deep div nest: depth bookkeeping must survive interleaving, and
    stray close tags of drop-tags must not unbalance it."""
    deep_open = b"<div>" * 60
    deep_close = b"</div>" * 60
    return (
        b"<html><body>"
        b"<nav>top nav <footer>footer inside nav <aside>aside inside footer"
        b"</aside></footer> tail of nav</nav>"
        b"</footer></nav></aside>"  # stray closes with nothing open
        b"<p>Paragraph after stray close tags of drop elements, with "
        b"plenty of prose to retain in the output.</p>"
        + deep_open
        + b"<p>Deeply nested paragraph content that should still be "
          b"extracted despite sixty levels of div nesting.</p>"
        + deep_close
        + b"<header><div><nav>doubly wrapped boilerplate text</nav></div>"
          b"</header>"
        b"<p>Closing paragraph after the deep nest and the wrapped "
        b"header boilerplate block.</p>"
        b"</body></html>"
    )


def h12_empty_and_whitespace() -> bytes:
    """Empty body + whitespace-only and dropped-only content: the result
    must be the empty string (and the pipeline row must carry it as a
    value, not an error)."""
    return (b"<html><head><title>t</title></head><body>\n   \n"
            b"<nav>only boilerplate here</nav>"
            b"<p>   \t   </p><div><script>x()</script></div>"
            b"</body></html>")


def h13_invalid_bytes() -> bytes:
    """Declared utf-8 but carrying invalid sequences (dangling
    continuation, lone 0xFF, truncated multibyte at EOF): decode must
    use replacement characters deterministically, never raise."""
    return (b'<html><head><meta charset="utf-8"></head><body>'
            b"<p>Broken bytes \xc3 dangling and \xff lone follow this "
            b"sentence of valid prose kept by the extractor.</p>"
            b"<p>Truncated multibyte at the very end of the block \xe2\x82"
            b"</p></body></html>")


def h14_unclosed_comment_cdata() -> bytes:
    """Unterminated comment swallows the tail; CDATA sections and NUL
    bytes in text are handled without crashing."""
    return (b"<html><body>"
            b"<p>Paragraph with an embedded \x00 NUL byte inside prose "
            b"that is long enough to keep.</p>"
            b"<![CDATA[ raw cdata text ]]>"
            b"<p>Second paragraph before an unterminated comment, also "
            b"long enough to retain.</p>"
            b"<!-- this comment never closes <p>swallowed text</p>")


FIXTURES = {
    "h01_article": h01_article,
    "h02_linkfarm": h02_linkfarm,
    "h03_entities": h03_entities,
    "h04_malformed": h04_malformed,
    "h05_tables_comments": h05_tables_comments,
    "h06_utf16": h06_utf16,
    "h07_deep_lists": h07_deep_lists,
    "h08_script_in_body": h08_script_in_body,
    "h09_markup_in_attributes": h09_markup_in_attributes,
    "h10_unclosed_script": h10_unclosed_script,
    "h11_deep_nested_boilerplate": h11_deep_nested_boilerplate,
    "h12_empty_and_whitespace": h12_empty_and_whitespace,
    "h13_invalid_bytes": h13_invalid_bytes,
    "h14_unclosed_comment_cdata": h14_unclosed_comment_cdata,
}


def build_all() -> dict[str, bytes]:
    return {name: fn() for name, fn in FIXTURES.items()}
