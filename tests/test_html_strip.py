from __future__ import annotations

from document_extraction_spark.core.html_strip import html_strip_one


def test_boilerplate_dropped_content_kept():
    html = (
        "<html><body>"
        "<nav><a href='/a'>home</a> <a href='/b'>about</a></nav>"
        "<header><span>my site</span></header>"
        "<article><h1>Heading Words</h1>"
        "<p>This is the first real content paragraph of the document.</p>"
        "<p>And a second content paragraph with plenty of characters in it.</p>"
        "</article>"
        "<div><a href='#x'>rel one</a> <a href='#y'>rel two</a> <a href='#z'>rel three</a></div>"
        "<aside>short promo</aside>"
        "<footer><a href='/a'>home</a></footer>"
        "</body></html>"
    )
    kept, n_kept, n_dropped, failed = html_strip_one(html)
    assert not failed
    joined = "\n\n".join(kept)
    assert "first real content paragraph" in joined
    assert "second content paragraph" in joined
    assert "Heading Words" in joined
    assert "home" not in joined          # nav/footer links gone
    assert "rel one" not in joined       # link farm: link density > 0.33
    assert "short promo" not in joined   # aside
    assert "my site" not in joined       # header
    assert n_kept == 3
    assert n_dropped >= 4


def test_script_style_ignored():
    html = "<body><script>var x = 1;</script><style>p{}</style><p>visible body text here</p></body>"
    kept, n_kept, _, _ = html_strip_one(html)
    assert kept == ["visible body text here"]


def test_short_non_heading_dropped_heading_kept():
    kept, n_kept, n_dropped, _ = html_strip_one("<p>tiny</p><h2>Tiny Head</h2>")
    assert kept == ["Tiny Head"]
    assert n_dropped == 1


def test_unclosed_html_degrades_deterministically():
    kept, n_kept, n_dropped, failed = html_strip_one("<div><p>unclosed paragraph drifting")
    assert not failed
    assert kept == ["unclosed paragraph drifting"]


def test_empty_blocks_not_counted():
    kept, n_kept, n_dropped, failed = html_strip_one("<p></p><div> </div>")
    assert kept == [] and n_kept == 0 and n_dropped == 0 and not failed
