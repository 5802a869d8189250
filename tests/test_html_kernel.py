"""HTML boilerplate-strip kernel: block scoring, link density, image
positioning, entity decoding, tolerance to malformed markup."""

from pdf_parser_ray.html import extract_main_content


ARTICLE = """<!DOCTYPE html><html><head><title>Site</title>
<style>p{color:red}</style><script>var x=1;</script></head>
<body><header><h1>Site Header</h1>
<nav><a href="/">Home</a> <a href="/a">About</a></nav></header>
<div class="content"><h1>A Fine Long Heading</h1>
<p>First paragraph with quite enough characters to pass the minimum length gate easily.</p>
<img src="media://d/5">
<p>Second paragraph also containing a sufficient number of characters for the gate.</p>
<p>Short.</p></div>
<aside><p>Sidebar content long enough to be a block but inside an aside container here.</p></aside>
<footer><p>Copyright notice long enough to be a text block but inside the footer tag.</p></footer>
</body></html>"""


class TestMainContent:
    def test_boilerplate_stripped(self):
        spans = [s for s in extract_main_content(ARTICLE)]
        texts = [s.text for s in spans if s.kind == "text"]
        assert "A Fine Long Heading" in texts
        assert any(t.startswith("First paragraph") for t in texts)
        assert any(t.startswith("Second paragraph") for t in texts)
        joined = " ".join(texts)
        for boiler in ("Site Header", "Home", "Sidebar", "Copyright", "var x=1"):
            assert boiler not in joined

    def test_short_block_dropped(self):
        texts = [s.text for s in extract_main_content(ARTICLE)]
        assert "Short." not in texts

    def test_image_position_preserved(self):
        spans = extract_main_content(ARTICLE)
        kinds = [s.kind for s in spans]
        img_idx = kinds.index("image")
        assert spans[img_idx].media_ref == "media://d/5"
        # image sits between the two kept paragraphs
        assert spans[img_idx - 1].text.startswith("First paragraph")
        assert spans[img_idx + 1].text.startswith("Second paragraph")

    def test_link_farm_empty(self):
        page = "<body><div>" + " ".join(
            f'<a href="/p{i}">Link number {i} right here</a>' for i in range(30)
        ) + "</div></body>"
        assert extract_main_content(page) == []

    def test_entities_decoded(self):
        page = ("<body><p>Ben &amp; Jerry &lt;3 ice cream &#8212; truly the best dessert"
                " &quot;ever&quot; made.</p></body>")
        spans = extract_main_content(page)
        assert spans[0].text == 'Ben & Jerry <3 ice cream — truly the best dessert "ever" made.'

    def test_malformed_tolerated(self):
        page = ("<body><p>Unclosed paragraph long enough to be kept by the scorer "
                "despite missing closers<div><p>Another kept block of sufficient "
                "length following the unclosed one")
        texts = [s.text for s in extract_main_content(page)]
        assert len(texts) == 2

    def test_whitespace_normalized(self):
        page = "<body><p>many     spaces\n\nand\tnewlines collapse into single spaces here</p></body>"
        spans = extract_main_content(page)
        assert "  " not in spans[0].text

    def test_script_style_content_never_leaks(self):
        page = ("<body><script>var secret = 'should never appear in extracted text';"
                "</script><p>Visible paragraph long enough to pass the length gate "
                "for keeping.</p></body>")
        joined = " ".join(s.text for s in extract_main_content(page))
        assert "secret" not in joined

    def test_deterministic(self):
        assert [ (s.kind, s.text, s.media_ref) for s in extract_main_content(ARTICLE)] == \
               [ (s.kind, s.text, s.media_ref) for s in extract_main_content(ARTICLE)]


class TestEntityEdgeCases:
    def test_oversized_numeric_entity(self):
        page = ("<body><p>Entity bomb &#99999999999; inside a paragraph long "
                "enough to be kept here today.</p></body>")
        spans = extract_main_content(page)
        assert len(spans) == 1  # no crash; entity replaced or left verbatim

    def test_surrogate_entity_sanitized(self):
        # a lone surrogate would make the span un-encodable as UTF-8
        page = ("<body><p>Surrogate &#xD800; in a paragraph long enough to be "
                "kept by the scorer today.</p></body>")
        spans = extract_main_content(page)
        assert "\ud800" not in spans[0].text
        spans[0].text.encode("utf-8")  # must not raise

    def test_max_codepoint_ok(self):
        page = ("<body><p>Max &#x10FFFF; codepoint in a sufficiently long "
                "paragraph for keeping around.</p></body>")
        spans = extract_main_content(page)
        assert "\U0010ffff" in spans[0].text


class TestExtractMetadata:
    def test_title_description_canonical(self):
        from pdf_parser_ray.html.extract import extract_metadata

        html = ("<html><head><title> My&nbsp;Page &mdash; Home </title>"
                "<meta name='Description' content='A &amp; B site'>"
                "<link rel='canonical' href='http://e.com/a'>"
                "</head><body><title>not this</title></body></html>")
        m = extract_metadata(html)
        assert m["title"] == "My Page — Home"
        assert m["description"] == "A & B site"
        assert m["canonical"] == "http://e.com/a"

    def test_missing_fields_and_body_stop(self):
        from pdf_parser_ray.html.extract import extract_metadata

        m = extract_metadata("<body><meta name='description' content='x'>")
        assert m == {"title": "", "description": "", "canonical": ""}
        assert extract_metadata("") == {"title": "", "description": "",
                                        "canonical": ""}

    def test_unclosed_title_and_comments(self):
        from pdf_parser_ray.html.extract import extract_metadata

        m = extract_metadata("<!-- <title>no</title> --><title>Real")
        assert m["title"] == "Real"

    def test_script_and_style_bodies_skipped(self):
        from pdf_parser_ray.html.extract import extract_metadata

        html = ("<head><script>var x = \"<title>FAKE</title>\";</script>"
                "<style>/* <title>css</title> */</style>"
                "<title>Real Title</title></head>")
        assert extract_metadata(html)["title"] == "Real Title"
