"""URL canonicalization kernels (web-pipeline identity keys)."""

from pdf_parser_ray.functions.url import canonical_url, url_host


class TestCanonicalUrl:
    def test_case_port_fragment_query_order(self):
        variants = [
            "HTTP://Example.COM:80/a/b?z=2&a=1#frag",
            "http://example.com/a/b?a=1&z=2",
            "http://example.com./a/b?z=2&a=1",
        ]
        canon = {canonical_url(u) for u in variants}
        assert canon == {"http://example.com/a/b?a=1&z=2"}

    def test_https_default_port_and_empty_path(self):
        assert canonical_url("HTTPS://A.org:443") == "https://a.org/"
        assert canonical_url("https://a.org:8443/x") == "https://a.org:8443/x"

    def test_tracking_params_dropped_blank_kept(self):
        u = "http://e.com/p?utm_source=x&q=&fbclid=123&b=2"
        assert canonical_url(u) == "http://e.com/p?b=2&q="

    def test_credentials_preserved(self):
        assert canonical_url("http://u:pw@E.com/x") == "http://u:pw@e.com/x"

    def test_fail_soft_on_non_urls(self):
        assert canonical_url("not a url") == "not a url"
        assert canonical_url("") == ""
        assert canonical_url("  /relative/path ") == "/relative/path"

    def test_host_helper(self):
        assert url_host("HTTP://Example.COM.:8080/x") == "example.com"
        assert url_host("garbage") == ""


import pytest


@pytest.mark.usefixtures("ray_session")
class TestWarcUrlDedup:
    def test_crawl_variants_collapse(self, tmp_path):
        from pdf_parser_ray.sources.warc import (build_warc, dedup_warc_by_url,
                                                 read_warc)

        pages = [
            ("http://e.com/a?z=2&a=1", "<p>page A</p>"),
            ("HTTP://E.com:80/a?a=1&z=2#x", "<p>page A again</p>"),
            ("http://e.com/b", "<p>page B</p>"),
        ]
        p = tmp_path / "c.warc"
        p.write_bytes(build_warc(pages))
        survivors = dedup_warc_by_url(read_warc(str(p))).to_pandas()
        # two canonical URLs survive; min-id (lexicographic) per group
        assert len(survivors) == 2
        assert set(survivors["canonical"]) == {
            "http://e.com/a?a=1&z=2", "http://e.com/b"}


@pytest.mark.usefixtures("ray_session")
class TestWarcMetadata:
    def test_metadata_table_from_warc(self, tmp_path):
        from pdf_parser_ray.sources.warc import (build_warc, read_warc,
                                                 warc_metadata)

        pages = [
            ("http://e.com/a", "<head><title>Alpha</title>"
             "<link rel=canonical href='http://e.com/a'></head><p>x</p>"),
            ("http://e.com/b", "<p>no head at all</p>"),
        ]
        p = tmp_path / "m.warc"
        p.write_bytes(build_warc(pages))
        out = warc_metadata(read_warc(str(p))).to_pandas().set_index("doc_id")
        assert out.loc["http://e.com/a", "title"] == "Alpha"
        assert out.loc["http://e.com/a", "canonical"] == "http://e.com/a"
        assert out.loc["http://e.com/b", "title"] == ""


@pytest.mark.usefixtures("ray_session")
class TestRobotsFilter:
    def test_disallowed_urls_dropped(self, tmp_path):
        from pdf_parser_ray.sources.warc import (build_warc, read_warc,
                                                 robots_filter)

        pages = [
            ("http://e.com/private/x", "<p>secret</p>"),
            ("http://e.com/public/y", "<p>open</p>"),
            ("http://other.org/anything", "<p>no robots entry</p>"),
        ]
        p = tmp_path / "r.warc"
        p.write_bytes(build_warc(pages))
        robots = {"e.com": "User-agent: *\nDisallow: /private/\n"}
        out = robots_filter(read_warc(str(p)), robots).to_pandas()
        assert sorted(out["doc_id"]) == ["http://e.com/public/y",
                                        "http://other.org/anything"]


from hypothesis import given, settings, strategies as st


class TestCanonicalIdempotence:
    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=60))
    def test_canonical_is_idempotent_and_total(self, s):
        """canonical(canonical(u)) == canonical(u) for ARBITRARY input —
        the fixpoint property that makes it a safe dedup key — and it
        never raises."""
        once = canonical_url(s)
        assert canonical_url(once) == once

    @settings(max_examples=60, deadline=None)
    @given(st.sampled_from(["http", "https"]),
           st.from_regex(r"[a-z][a-z0-9.-]{0,12}", fullmatch=True),
           st.from_regex(r"(/[a-z0-9._~-]{0,6}){0,3}", fullmatch=True),
           st.lists(st.tuples(st.from_regex(r"[a-z]{1,4}", fullmatch=True),
                              st.from_regex(r"[a-z0-9]{0,4}", fullmatch=True)),
                    max_size=4))
    def test_query_order_invariance(self, scheme, host, path, params):
        import random

        base = f"{scheme}://{host}{path}"
        a = base + ("?" + "&".join(f"{k}={v}" for k, v in params)
                    if params else "")
        shuffled = list(params)
        random.Random(0).shuffle(shuffled)
        b = base + ("?" + "&".join(f"{k}={v}" for k, v in shuffled)
                    if shuffled else "")
        assert canonical_url(a) == canonical_url(b)


class TestCanonicalEdgeCases:
    def test_ipv6_brackets_preserved(self):
        assert canonical_url("http://[2001:DB8::1]:8080/x") == \
            "http://[2001:db8::1]:8080/x"
        assert canonical_url("http://[2001:db8::1]:80/x") == \
            "http://[2001:db8::1]/x"

    def test_password_only_credentials_preserved(self):
        assert canonical_url("http://:pw@e.com/x") == "http://:pw@e.com/x"
        assert canonical_url("http://:pw@e.com/x") != \
            canonical_url("http://e.com/x")

    def test_percent_normalization(self):
        # unreserved escapes decode; reserved escapes stay, hex uppercased
        assert canonical_url("http://a.com/%7Ex") == "http://a.com/~x"
        assert canonical_url("http://a.com/~x") == "http://a.com/~x"
        assert canonical_url("http://a.com/a%2fb") == "http://a.com/a%2Fb"
