"""robots.txt parse/render roundtrip + crawled-doc point lookup."""

import pytest

from crawl4ai_llm_ray.functions.robots import (
    parse_robots_txt,
    render_robots_txt,
    robots_rules_from_bodies,
)


class TestRobots:
    def test_basic_parse(self):
        body = """
        # comments ignored
        User-agent: *
        Disallow: /private
        Disallow: /tmp
        Crawl-delay: 2.5
        """
        prefixes, delay = parse_robots_txt(body)
        assert prefixes == ("/private", "/tmp")
        assert delay == 2.5

    def test_agent_specific_section_wins(self):
        body = (
            "User-agent: *\nDisallow: /all\n\n"
            "User-agent: crawl4ai_llm_ray\nDisallow: /mine\nCrawl-delay: 0.5\n"
        )
        prefixes, delay = parse_robots_txt(body)
        assert prefixes == ("/mine",)
        assert delay == 0.5
        prefixes, _ = parse_robots_txt(body, user_agent="otherbot")
        assert prefixes == ("/all",)

    def test_empty_disallow_allows_all(self):
        prefixes, delay = parse_robots_txt("User-agent: *\nDisallow:\n")
        assert prefixes == ()
        assert delay is None

    def test_garbage_tolerant(self):
        assert parse_robots_txt("") == ((), None)
        assert parse_robots_txt("random text\nno directives") == ((), None)
        assert parse_robots_txt("Disallow: /orphan\n") == ((), None)  # no UA section

    def test_render_parse_roundtrip_matches_synth_rules(self):
        from crawl4ai_llm_ray.sources.synth import SynthWebConfig, robots_rules

        cfg = SynthWebConfig(n_hosts=10)
        rules = robots_rules(cfg)
        bodies = {
            h: render_robots_txt(prefixes, delay)
            for h, (prefixes, delay) in rules.items()
        }
        parsed = robots_rules_from_bodies(bodies)
        assert parsed == rules  # the gate's input format roundtrips exactly


@pytest.mark.usefixtures("ray_session")
def test_doc_lookup_point_reads():
    from crawl4ai_llm_ray.pipelines import crawl_queries

    tbl = crawl_queries.crawl_doc_lookup()
    assert tbl.num_rows == 3
    out = crawl_queries.ensure_crawl()
    with pytest.raises(KeyError, match="nope"):
        crawl_queries.doc_lookup(out, ["nope"])
