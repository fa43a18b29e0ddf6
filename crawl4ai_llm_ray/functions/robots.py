"""robots.txt parsing — the gate's input format made real.

The engine's politeness/robots state (state/frontier.py) consumes
``host → (disallow_prefixes, crawl_delay)``; this module produces that from
actual robots.txt bodies (User-agent sections, Disallow/Allow prefixes,
Crawl-delay), so a real fetcher can feed fetched robots bodies straight into
the frontier. The synthetic corpus can emit robots bodies too
(``render_robots_txt``), closing the loop for tests.

Subset implemented (the part the gate uses): User-agent grouping with ``*``
fallback, Disallow prefix rules (empty Disallow = allow all), Crawl-delay.
Allow lines are parsed but the gate's prefix test only consumes disallows —
documented limitation, as in most minimal crawlers.
"""

from __future__ import annotations


def parse_robots_txt(body: str, user_agent: str = "crawl4ai_llm_ray") -> tuple[tuple[str, ...], float | None]:
    """→ (disallow_prefixes, crawl_delay_or_None) for the best-matching
    User-agent section (exact prefix match on agent token, else ``*``)."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            agent = value.lower()
            groups.setdefault(agent, {"disallow": [], "delay": None})
            current = [agent]
        elif key in ("disallow", "allow", "crawl-delay") and current:
            for agent in current:
                g = groups[agent]
                if key == "disallow" and value:
                    g["disallow"].append(value)
                elif key == "crawl-delay":
                    try:
                        g["delay"] = float(value)
                    except ValueError:
                        pass
        # any other directive ends nothing; sections end at next User-agent
    ua = user_agent.lower()
    match = None
    for agent in groups:
        if agent != "*" and (ua.startswith(agent) or agent in ua):
            match = groups[agent]
            break
    if match is None:
        match = groups.get("*")
    if match is None:
        return (), None
    return tuple(match["disallow"]), match["delay"]


def render_robots_txt(disallow_prefixes: tuple[str, ...], crawl_delay: float | None) -> str:
    """Inverse: render the gate's rule tuple as a robots.txt body."""
    lines = ["User-agent: *"]
    for p in disallow_prefixes:
        lines.append(f"Disallow: {p}")
    if not disallow_prefixes:
        lines.append("Disallow:")
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    return "\n".join(lines) + "\n"


def robots_rules_from_bodies(
    bodies: dict[str, str], default_delay: float = 1.0, user_agent: str = "crawl4ai_llm_ray"
) -> dict[str, tuple[tuple[str, ...], float]]:
    """host → robots.txt body ⇒ the frontier's rules dict."""
    rules = {}
    for host, body in bodies.items():
        prefixes, delay = parse_robots_txt(body, user_agent)
        rules[host] = (prefixes, delay if delay is not None else default_delay)
    return rules
