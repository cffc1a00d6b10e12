"""robots.txt fetching, parsing and caching.

Real robots semantics (the REP subset that covers the vast majority of
robots.txt files in the wild): ``User-agent`` sections, ``Disallow``
AND ``Allow`` path prefixes with longest-match precedence (the
most-specific rule wins; on an exact tie Allow wins, per Google's REP
draft), empty Disallow means allow-all. Rules for ``*`` apply to us.

The sandbox has no network, so ``fetch_robots_txt`` returns a
deterministic synthetic robots.txt per host (each host disallows the
``/doc/<digit>`` prefix derived from its name hash — i.e. doc ids whose
decimal form starts with that digit); the parser and the per-worker
cache are the real components a production fetcher would sit behind.
"""

from __future__ import annotations

from .hashing import xxh64_str


def fetch_robots_txt(host: str) -> str:
    """Stand-in for GET http://{host}/robots.txt (no network here)."""
    digit = xxh64_str(host) % 10
    return (
        "# synthetic robots for %s\n"
        "User-agent: special-bot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /doc/%d\n"
        "Disallow: /private/\n"
    ) % (host, digit)


def _parse_groups(text: str):
    """All agent groups: ({agent: [(prefix, is_allow)]},
    {agent: crawl_delay_seconds})."""
    groups = {}  # agent(lower) -> [(prefix, is_allow)]
    delays = {}  # agent(lower) -> float seconds
    current_agents = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
            last_was_agent = True
        elif field in ("disallow", "allow"):
            last_was_agent = False
            if value:
                for a in current_agents:
                    groups.setdefault(a, []).append(
                        (value, field == "allow"))
        elif field == "crawl-delay":
            last_was_agent = False
            try:
                d = float(value)
            except ValueError:
                continue
            for a in current_agents:
                delays[a] = d
        else:
            last_was_agent = False
    return groups, delays


def parse_robots_txt(text: str, agent: str = "*"):
    """Returns the rule list for *agent* (falling back to the ``*``
    group) as ``[(prefix, is_allow), ...]``.  An empty ``Disallow:``
    clears nothing — it is simply no rule (allow-all by default)."""
    groups, _ = _parse_groups(text)
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


def crawl_delay(text: str, agent: str = "*"):
    """``Crawl-delay`` seconds for *agent* (``*`` fallback), or None.
    The sandbox fetcher is synthetic so the delay is surfaced, not
    enforced; a production fetch pool would feed it into per-host
    request pacing (frontier/politeness.py budgets are the wave-level
    stand-in)."""
    groups, delays = _parse_groups(text)
    agent = agent.lower()
    if agent in delays:
        return delays[agent]
    if agent in groups:  # agent-specific group exists without a delay
        return None
    return delays.get("*")


class RobotsRules:
    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules, crawl_delay=None):
        # normalize legacy plain-prefix lists to (prefix, is_allow)
        self.rules = tuple(
            r if isinstance(r, tuple) else (r, False) for r in rules)
        self.crawl_delay = crawl_delay  # seconds or None

    def allowed(self, path: str) -> bool:
        """Longest-match precedence: the most specific matching rule
        decides; exact-length tie goes to Allow; no match -> allowed."""
        best_len = -1
        best_allow = True
        for prefix, is_allow in self.rules:
            if path.startswith(prefix):
                n = len(prefix)
                if n > best_len or (n == best_len and is_allow):
                    best_len = n
                    best_allow = is_allow
        return best_allow


class RobotsCache:
    """Per-worker/actor cache: one fetch+parse per host.  ``fetcher``
    is injectable for tests / a production HTTP fetcher."""

    def __init__(self, agent: str = "*", fetcher=None):
        self.agent = agent
        self.fetcher = fetcher or fetch_robots_txt
        self._rules: dict = {}

    def rules_for(self, host: str) -> RobotsRules:
        r = self._rules.get(host)
        if r is None:
            txt = self.fetcher(host)
            r = RobotsRules(parse_robots_txt(txt, self.agent),
                            crawl_delay=crawl_delay(txt, self.agent))
            self._rules[host] = r
        return r

    def allowed(self, host: str, path: str) -> bool:
        return self.rules_for(host).allowed(path)

    def delay_for(self, host: str):
        return self.rules_for(host).crawl_delay
