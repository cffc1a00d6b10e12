"""robots.txt fetching, parsing and caching.

Real robots semantics (the original robots exclusion protocol subset
that covers the vast majority of robots.txt files in the wild):
``User-agent`` sections, ``Disallow`` path prefixes, longest-prefix
wins, empty Disallow means allow-all. Rules for ``*`` apply to us.

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


def parse_robots_txt(text: str, agent: str = "*"):
    """Returns the list of disallowed path prefixes for *agent*
    (falling back to the ``*`` group), per the classic REP rules."""
    groups = {}  # agent(lower) -> [prefixes]
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
            if field == "disallow" and value:
                for a in current_agents:
                    groups.setdefault(a, []).append(value)
        else:
            last_was_agent = False
    agent = agent.lower()
    if agent in groups:
        return groups[agent]
    return groups.get("*", [])


class RobotsRules:
    __slots__ = ("disallow",)

    def __init__(self, prefixes):
        self.disallow = tuple(prefixes)

    def allowed(self, path: str) -> bool:
        for p in self.disallow:
            if path.startswith(p):
                return False
        return True


class RobotsCache:
    """Per-worker/actor cache: one fetch+parse per host."""

    def __init__(self, agent: str = "*"):
        self.agent = agent
        self._rules: dict = {}

    def rules_for(self, host: str) -> RobotsRules:
        r = self._rules.get(host)
        if r is None:
            r = RobotsRules(parse_robots_txt(fetch_robots_txt(host),
                                             self.agent))
            self._rules[host] = r
        return r

    def allowed(self, host: str, path: str) -> bool:
        return self.rules_for(host).allowed(path)
