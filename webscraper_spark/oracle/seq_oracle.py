"""Sequential pure-Python crawl oracle (SURVEY.md §5.2).

Single-threaded, dict-and-list reimplementation of the crawl spec — the
FIFO-per-host order of the reference loop
(/root/reference/app/controllers/cars_controller.rb:147,
car_dealers_controller.rb:153) generalized with robots/budget/politeness per
north_rule. The Spark engine (plans/wave.py) must reproduce this oracle's
crawl order, seen set and schedule exactly; any divergence is an engine bug.

Deliberately shares NO code with the engine: regexes and ordering are
re-derived from the spec so the comparison is meaningful.
"""

from __future__ import annotations

import re
from collections import defaultdict

WAVE_EPOCH_MS = 10_000_000
MAX_LINKS_PER_PAGE = 1024

_URL_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$")
_HREF_RE = re.compile(r'href="([^"]+)"')


def canonicalize(u: str) -> str:
    u = u.strip()
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    if (scheme == "https" and auth.endswith(":443")) or (scheme == "http" and auth.endswith(":80")):
        auth = re.sub(r":[0-9]+$", "", auth)
    path = m.group(3) or "/"
    if path == "":
        path = "/"
    q = m.group(4) or ""
    q = "?" + "&".join(sorted(q[1:].split("&"))) if len(q) > 1 else ""
    return f"{scheme}://{auth}{path}{q}"


def host_of(u: str) -> str:
    m = _URL_RE.match(u)
    if not m:
        return ""
    return re.sub(r":[0-9]+$", "", m.group(2).lower())


def path_of(u: str) -> str:
    m = _URL_RE.match(u)
    if not m:
        return "/"
    return m.group(3) or "/"


def crawl_oracle(
    pages: dict[str, str | None],
    seeds: list[str],
    robots: dict[str, tuple[list[str], int]],
    politeness: dict[str, tuple[int, int]],
    max_waves: int = 16,
):
    """Returns (order, seen, schedule): order = [(url, host, wave, rank)],
    seen = {url: wave}, schedule = {url: sched_ms}."""
    default_max, default_delay = politeness["*"]

    def budget(host: str) -> tuple[int, int]:
        mx, dl = politeness.get(host, (default_max, default_delay))
        rdl = robots.get(host, ([], 0))[1]
        return mx, max(dl, rdl)

    frontier: dict[str, tuple[int, int, int]] = {}
    for u in seeds:
        cu = canonicalize(u)
        key = (0, 0, 0)
        if cu not in frontier or key < frontier[cu]:
            frontier[cu] = key

    seen: dict[str, int] = {}
    order: list[tuple[str, str, int, int]] = []
    schedule: dict[str, int] = {}

    for wave in range(max_waves):
        # 1. minus seen, 2. robots
        allowed: dict[str, tuple[int, int, int]] = {}
        for u, k in frontier.items():
            if u in seen:
                continue
            prefixes = robots.get(host_of(u), ([], 0))[0]
            if any(path_of(u).startswith(p) for p in prefixes):
                continue
            allowed[u] = k

        # 3. per-host FIFO rank + budget
        byhost: dict[str, list] = defaultdict(list)
        for u, (d, dw, dp) in allowed.items():
            byhost[host_of(u)].append((d, dw, dp, u))
        batch: list[tuple[str, str, int, int, int]] = []  # url,host,rank,sched,depth
        deferred: dict[str, tuple[int, int, int]] = {}
        for host, rows in byhost.items():
            rows.sort()
            mx, dl = budget(host)
            for i, (d, dw, dp, u) in enumerate(rows):
                rank = i + 1
                if rank <= mx:
                    batch.append((u, host, rank, wave * WAVE_EPOCH_MS + (rank - 1) * dl, d))
                else:
                    deferred[u] = (d, dw, dp)
        if not batch:
            break

        # 4-6. fetch, harvest, expand
        new_cand: dict[str, tuple[int, int, int]] = {}
        for u, host, rank, sched, d in batch:
            seen[u] = wave
            order.append((u, host, wave, rank))
            schedule[u] = sched
            html = pages.get(u)
            if html is None:
                continue
            for pos, raw in enumerate(_HREF_RE.findall(html)):
                cu = canonicalize(raw)
                key = (d + 1, wave + 1, rank * MAX_LINKS_PER_PAGE + min(pos, MAX_LINKS_PER_PAGE - 1))
                if cu not in new_cand or key < new_cand[cu]:
                    new_cand[cu] = key

        # 7. merge frontier
        frontier = dict(deferred)
        for u, k in new_cand.items():
            frontier[u] = min(frontier[u], k) if u in frontier else k
        frontier = {u: k for u, k in frontier.items() if u not in seen}

    return order, seen, schedule
