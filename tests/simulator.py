"""Pure-Python reference crawler — the semantics oracle for the engine.

Implements, with plain dicts and sorts, exactly the crawl contract the
Spark engine must honor (the analog of the reference's sequential C#
logic, Downloader.cs:91-244): deterministic (priority, discovery, url)
visit order, per-host budgets, robots, seen-set, MaxPages/MaxCommits
whole-commit budgets, cursor watermarks. Tests assert the distributed
DataFrame implementation reproduces these results row-for-row.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass, field

_HOST_RE = re.compile(r"https?://([^/?#]+)")
_PATH_RE = re.compile(r"https?://[^/?#]+(/[^?#]*)")
_HREF_RE = re.compile(r'href="([^"]+)"')
EPOCH_MIN = dt.datetime(1, 1, 1)


def host_of(url: str) -> str:
    m = _HOST_RE.match(url)
    return m.group(1) if m else ""


def path_of(url: str) -> str:
    m = _PATH_RE.match(url)
    return m.group(1) if m else ""


def valid_url(url: str) -> bool:
    return url.startswith("https://") and host_of(url) != "" and path_of(url) != "" and "?" not in url


def extract_text(html: bytes) -> str:
    i = html.find(b"<p>")
    if i < 0:
        return ""
    j = html.find(b"</p>", i)
    if j < 0:
        j = len(html)
    return html[i + 3 : j].decode("utf-8")


@dataclass
class SimResult:
    epochs: list[list[str]] = field(default_factory=list)  # FINAL urls per epoch, visit order
    texts: dict[str, str] = field(default_factory=dict)
    failed: list[str] = field(default_factory=list)        # final failures (after retries)
    attempts: dict[str, int] = field(default_factory=dict)  # attempts consumed per final url


def simulate_web_crawl(
    pages: dict[str, dict],
    seeds: list[tuple[str, int]],
    *,
    robots: dict[str, list[str]] | None = None,
    budgets: dict[str, int] | None = None,
    default_budget: int = 4,
    global_budget: int | None = None,
    max_epochs: int = 100,
    max_attempts: int = 3,
) -> SimResult:
    """Fetch-retry semantics (reference Downloader.cs:297-318, 3 attempts
    then permanent failure): a url whose fetch misses — absent from
    ``pages``, or flaky (page['available_from_attempt'] > attempt number)
    — returns to pending with attempts+1 until ``max_attempts``, then is
    recorded as a final failure. Only FINAL outcomes count as seen."""
    robots = robots or {}
    budgets = budgets or {}
    res = SimResult()
    seen: set[str] = set()
    # pending: url -> (priority, discovery_epoch, attempts)
    pending: dict[str, tuple[int, int, int]] = {}
    for url, pr in seeds:
        if valid_url(url):
            cur = pending.get(url)
            if cur is None or (pr, 0) < cur[:2]:
                pending[url] = (pr, 0, 0)

    for epoch in range(max_epochs):
        allowed = {
            u: v
            for u, v in pending.items()
            if not any(path_of(u).startswith(p) for p in robots.get(host_of(u), []))
        }
        by_host: dict[str, list[str]] = {}
        for u in allowed:
            by_host.setdefault(host_of(u), []).append(u)
        dequeued: list[str] = []
        for h, urls in by_host.items():
            # dequeue order ignores attempts: (priority, discovery, url)
            urls.sort(key=lambda u: (allowed[u][0], allowed[u][1], u))
            dequeued.extend(urls[: budgets.get(h, default_budget)])
        dequeued.sort(key=lambda u: (allowed[u][0], allowed[u][1], u))
        if global_budget is not None:
            dequeued = dequeued[:global_budget]
        if not dequeued:
            break

        remaining = {u: v for u, v in allowed.items() if u not in set(dequeued)}
        finals: list[str] = []
        retried: dict[str, tuple[int, int, int]] = {}
        new: dict[str, tuple[int, int, int]] = {}
        for u in dequeued:
            page = pages.get(u)
            att = allowed[u][2] + 1
            ok = page is not None and att >= page.get("available_from_attempt", 1)
            if not ok:
                if att >= max_attempts:
                    seen.add(u)
                    res.failed.append(u)
                    res.attempts[u] = att
                    finals.append(u)
                else:
                    retried[u] = (allowed[u][0], allowed[u][1], att)
                continue
            seen.add(u)
            res.attempts[u] = att
            finals.append(u)
            res.texts[u] = extract_text(page["html"])
            pr = allowed[u][0] + 1
            for link in _HREF_RE.findall(page["html"].decode("utf-8")):
                if not valid_url(link) or link in seen or link in remaining or link in set(dequeued):
                    continue
                cand = (pr, epoch + 1, 0)
                if link not in new or cand[:2] < new[link][:2]:
                    new[link] = cand
        res.epochs.append(finals)
        # remaining/retried always beat a fresh re-discovery (older epoch)
        pending = {**new, **remaining, **retried}
    return res


def simulate_catalog_run(
    pages: list[dict],
    index: list[dict],
    cursor: dt.datetime,
    *,
    max_pages: int | None = None,
    max_commits: int | None = None,
) -> tuple[list[str], dt.datetime]:
    """One incremental run, faithful to the reference's sequential page
    loop (cursor filter → page limit → per-page commit-budget trimming →
    early stop). Returns (visited urls in visit order, cursor_after)."""
    idx = sorted(index, key=lambda r: (r["page_ts"], r["page_no"]))
    # full-catalog page membership by advertised ts ranges
    bounds = []
    prev = EPOCH_MIN
    for r in idx:
        bounds.append((r["page_no"], prev, r["page_ts"]))
        prev = r["page_ts"]
    sel = [r for r in idx if r["page_ts"] > cursor][: max_pages if max_pages else None]
    sel_nos = [r["page_no"] for r in sel]

    visited: list[str] = []
    completed = 0
    cur = cursor
    for page_no, lo, hi in bounds:
        if page_no not in sel_nos:
            continue
        if max_commits is not None and completed >= max_commits:
            break
        leaves = [
            p for p in pages
            if lo < p["warc_ts"] <= hi and p["warc_ts"] > cursor
        ]
        leaves.sort(key=lambda p: (p["warc_ts"], p["url"]))
        commits = sorted({p["warc_ts"] for p in leaves})
        if max_commits is not None:
            remaining = max_commits - completed
            if len(commits) > remaining:
                cut = commits[remaining - 1]
                leaves = [p for p in leaves if p["warc_ts"] <= cut]
                commits = commits[:remaining]
        visited.extend(p["url"] for p in leaves)
        completed += len(commits)
        if commits:
            cur = max(cur, commits[-1])
    return visited, cur
