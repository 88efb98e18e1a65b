"""Pure-Python oracle BFS — the test stand-in for the Go reference binary.

Implements the sequential crawl semantics of the reference
(reference: internal/crawler/crawler.go:168-276) over a pandas corpus
frame: FIFO queue, visited-at-enqueue (first discoverer wins), BFS-minimal
depth, document-order link appends, same-domain/path-prefix scope filters
relative to the normalized seed, failed pages kept in results but their
links dropped, depth-limit skip at dequeue time.

The Spark crawl plan must reproduce this oracle's (url, depth, order)
exactly; tests/test_crawl.py pins that equality.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ..functions import urlcore
from ..operators.extract import extract_outlinks_py


@dataclass
class OracleResult:
    url: str
    depth: int
    order: int
    status: int
    ok: bool
    links: list[str] = field(default_factory=list)


def oracle_bfs(
    corpus: pd.DataFrame,
    seed_url: str | list[str],
    max_depth: int = -1,
    same_domain: bool = True,
    same_path_prefix: bool = True,
    robots_disallowed: set[str] | None = None,
) -> tuple[list[OracleResult], dict]:
    """Returns (results in crawl order, stats dict)."""
    seed_list = [seed_url] if isinstance(seed_url, str) else list(seed_url)
    seeds: list[str] = []
    for su in seed_list:
        if not urlcore.is_valid_url(su):
            raise ValueError(f"invalid start URL: {su}")
        n = urlcore.normalize_url(su)
        if n not in seeds:
            seeds.append(n)
    pages = {r.url: r for r in corpus.itertuples()}
    robots_disallowed = robots_disallowed or set()

    queue: list[tuple[str, int]] = [(s, 0) for s in seeds]
    visited = set(seeds)
    results: list[OracleResult] = []
    stats = {"total": len(seeds), "crawled": 0, "failed": 0, "skipped": 0, "max_depth": 0}
    order = 0

    while queue:
        url, depth = queue.pop(0)
        if max_depth >= 0 and depth > max_depth:
            stats["skipped"] += 1
            continue
        if url in robots_disallowed:
            stats["skipped"] += 1
            continue
        page = pages.get(url)
        ok = page is not None and 200 <= int(page.status) < 400
        links = extract_outlinks_py(url, page.caption) if ok else []
        results.append(OracleResult(
            url=url, depth=depth, order=order,
            status=int(page.status) if page is not None else 0,
            ok=ok, links=links,
        ))
        order += 1
        stats["crawled" if ok else "failed"] += 1
        stats["max_depth"] = max(stats["max_depth"], depth)
        if ok:
            for link in links:
                if link in visited:
                    continue
                if same_domain:
                    keep = any(
                        (urlcore.is_same_path_prefix(s, link)
                         if same_path_prefix else urlcore.is_same_domain(s, link))
                        or False
                        for s in seeds
                    )
                    if not keep:  # None (parse error) also drops, like Go
                        continue
                queue.append((link, depth + 1))
                visited.add(link)
                stats["total"] += 1
    return results, stats
