"""Pure-Python URL kernel — the single source of truth for URL identity.

Reimplements (from scratch, per observed behavior) the URL semantics of
the reference crawler's URL package (reference: internal/url/url.go:17-201)
so that the Spark pandas UDFs, the native-expression twins, and the pure-
Python oracle BFS used in tests all share byte-identical canonicalization.

Semantics notes vs Go's net/url (verified against the reference's test
goldens, internal/url/url_test.go:7-306):

- ``url.Parse`` in Go fails on a missing scheme before "://" (e.g.
  "://invalid") and on control characters; Python's ``urlsplit`` is
  laxer, so :func:`_parse` raises ``ValueError`` for those shapes.
- Go's ``Hostname()`` strips the port but preserves case; Python's
  ``SplitResult.hostname`` lowercases, so we parse the netloc manually.
- ``NormalizeURL`` strips the fragment, strips exactly ONE trailing
  slash from non-root paths (Go strings.TrimSuffix), and turns an empty
  path into "/".
- Go's ``URL.String()`` re-encodes percent escapes; our URL universe
  (generated slugs) contains none, and the pandas-UDF path documents
  this as the one known divergence corner.
"""

from __future__ import annotations

from urllib.parse import SplitResult, urljoin, urlsplit

_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:", "ftp:", "file:", "data:", "#")


def _parse(raw: str) -> SplitResult:
    """Parse like Go net/url.Parse: raise ValueError on shapes Go rejects."""
    if raw.startswith(":"):
        # Go: "missing protocol scheme"
        raise ValueError(f"missing protocol scheme in {raw!r}")
    if any(ord(c) < 0x20 or ord(c) == 0x7F for c in raw):
        raise ValueError(f"invalid control character in {raw!r}")
    return urlsplit(raw)


def _host_no_port(netloc: str) -> str:
    """Hostname without port / userinfo, case preserved (Go Hostname())."""
    host = netloc.rsplit("@", 1)[-1]
    if host.startswith("["):  # IPv6 literal
        end = host.find("]")
        return host[1 : end] if end >= 0 else host[1:]
    return host.rsplit(":", 1)[0] if ":" in host else host


def is_valid_url(raw: str) -> bool:
    """True iff http/https scheme (case-insensitive) and non-empty host."""
    raw = raw.strip()
    if not raw:
        return False
    try:
        sr = _parse(raw)
    except ValueError:
        return False
    return sr.scheme.lower() in ("http", "https") and sr.netloc != ""


def extract_domain(raw: str) -> str | None:
    """Hostname without port; None where the reference errors."""
    raw = raw.strip()
    if not raw:
        return None
    try:
        sr = _parse(raw)
    except ValueError:
        return None
    if sr.netloc == "":
        return None
    host = _host_no_port(sr.netloc)
    return host or None


def resolve_url(base: str, relative: str) -> str | None:
    """RFC-3986 resolution of ``relative`` against ``base``; None on error."""
    base = base.strip()
    relative = relative.strip()
    if not base or not relative:
        return None
    try:
        _parse(base)
        _parse(relative)
    except ValueError:
        return None
    return urljoin(base, relative)


def normalize_url(raw: str) -> str | None:
    """Canonical URL-seen identity: no fragment, no trailing slash
    (non-root), empty path -> "/". None where the reference errors."""
    raw = raw.strip()
    if not raw:
        return None
    try:
        sr = _parse(raw)
    except ValueError:
        return None
    path = sr.path
    if path != "/" and path.endswith("/"):
        path = path[:-1]
    if path == "":
        path = "/"
    out = f"{sr.scheme}://{sr.netloc}" if sr.scheme else sr.netloc
    out += path
    if sr.query:
        out += "?" + sr.query
    # Go keeps a URL with empty path + query as "host?query" only when the
    # path was empty pre-normalization; normalization forces "/" first, so
    # the rebuilt form above is always scheme://host/path[?query].
    return out


def is_same_domain(url1: str, url2: str) -> bool | None:
    """Case-insensitive hostname equality; None where the reference errors."""
    d1 = extract_domain(url1)
    d2 = extract_domain(url2)
    if d1 is None or d2 is None:
        return None
    return d1.lower() == d2.lower()


def _dir_path(path: str) -> str:
    """Directory-style path for prefix matching: append '/' unless root."""
    if path != "/" and not path.endswith("/"):
        return path + "/"
    return path


def is_same_path_prefix(base_url: str, target_url: str) -> bool | None:
    """Same domain AND target path under base path (directory-style).
    None where the reference errors (either URL lacks a host)."""
    same = is_same_domain(base_url, target_url)
    if same is None:
        return None
    if not same:
        return False
    try:
        bp = _dir_path(_parse(base_url).path)
        tp = _dir_path(_parse(target_url).path)
    except ValueError:
        return None
    return tp.startswith(bp)


def should_skip_url(raw: str) -> bool:
    """True for empty/whitespace hrefs and non-crawlable schemes."""
    raw = raw.strip()
    if not raw:
        return True
    low = raw.lower()
    return any(low.startswith(p) for p in _SKIP_PREFIXES)


def canonical_outlink(base_url: str, href: str) -> str | None:
    """The full per-href pipeline of the reference's link extractor
    (reference: internal/parser/parser.go:155-199): trim -> skip-filter ->
    resolve (absolute hrefs pass through) -> validate -> normalize.
    Returns the canonical URL or None if the href is dropped."""
    href = href.strip()
    if not href or should_skip_url(href):
        return None
    if href.startswith(("http://", "https://")):
        absolute = href
    else:
        absolute = resolve_url(base_url, href)
        if absolute is None:
            return None
    if not is_valid_url(absolute):
        return None
    return normalize_url(absolute)
