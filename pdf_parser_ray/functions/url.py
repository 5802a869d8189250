"""URL canonicalization — the web-pipeline identity key.

Web corpora dedupe by canonical URL before any content pass (the same
page is crawled under scheme/case/port/query-order/fragment variants).
Pure stdlib ``urllib.parse``; the rules are the common-denominator set
every major crawler applies:

  - scheme and host lowercased; trailing dot on the host dropped;
    IPv6 hosts keep their brackets
  - default ports stripped (http:80, https:443)
  - path: empty → "/"; RFC 3986 percent-normalization (unreserved
    octets decoded, remaining escapes uppercased — %7E and ~ collapse)
  - query: parameters sorted by (key, value); blank-valued keys kept;
    tracking parameters (``utm_*``, ``fbclid``, ``gclid``) dropped
  - fragment dropped (never sent to the server)
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                  "abcdefghijklmnopqrstuvwxyz0123456789-._~")


def _norm_pct(path: str) -> str:
    """RFC 3986 §6.2.2 percent normalization: decode escapes of
    unreserved characters, uppercase the hex of everything else
    (reserved octets like %2F stay encoded — decoding them would change
    the path's meaning)."""

    def sub(m: re.Match) -> str:
        c = chr(int(m.group(1), 16))
        return c if c in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(sub, path)

_DEFAULT_PORTS = {"http": 80, "https": 443}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"fbclid", "gclid"}


def canonical_url(url: str) -> str:
    """Canonical form of ``url``; returns the input stripped when it
    doesn't parse as a URL (fail-soft, like every per-row kernel here)."""
    url = (url or "").strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if ":" in host:  # urlsplit.hostname strips IPv6 brackets — restore
        host = f"[{host}]"
    port = None
    bad_port = False
    try:
        port = parts.port
    except ValueError:
        # non-numeric port: only the port TEXT stays verbatim — host
        # case/dot and path/query still normalize like any other URL,
        # else such URLs never collapse with their variants
        bad_port = True
        hostport = parts.netloc.rsplit("@", 1)[-1]
        if hostport.startswith("["):  # [v6]:port — brackets delimit host
            br = hostport.find("]")
            host = hostport[:br + 1].lower() + hostport[br + 1:]
        else:
            h, _, ptxt = hostport.rpartition(":")
            host = f"{h.lower().rstrip('.')}:{ptxt}"
    netloc = host if bad_port or port is None \
        or _DEFAULT_PORTS.get(scheme) == port else f"{host}:{port}"
    if parts.username or parts.password:
        # credentials are part of identity — preserve, incl. the
        # password-only ':pw@' form
        cred = (parts.username or "") + \
            (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _norm_pct(parts.path or "/")
    pairs = [(k, v) for k, v in
             parse_qsl(parts.query, keep_blank_values=True)
             if not k.lower().startswith(_TRACKING_PREFIXES)
             and k.lower() not in _TRACKING_KEYS]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Registered host of ``url`` ('' when unparseable) — the grouping
    key for per-domain caps and source statistics."""
    try:
        return (urlsplit((url or "").strip()).hostname or "").lower().rstrip(".")
    except ValueError:
        return ""
