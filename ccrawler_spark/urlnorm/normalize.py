"""URL canonicalization (O6, docs/SEMANTICS.md §2.1).

One pure function ``canonicalize`` is the single source of truth; the
oracle calls it per-URL, the engine wraps ``canonicalize_batch`` in a
batch ``pandas_udf`` (string-heavy work, vectorized per Arrow batch —
permitted by BASELINE.json:15's "no per-row Python" which bans
row-at-a-time ``F.udf``, not batch pandas UDFs; SURVEY.md §2 O6).
"""

from __future__ import annotations

import re

import pandas as pd

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def _pct_norm(s: str) -> str:
    """Decode %XY for unreserved bytes; uppercase hex for the rest."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of /./ and /../
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res.lstrip("/")
    return res


def canonicalize(url: str) -> str | None:
    """Canonical absolute http(s) URL, or None if out of scope."""
    if url is None:
        return None
    url = url.strip()
    frag = url.find("#")
    if frag >= 0:
        # re-strip: "…/x #frag" must canonicalize to the same key as
        # its own output "…/x" (idempotence — property-tested; the
        # seen-set's exactness rests on canonicalize being a projection)
        url = url[:frag].rstrip()
    m = _SCHEME_RE.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    if scheme not in ("http", "https"):
        return None
    rest = url[m.end() :]
    slash = rest.find("/")
    q = rest.find("?")
    cut = min(x for x in (slash, q, len(rest)) if x >= 0)
    authority = rest[:cut].lower()
    tail = rest[cut:]
    dp = _DEFAULT_PORT[scheme]
    if authority.endswith(dp):
        authority = authority[: -len(dp)]
    if not authority:
        return None
    qpos = tail.find("?")
    if qpos >= 0:
        path, query = tail[:qpos], tail[qpos:]
    else:
        path, query = tail, ""
    path = _pct_norm(path)
    query = _pct_norm(query)
    path = _remove_dot_segments(path) if path else "/"
    return f"{scheme}://{authority}{path}{query}"


def host_of(canonical_url: str) -> str:
    """Authority of an already-canonical URL (no port in fixtures)."""
    rest = canonical_url.split("://", 1)[1]
    return rest.split("/", 1)[0]


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Batch form for the engine's pandas_udf (returns None for
    out-of-scope URLs; engine filters them)."""
    return urls.map(canonicalize)
