"""URL canonicalization — the normalizer URL-level dedup stands on.

Crawls reach the same page as ``HTTP://Site.COM:80/a/?utm_source=x#top``
and ``http://site.com/a``; URL-keyed dedup, blocklists, and domain caps
all need one canonical spelling. Every pass is a plain native regex
expression (whole-stage codegen — this runs per row at corpus scale),
with the SAME pass sequence implemented for Spark (Java regex), DuckDB
(RE2) and Python ``re`` — only conservative syntax all three dialects
share (no lookaround; explicit char classes, never ``\\s``; inline
``(?s)`` for dotall).

PINNED PASS SEQUENCE (canonical_url / canonical_url_py / the d33 SQL):
1. trim ASCII whitespace: ``^[ \\t\\n\\x0b\\f\\r]+`` and trailing twin.
2. strip fragment: ``(?s)#.*$``, then re-trim trailing whitespace
   (the strip can expose one, and ``$`` semantics before a final
   newline differ between RE2 and Java/Python).
3. lowercase scheme and host (path/query untouched): decompose on
   ``^scheme://host(rest)``; URLs without ``://`` pass through steps
   1-2 and 4-7 unchanged by this step.
4. strip default ports ``:80`` (http) / ``:443`` (https).
5. drop tracking params (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``): first a leading-param pass
   ``\\?TRACK=[^&#]*&`` -> ``?`` applied THREE times (bounded,
   deterministic: up to three consecutive leading tracking params —
   more is out of contract), then a global ``[?&]TRACK=[^&#]*`` -> ``''``.
6. strip trailing ``?`` / ``&`` runs.
7. strip trailing slash runs after a non-``:/`` char
   (``http://a.com/`` -> ``http://a.com``; bare ``http://`` untouched).

Null in -> null out. The result is a VALUE for keys (dedup, caps,
blocklists), not a promise of semantic URL equivalence (no IDN/percent
decoding — those need tables, not regexes).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r" \t\n\x0b\f\r"
_TRACK = r"(utm_[^&#=]*|gclid|fbclid|msclkid)"
_SCHEME = r"[A-Za-z][A-Za-z0-9+.-]*"


def canonical_url(col: Column) -> Column:
    t = F.regexp_replace(col, f"^[{_WS}]+", "")
    t = F.regexp_replace(t, f"[{_WS}]+$", "")
    t = F.regexp_replace(t, r"(?s)#.*$", "")
    t = F.regexp_replace(t, f"[{_WS}]+$", "")
    scheme = F.regexp_extract(t, f"^({_SCHEME})://", 1)
    host = F.regexp_extract(t, f"^{_SCHEME}://([^/?#]*)", 1)
    rest = F.regexp_extract(t, f"(?s)^{_SCHEME}://[^/?#]*(.*)$", 1)
    t = F.when(scheme != "", F.concat(F.lower(scheme), F.lit("://"), F.lower(host), rest)).otherwise(t)
    t = F.regexp_replace(t, r"^(http://[^/?#]*):80([/?]|$)", "$1$2")
    t = F.regexp_replace(t, r"^(https://[^/?#]*):443([/?]|$)", "$1$2")
    for _ in range(3):
        t = F.regexp_replace(t, rf"\?{_TRACK}=[^&#]*&", "?")
    t = F.regexp_replace(t, rf"[?&]{_TRACK}=[^&#]*", "")
    t = F.regexp_replace(t, r"[?&]+$", "")
    t = F.regexp_replace(t, r"([^:/])/+$", "$1")
    return t


def canonical_url_py(u: str | None) -> str | None:
    """Per-row Python oracle twin (re.ASCII-free: all classes explicit)."""
    if u is None:
        return None
    t = re.sub(f"^[{_WS}]+", "", u)
    t = re.sub(f"[{_WS}]+$", "", t)
    t = re.sub(r"(?s)#.*$", "", t)
    t = re.sub(f"[{_WS}]+$", "", t)
    m = re.match(f"({_SCHEME})://([^/?#]*)(.*)$", t, flags=re.DOTALL)
    if m:
        t = m.group(1).lower() + "://" + m.group(2).lower() + m.group(3)
    t = re.sub(r"^(http://[^/?#]*):80([/?]|$)", r"\1\2", t)
    t = re.sub(r"^(https://[^/?#]*):443([/?]|$)", r"\1\2", t)
    for _ in range(3):
        t = re.sub(rf"\?{_TRACK}=[^&#]*&", "?", t)
    t = re.sub(rf"[?&]{_TRACK}=[^&#]*", "", t)
    t = re.sub(r"[?&]+$", "", t)
    t = re.sub(r"([^:/])/+$", r"\1", t)
    return t


def url_host(col: Column, strip_www: bool = True) -> Column:
    """Host extraction for domain keying — feeds ``domain_cap``,
    blocklists, and per-domain stats from RAW urls when no ``source``
    column exists (round 5). PINNED SEQUENCE (all three twins):

    1. trim ASCII whitespace (as canonical_url step 1);
    2. authority = ``^scheme://([^/?#]*)``; no scheme -> NULL (not a URL);
    3. strip ``userinfo@`` and a trailing ``:digits`` port;
    4. lowercase; optionally strip ONE leading ``www.``;
    5. empty host -> NULL.

    A VALUE for keys, like canonical_url — no IDN/percent decoding."""
    t = F.regexp_replace(col, f"^[{_WS}]+", "")
    t = F.regexp_replace(t, f"[{_WS}]+$", "")
    host = F.regexp_extract(t, f"^{_SCHEME}://([^/?#]*)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(host, r":[0-9]*$", "")
    host = F.lower(host)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_host_py(u: str | None, strip_www: bool = True) -> str | None:
    """Per-row Python oracle twin of :func:`url_host`."""
    if u is None:
        return None
    t = re.sub(f"^[{_WS}]+", "", u)
    t = re.sub(f"[{_WS}]+$", "", t)
    m = re.match(f"^{_SCHEME}://([^/?#]*)", t)
    host = m.group(1) if m else ""
    host = re.sub(r"^[^@]*@", "", host)
    host = re.sub(r":[0-9]*$", "", host)
    host = host.lower()
    if strip_www:
        host = re.sub(r"^www\.", "", host)
    return host or None


def url_host_sql(col: str, strip_www: bool = True) -> str:
    """The DuckDB twin as a SQL expression string (RE2)."""
    ws = " \\t\\n\\x0b\\f\\r"
    scheme = "[A-Za-z][A-Za-z0-9+.-]*"
    t = f"regexp_replace({col}, '^[{ws}]+', '', 'g')"
    t = f"regexp_replace({t}, '[{ws}]+$', '', 'g')"
    h = f"regexp_extract({t}, '^{scheme}://([^/?#]*)', 1)"
    h = f"regexp_replace({h}, '^[^@]*@', '', 'g')"
    h = f"regexp_replace({h}, ':[0-9]*$', '', 'g')"
    h = f"lower({h})"
    if strip_www:
        h = f"regexp_replace({h}, '^www\\.', '', 'g')"
    return f"nullif({h}, '')"


def canonical_url_sql(col: str) -> str:
    """The DuckDB twin as a SQL expression string (RE2; ``\\1`` backrefs)."""
    ws = " \\t\\n\\x0b\\f\\r"
    track = "(utm_[^&#=]*|gclid|fbclid|msclkid)"
    scheme = "[A-Za-z][A-Za-z0-9+.-]*"
    # every replace carries 'g': Java regexp_replace is replace-ALL,
    # DuckDB defaults to first-match-only
    t = f"regexp_replace({col}, '^[{ws}]+', '', 'g')"
    t = f"regexp_replace({t}, '[{ws}]+$', '', 'g')"
    t = f"regexp_replace({t}, '(?s)#.*$', '', 'g')"
    t = f"regexp_replace({t}, '[{ws}]+$', '', 'g')"
    dec = (
        f"CASE WHEN regexp_matches({t}, '^{scheme}://') THEN "
        f"lower(regexp_extract({t}, '^({scheme})://', 1)) || '://' || "
        f"lower(regexp_extract({t}, '^{scheme}://([^/?#]*)', 1)) || "
        f"regexp_extract({t}, '(?s)^{scheme}://[^/?#]*(.*)$', 1) "
        f"ELSE {t} END"
    )
    t = f"regexp_replace({dec}, '^(http://[^/?#]*):80([/?]|$)', '\\1\\2', 'g')"
    t = f"regexp_replace({t}, '^(https://[^/?#]*):443([/?]|$)', '\\1\\2', 'g')"
    for _ in range(3):
        t = f"regexp_replace({t}, '\\?{track}=[^&#]*&', '?', 'g')"
    t = f"regexp_replace({t}, '[?&]{track}=[^&#]*', '', 'g')"
    t = f"regexp_replace({t}, '[?&]+$', '', 'g')"
    t = f"regexp_replace({t}, '([^:/])/+$', '\\1', 'g')"
    return t
