"""Independent URL-canonicalization oracle.

Restates the frozen policy of :func:`rayxt.text.canonicalize_url` with
``urllib.parse.urlsplit`` — the stdlib's URL machinery instead of the
engine's single RE2 decomposition.  Same policy, different mechanism;
the engine must match string-for-string on the fixture family.
"""

from __future__ import annotations

import sys
from urllib.parse import urlsplit

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_TRACKING_KEYS = frozenset({"fbclid", "gclid", "msclkid"})


def oracle_canonicalize_url(url: str) -> str:
    try:
        sp = urlsplit(url)
        host = sp.hostname or ""
        port = sp.port  # None when absent or default-less
    except ValueError:
        return url
    if not sp.scheme or "://" not in url:
        return url
    scheme = sp.scheme.lower()
    netloc = host
    if port is not None and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        netloc += f":{port}"
    path = sp.path or "/"
    params = [
        p for p in sp.query.split("&")
        if p and not (p.split("=", 1)[0].startswith("utm_")
                      or p.split("=", 1)[0] in _TRACKING_KEYS)
    ]
    query = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{netloc}{path}{query}"
