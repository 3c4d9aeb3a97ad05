"""Independent URL-canonicalization oracle.

Restates the frozen policy of :func:`rayxt.text.canonicalize_url` with
``urllib.parse.urlsplit`` — the stdlib's URL machinery instead of the
engine's single RE2 decomposition.  Same policy, different mechanism;
the engine must match string-for-string on the fixture family.

Policy scope guards mirror the engine's: userinfo, IPv6 brackets,
empty hosts and non-numeric ports pass through verbatim, and default
ports are dropped only on their canonical TEXT spelling (``:080`` is
preserved).
"""

from __future__ import annotations

import re
import sys
from urllib.parse import urlsplit

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_TRACKING_KEYS = frozenset({"fbclid", "gclid", "msclkid"})
_PORT_RE = re.compile(r"[0-9]+")


def oracle_canonicalize_url(url: str) -> str:
    try:
        sp = urlsplit(url)
    except ValueError:
        return url
    if not sp.scheme or "://" not in url:
        return url
    netloc = sp.netloc
    if "@" in netloc or "[" in netloc or "]" in netloc:
        return url  # userinfo / IPv6: out of policy scope
    host, sep, port_text = netloc.partition(":")
    if not host:
        return url
    if sep and not _PORT_RE.fullmatch(port_text):
        return url
    scheme = sp.scheme.lower()
    keep_port = bool(sep) and not (
        (scheme == "http" and port_text == "80")
        or (scheme == "https" and port_text == "443")
    )
    netloc_out = host.lower() + (f":{port_text}" if keep_port else "")
    path = sp.path or "/"
    params = [
        p for p in sp.query.split("&")
        if p and not (p.split("=", 1)[0].startswith("utm_")
                      or p.split("=", 1)[0] in _TRACKING_KEYS)
    ]
    query = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{netloc_out}{path}{query}"


def oracle_surt(url):
    """Independent SURT restatement (urlsplit mechanism) of the frozen
    policy in ``rayxt/cdx.py``'s module docstring."""
    if not url:
        return None
    try:
        sp = urlsplit(url)
    except ValueError:
        return None
    if sp.scheme.lower() not in ("http", "https") or "://" not in url:
        return None
    netloc = sp.netloc
    if "@" in netloc or "[" in netloc or "]" in netloc:
        return None
    host, sep, port_text = netloc.partition(":")
    if not host:
        return None
    if port_text and not _PORT_RE.fullmatch(port_text):
        return None
    host = host.lower()
    default = 80 if sp.scheme.lower() == "http" else 443
    port = int(port_text) if port_text else None
    if port == default:
        port = None
    labels = host.split(".")
    if len(labels) > 1 and re.fullmatch(r"www\d*", labels[0]):
        labels = labels[1:]
    key = ",".join(reversed(labels))
    if port is not None:
        key += ":" + str(port)
    path = (sp.path or "/").lower()
    segs = sorted(s for s in sp.query.lower().split("&") if s)
    if segs:
        return key + ")" + path + "?" + "&".join(segs)
    return key + ")" + path
