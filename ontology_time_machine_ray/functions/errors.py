"""Error classification: errors are data, not exceptions.

Restates the reference's error handling (M13/M14):

* ``causal_chain`` / ``type_chain`` -- walk an exception's ``__context__``
  chain into structured rows (``download_ontologies.py:28-49``).
* ``classify_status`` -- the accessibility bucket cascade
  (``aggregate_results.py:60-73`` ``map_error_to_category`` + the
  mutually-exclusive bucket ladder :108-147).

The batch engine stores these as columns on reject/status rows so a
poison row can never fail a block (SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Optional


def causal_chain(exc: BaseException) -> list[dict]:
    """Exception -> [{'type', 'message'}] walking __context__
    (download_ontologies.py:28-38)."""
    chain = []
    seen = set()
    cur: Optional[BaseException] = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        chain.append({"type": type(cur).__name__, "message": str(cur)})
        cur = cur.__context__
    return chain


def type_chain(exc: BaseException) -> list[str]:
    return [c["type"] for c in causal_chain(exc)]


#: transport-level error names -> category (aggregate_results.py:60-73).
_ERROR_CATEGORIES = {
    "TooManyRedirects": "too-many-redirects",
    "SSLError": "ssl-error",
    "SSLCertVerificationError": "ssl-error",
    "NameResolutionError": "dns-error",
    "gaierror": "dns-error",
    "ConnectTimeoutError": "connect-timeout",
    "ConnectionRefusedError": "connection-refused",
    "ReadTimeout": "read-timeout",
}


def classify_exception(exc: BaseException) -> str:
    """Most specific recognizable type in the chain wins
    (get_more_specific_type, download_ontologies.py:40-49)."""
    for name in reversed(type_chain(exc)):
        if name in _ERROR_CATEGORIES:
            return _ERROR_CATEGORIES[name]
    return "transport-error"


def classify_status(status: int, content_type: Optional[str], is_rdf: bool) -> str:
    """The reference's mutually-exclusive accessibility buckets
    (aggregate_results.py:108-147), over the batch engine's status rows."""
    if status == 0:
        return "unreachable"
    if status == 200:
        if is_rdf:
            return "ok-rdf"
        if content_type and "html" in content_type:
            return "ok-but-html"
        return "ok-wrong-mimetype"
    if status in (301, 302, 303, 307, 308):
        return "redirect"
    if 400 <= status < 500:
        return f"client-error-{status}"
    if 500 <= status < 600:
        return f"server-error-{status}"
    return "other"
