"""Content negotiation: Accept-header parsing, format selection, patching.

Faithful restatement of the reference's negotiation functions
(``ontologytimemachine/utils/utils.py``):

* ``parse_accept_header_with_priority``  (utils.py:124-133, M4)
* ``select_highest_priority_mime_from_archivo``  (utils.py:103-121, M5)
* ``get_mime_type`` / ``map_mime_to_format``  (utils.py:35-57, M6)
* ``get_format_from_accept_header``  (utils.py:136-157, M7)
* ``patch_accept_header`` = ``set_onto_format_headers``  (utils.py:60-100, M8)

All are pure functions; ``resolve_format_vector`` memoizes per distinct
Accept string so a million-row batch pays the parse cost once per unique
header, not once per row.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence

from ontology_time_machine_ray.config import (
    OntoFormatConfig,
    OntoPrecedence,
    OntoVersion,
)

#: Serializations Archivo can produce (utils.py:11-16).
ARCHIVO_MIMETYPES = (
    "application/rdf+xml",
    "application/owl+xml",
    "text/turtle",
    "application/n-triples",
)

#: Origin status codes that count as a usable response (utils.py:18-32, O4).
PASSTHROUGH_STATUS_CODES = frozenset(
    [100, 101, 102, 103, 200, 300, 301, 302, 303, 304, 307, 308, 451]
)

_FORMAT_TO_MIME = {
    "turtle": "text/turtle",
    "ntriples": "application/n-triples",
    "rdfxml": "application/rdf+xml",
    "htmldocu": "text/html",
}

_MIME_TO_FORMAT = {
    "application/rdf+xml": "owl",
    "application/owl+xml": "owl",
    "text/turtle": "ttl",
    "application/n-triples": "nt",
}

#: mimes whose payload is parseable RDF (drives "origin served RDF" checks,
#: cf. experiments/parse_ontologies.py feeding rapper only RDF payloads).
RDF_MIMETYPES = frozenset(_MIME_TO_FORMAT)


def get_mime_type(fmt: str = "turtle") -> str:
    """format -> preferred mime, defaulting to text/turtle (utils.py:35-45)."""
    return _FORMAT_TO_MIME.get(fmt, "text/turtle")


def map_mime_to_format(mime_type: Optional[str]) -> Optional[str]:
    """mime -> short format code, None when unsupported (utils.py:48-57)."""
    return _MIME_TO_FORMAT.get(mime_type)


def parse_accept_header_with_priority(accept_header: str) -> list[tuple[str, float]]:
    """Parse an Accept header into ``[(mime, q)]`` ordered by q descending,
    stable within equal q (utils.py:124-133; ordering matches the werkzeug
    behaviour locked down by reference tests/test_utils.py:47-59)."""
    import re

    # werkzeug 3.x (the reference's parser, utils.py:1,127): a q that does
    # not fullmatch this or falls outside [0, 1] DROPS the item entirely
    # ("Items with invalid q values are skipped", RFC 9110 behaviour)
    q_re = re.compile(r"-?\d+(\.\d+)?")

    items: list[tuple[str, float]] = []
    if not accept_header:
        return items
    for part in accept_header.split(","):
        part = part.strip()
        if not part:
            continue
        pieces = part.split(";")
        mime = pieces[0].strip()
        if not mime:
            continue
        q = 1.0
        valid = True
        for param in pieces[1:]:
            name, sep, q_str = param.strip().partition("=")
            # werkzeug options-parser semantics (probed against werkzeug
            # itself): the param NAME is case-insensitive ('Q=0.1' counts),
            # but whitespace touching '=' invalidates the param -- it is
            # dropped and the item keeps its default q=1
            if not sep or name.lower() != "q":
                continue
            if q_str != q_str.lstrip():
                break  # 'q= 0.5': dropped param, default q=1
            q_str = q_str.rstrip()
            if q_str == "":
                # 'q=' with no value: the options parser drops the
                # empty param, so the item keeps its default q=1
                break
            if q_re.fullmatch(q_str) is None:
                valid = False
                break
            q = float(q_str)
            if q < 0.0 or q > 1.0:
                valid = False
            break
        if valid:
            items.append((mime, q))
    # stable sort by q descending preserves appearance order within a tie
    items.sort(key=lambda t: t[1], reverse=True)
    # normalize q=1.0 -> 1 to byte-match the reference expectations
    return [(m, int(q) if q == int(q) else q) for m, q in items]


def select_highest_priority_mime_from_archivo(
    mime_list: Sequence[tuple[str, float]],
) -> Optional[str]:
    """Among the top-q tie group, first mime Archivo supports; else None
    (utils.py:103-121, O1 in-row top-k)."""
    if not mime_list:
        return None
    ordered = sorted(mime_list, key=lambda x: x[1], reverse=True)
    highest = ordered[0][1]
    for mime, q in ordered:
        if q != highest:
            break
        if mime in ARCHIVO_MIMETYPES:
            return mime
    return None


def get_format_from_accept_header(headers: Optional[dict]) -> Optional[str]:
    """Composite M7 = parse |> select |> map (utils.py:136-157)."""
    if not headers:
        return None
    accept_header = headers.get("Accept")
    if not accept_header:
        return None
    selected = select_highest_priority_mime_from_archivo(
        parse_accept_header_with_priority(accept_header)
    )
    if not selected:
        return None
    return map_mime_to_format(selected)


def patch_decision(
    accept: Optional[str],
    fmt_conf: OntoFormatConfig,
    onto_version: OntoVersion,
) -> bool:
    """Whether the patch policy REPLACES the Accept header with the
    configured mime (the branch structure of utils.py:60-100).  Split out
    of :func:`patch_accept_header` so the config-grid sweep can report the
    decision itself -- a string comparison of patched-vs-original cannot
    distinguish "policy forced text/turtle" from "client already sent
    text/turtle"."""
    if onto_version == OntoVersion.ORIGINAL and not fmt_conf.patch_accept_upstream:
        return False

    mime_type = get_mime_type(fmt_conf.format.value)
    parsed = parse_accept_header_with_priority(accept or "")
    req_mimes = [m for m, _ in parsed]
    soft = fmt_conf.precedence in (OntoPrecedence.DEFAULT, OntoPrecedence.ENFORCED_PRIORITY)

    if not req_mimes and soft:
        return True
    if len(req_mimes) == 1 and req_mimes[0] == "*/*" and soft:
        return True
    if (
        len(req_mimes) > 1
        and mime_type in req_mimes
        and fmt_conf.precedence == OntoPrecedence.ENFORCED_PRIORITY
    ):
        return True
    if fmt_conf.precedence == OntoPrecedence.ALWAYS:
        return True
    return False


def patch_accept_header(
    accept: Optional[str],
    fmt_conf: OntoFormatConfig,
    onto_version: OntoVersion,
) -> Optional[str]:
    """The 4-branch Accept-header patch policy (utils.py:60-100, M8).

    Returns the (possibly rewritten) Accept header value.  Branches, in
    reference order:

    1. ORIGINAL + not patchAcceptUpstream  -> untouched (utils.py:66-70)
    2. empty header + precedence in {default, enforcedPriority} -> configured
       mime (utils.py:81-85)
    3. sole ``*/*`` + same precedences -> configured mime (utils.py:86-92)
    4. >1 mimes, configured mime among them, ENFORCED_PRIORITY -> configured
       mime (utils.py:93-98)
    5. precedence ALWAYS -> configured mime (utils.py:99-100)
    """
    if patch_decision(accept, fmt_conf, onto_version):
        return get_mime_type(fmt_conf.format.value)
    return accept


@lru_cache(maxsize=4096)
def _negotiate_one(
    accept: Optional[str],
    fmt: str,
    precedence: str,
    patch_upstream: bool,
    policy: str,
) -> tuple[Optional[str], Optional[str]]:
    """(patched_accept, format) for one distinct header/config combo."""
    fmt_conf = OntoFormatConfig(
        format=type(OntoFormatConfig().format)(fmt),
        precedence=OntoPrecedence(precedence),
        patch_accept_upstream=patch_upstream,
    )
    patched = patch_accept_header(accept, fmt_conf, OntoVersion(policy))
    resolved = get_format_from_accept_header({"Accept": patched} if patched else None)
    return patched, resolved


def resolve_format_vector(
    accepts: Sequence[Optional[str]],
    policies: Sequence[str],
    fmt_conf: OntoFormatConfig,
) -> tuple[list[Optional[str]], list[Optional[str]]]:
    """Vectorized M8∘M7 over a batch: memoized per distinct
    (accept, policy) so the per-row cost is a dict lookup."""
    patched_out: list[Optional[str]] = []
    fmt_out: list[Optional[str]] = []
    for accept, policy in zip(accepts, policies):
        patched, resolved = _negotiate_one(
            accept or None,
            fmt_conf.format.value,
            fmt_conf.precedence.value,
            fmt_conf.patch_accept_upstream,
            policy,
        )
        patched_out.append(patched)
        fmt_out.append(resolved)
    return patched_out, fmt_out
