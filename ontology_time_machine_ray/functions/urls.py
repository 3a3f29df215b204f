"""IRI handling: split, normalization, truncation-candidate generation.

The heart of mention detection is the reference's Archivo membership check
with path truncation and canonical-path rewrite
(``ontologytimemachine/utils/proxy_logic.py:88-144``, M1/J1).  Re-expressed
set-at-a-time: each extracted IRI expands into an ordered candidate list
(exact > stripped-slash > parent > parent+'/' > grandparent >
grandparent+'/'); the lowest-ranked candidate present in the index wins and
its canonical form replaces the surface form (the reference's
``set_request_path`` side effect, proxy_logic.py:111-139).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

#: IRI scanner for text spans.  Deliberately conservative: http(s) IRIs up
#: to whitespace / quote / angle-bracket / closing-paren.
IRI_RE = re.compile(r"https?://[^\s\"'<>()\[\]{}]+")

#: trailing punctuation that is prose, not IRI (e.g. "see http://x/y.")
_TRAILING_PUNCT = ".,;:!?"


def extract_iris(text: str) -> list[str]:
    """All http(s) IRIs in a text span, prose punctuation stripped."""
    out = []
    for m in IRI_RE.finditer(text):
        iri = m.group(0).rstrip(_TRAILING_PUNCT)
        if iri:
            out.append(iri)
    return out


def split_iri(iri: str) -> tuple[str, str, str]:
    """IRI -> (scheme, host, path); fragment dropped.

    The reference matches on ``(netloc, path)`` parsed with urlparse
    (download_archivo_urls.py:123-125).  Fragments never reach an HTTP
    server, so ``http://h/p#Term`` matches index entry ``(h, /p)`` -- we
    strip the fragment before matching to mirror that.
    """
    parsed = urlparse(iri)
    return parsed.scheme, parsed.netloc, parsed.path


def truncation_candidates(path: str) -> list[str]:
    """Ordered candidate paths per proxy_logic.py:103-141.

    1. exact path
    2. path with a single trailing '/' stripped (only if it ends with '/')
    3. parent (drop last segment)            -- computed from the stripped form
    4. parent + '/'
    5. grandparent (drop last two segments)
    6. grandparent + '/'

    Duplicates are removed preserving first occurrence, so rank always
    refers to the highest-priority way the candidate arises.
    """
    cands: list[str] = [path]
    # exactly ONE trailing slash stripped (the reference's single
    # set_request_path strip): rstrip('/') would collapse 'p//' to 'p'
    # and skip the 'p/' candidate entirely
    stripped = path[:-1] if path.endswith("/") else path
    cands.append(stripped)
    parts = stripped.split("/")
    parent = "/".join(parts[:-1])
    cands.append(parent)
    cands.append(parent + "/")
    grandparent = "/".join(parts[:-2])
    cands.append(grandparent)
    cands.append(grandparent + "/")
    seen: set[str] = set()
    out: list[str] = []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def https_flip(iri: str) -> str:
    """http -> https scheme flip used by the Archivo 500-retry
    (proxy_logic.py:256, O5)."""
    return iri.replace("http://", "https://", 1)


def mangle_for_path(url: str) -> str:
    """Partition-path sanitizer: '/', ':', '.' -> '_'
    (experiments/download_ontologies.py:87, M12)."""
    return url.replace("/", "_").replace(":", "_").replace(".", "_")
