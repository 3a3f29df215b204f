"""Per-client configuration via the Proxy-Authorization header (M10/M11).

The reference lets a client smuggle a full CLI configuration through
HTTP basic auth: the *username* of ``Proxy-Authorization: Basic <b64>``
is a www-form-encoded command-line string that is re-parsed into a
``Config`` per request (``proxy_wrapper.py:134-151`` decodes the base64,
``proxy_logic.py:65-86`` splits ``username:password`` and feeds
``username.split(" ")`` to ``utils/config.py:141-337 parse_arguments``).

This module restates that parse as a deterministic pure function over an
auth-header string -- errors are data (``parse_ok=0``), not argparse
``SystemExit``.  Semantics mirrored:

* header split: ``<type> <credentials>``; a non-"basic" type yields *no*
  client config (proxy_wrapper.py:145-146 returns None);
* base64 decode of the credentials; ``username:password`` must contain
  exactly one ':' (the reference's bare ``split(":")`` unpack raises on
  more);
* the username is www-form decoded (''+''/%XX -> char; the reference
  comment at custom_proxy.py:123-125 -- "is in www-form encoding");
* tokens: every argument is ``--name`` (flags take no value, options take
  the next token), enum values match case-insensitively
  (config.py:106-115 enum_parser), unknown arguments / stray positionals
  / missing values are parse errors (argparse behaviour);
* repeated options: last occurrence wins (argparse).
"""

from __future__ import annotations

from urllib.parse import unquote_plus

#: option name -> allowed enum values (canonical casing), from
#: utils/config.py:48-78.
ENUM_OPTIONS: dict[str, tuple[str, ...]] = {
    "ontoFormat": ("turtle", "ntriples", "rdfxml", "htmldocu"),
    "ontoPrecedence": ("default", "enforcedPriority", "always"),
    "ontoVersion": (
        "original",
        "originalFailoverLiveLatest",
        "latestArchived",
        "timestampArchived",
    ),
    "httpsInterception": ("none", "all", "block", "archivo"),
    "clientConfigViaProxyAuth": ("ignore", "required", "optional"),
    "logLevelTimeMachine": ("debug", "info", "warning", "error", "critical"),
    "logLevelBase": ("debug", "info", "warning", "error", "critical"),
}

#: store_true flags (config.py parse_arguments).
FLAG_OPTIONS = ("patchAcceptUpstream", "restrictedAccess", "disableRemovingRedirects")

#: defaults from the reference Config dataclass (config.py:88-101).
DEFAULTS: dict[str, object] = {
    "ontoFormat": "ntriples",
    "ontoPrecedence": "enforcedPriority",
    "ontoVersion": "latestArchived",
    "httpsInterception": "all",
    "clientConfigViaProxyAuth": "ignore",
    "logLevelTimeMachine": "debug",
    "logLevelBase": "info",
    "patchAcceptUpstream": False,
    "restrictedAccess": False,
    "disableRemovingRedirects": False,
}

_ENUM_LOOKUP = {
    name: {v.lower(): v for v in values} for name, values in ENUM_OPTIONS.items()
}


def decode_credentials(auth_header: str | None) -> tuple[str | None, str | None]:
    """``Proxy-Authorization`` value -> decoded ``user:pass`` string, or
    (None, reason).  Mirrors proxy_wrapper.get_authentication_from_request:
    non-basic auth types yield no credentials (not an error)."""
    import base64

    if not auth_header:
        return None, "no-auth"
    parts = auth_header.split()
    if len(parts) != 2:
        return None, "bad-header"
    auth_type, encoded = parts
    if auth_type.lower() != "basic":
        return None, "no-auth"  # reference returns None: no client config
    try:
        return base64.b64decode(encoded).decode(), None
    except Exception:
        return None, "bad-base64"


def parse_client_config(auth_header: str | None) -> dict:
    """Auth header -> per-client config dict.

    Returns ``{"parse_ok": 1, "error": None, **config}`` on success and
    ``{"parse_ok": 0, "error": reason}`` with None config values
    otherwise."""
    failed = {"parse_ok": 0, **{k: None for k in DEFAULTS}}

    creds, reason = decode_credentials(auth_header)
    if creds is None:
        return {**failed, "error": reason}
    if creds.count(":") != 1:
        # proxy_logic.py:70 `username, password = split(":")` raises
        return {**failed, "error": "bad-credentials"}
    username = unquote_plus(creds.split(":", 1)[0])
    tokens = username.split(" ")

    cfg = dict(DEFAULTS)
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if not t.startswith("--") or t == "--":
            # empty token / stray positional: argparse errors out
            return {**failed, "error": "bad-args"}
        name = t[2:]
        if name in FLAG_OPTIONS:
            cfg[name] = True
            i += 1
            continue
        if name in ENUM_OPTIONS:
            if i + 1 >= len(tokens) or tokens[i + 1].startswith("--"):
                return {**failed, "error": "missing-value"}
            canonical = _ENUM_LOOKUP[name].get(tokens[i + 1].lower())
            if canonical is None:
                return {**failed, "error": "bad-enum-value"}
            cfg[name] = canonical
            i += 2
            continue
        if name == "port":
            if i + 1 >= len(tokens) or not tokens[i + 1].isdigit():
                return {**failed, "error": "bad-port"}
            i += 2
            continue
        if name == "host":  # nargs='+': consume >=1 non-flag values
            j = i + 1
            while j < len(tokens) and not tokens[j].startswith("--"):
                j += 1
            if j == i + 1:
                return {**failed, "error": "missing-value"}
            i = j
            continue
        return {**failed, "error": "unknown-arg"}
    return {"parse_ok": 1, "error": None, **cfg}
