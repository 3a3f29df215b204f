"""Per-client auth-config parse (M10/M11) -- ports the reference's client
setup: tests/test_proxy_auth_header_archivo.py:81-86 builds the proxy URL
as ``quote(f"--ontoVersion {mode}") : quote(password)``, which reaches the
proxy as basic-auth credentials whose username is a www-form/percent
encoded CLI string (proxy_wrapper.py:134-151 decodes the base64,
proxy_logic.py:65-86 re-parses it with argparse semantics)."""

from __future__ import annotations

import base64

import pytest

from ontology_time_machine_ray.functions.authparse import (
    DEFAULTS,
    parse_client_config,
)


def basic(creds: str) -> str:
    return "Basic " + base64.b64encode(creds.encode()).decode()


@pytest.mark.parametrize(
    "mode", ["original", "originalFailoverLiveLatest", "latestArchived"]
)
def test_reference_quoting_case(mode):
    # exactly the reference test's construction: quote() percent-encodes
    # the space of "--ontoVersion <mode>"
    from urllib.parse import quote

    username = quote(f"--ontoVersion {mode}")
    out = parse_client_config(basic(f"{username}:my_password"))
    assert out["parse_ok"] == 1
    assert out["ontoVersion"] == mode
    # untouched options keep reference defaults (config.py:88-101)
    assert out["ontoFormat"] == "ntriples"
    assert out["httpsInterception"] == "all"


def test_plus_form_encoding_and_flags():
    out = parse_client_config(basic("--patchAcceptUpstream+--restrictedAccess:x"))
    assert out["parse_ok"] == 1
    assert out["patchAcceptUpstream"] is True
    assert out["restrictedAccess"] is True
    assert out["disableRemovingRedirects"] is False


def test_enum_case_insensitive_canonicalization():
    # enum_parser (config.py:106-115) matches case-insensitively and the
    # canonical enum value is what the config carries
    out = parse_client_config(basic("--ontoVersion+LATESTARCHIVED:x"))
    assert out["parse_ok"] == 1
    assert out["ontoVersion"] == "latestArchived"


def test_last_occurrence_wins():
    out = parse_client_config(basic("--ontoFormat+turtle+--ontoFormat+rdfxml:x"))
    assert out["parse_ok"] == 1
    assert out["ontoFormat"] == "rdfxml"


@pytest.mark.parametrize(
    "creds,reason",
    [
        ("--ontoVersion+nonsense:x", "bad-enum-value"),
        ("--bogusFlag+x:x", "unknown-arg"),
        ("a:b:c", "bad-credentials"),  # reference split(':') unpack raises
        (":pw", "bad-args"),  # argparse([""]) errors
        ("stray --ontoFormat turtle:x", "bad-args"),
        ("--ontoFormat:x", "missing-value"),
        ("--ontoFormat --restrictedAccess:x", "missing-value"),
        ("--port+abc:x", "bad-port"),
        ("--host:x", "missing-value"),
    ],
)
def test_parse_errors(creds, reason):
    out = parse_client_config(basic(creds))
    assert out["parse_ok"] == 0
    assert out["error"] == reason
    assert out["ontoVersion"] is None  # failed parse yields no config


def test_non_basic_and_missing_auth_mean_no_client_config():
    # proxy_wrapper.py:145-146: a non-basic auth type returns None -- the
    # proxy falls back to its startup config, same as no header at all
    assert parse_client_config("Bearer xyz")["error"] == "no-auth"
    assert parse_client_config(None)["error"] == "no-auth"
    assert parse_client_config("Basic !!!notbase64!!!")["error"] == "bad-base64"
    assert parse_client_config("Basic")["error"] == "bad-header"


def test_host_nargs_and_port_consume_values():
    out = parse_client_config(
        basic("--host+0.0.0.0+example.org+--port+9000+--ontoFormat+turtle:x")
    )
    assert out["parse_ok"] == 1
    assert out["ontoFormat"] == "turtle"


def test_defaults_match_reference_config():
    out = parse_client_config(basic("--ontoVersion+original:x"))
    for k, v in DEFAULTS.items():
        if k != "ontoVersion":
            assert out[k] == v
