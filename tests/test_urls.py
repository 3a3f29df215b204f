"""IRI extraction / truncation-candidate semantics (proxy_logic.py:88-144)."""

from ontology_time_machine_ray.functions.urls import (
    extract_iris,
    https_flip,
    mangle_for_path,
    split_iri,
    truncation_candidates,
)


def test_extract_iris():
    text = 'See http://ex.org/onto/Term, and <https://w3.org/ns/> plus "http://a.b/c#frag".'
    assert extract_iris(text) == [
        "http://ex.org/onto/Term",
        "https://w3.org/ns/",
        "http://a.b/c#frag",
    ]
    assert extract_iris("no iris here") == []


def test_split_iri_drops_fragment():
    assert split_iri("http://ex.org/onto#Term") == ("http", "ex.org", "/onto")
    assert split_iri("https://ex.org/a/b/") == ("https", "ex.org", "/a/b/")


def test_truncation_candidates_order():
    # non-slash path: exact == stripped, parent chain per proxy_logic.py:115-141
    assert truncation_candidates("/def/ont/Term") == [
        "/def/ont/Term",
        "/def/ont",
        "/def/ont/",
        "/def",
        "/def/",
    ]
    # trailing-slash path: strip first (proxy_logic.py:108-113)
    assert truncation_candidates("/ns/v4/") == [
        "/ns/v4/",
        "/ns/v4",
        "/ns",
        "/ns/",
        "",
        "/",
    ]


def test_misc_scalars():
    assert https_flip("http://a/b") == "https://a/b"
    assert https_flip("https://a/b") == "https://a/b"
    assert mangle_for_path("http://a.b/c") == "http___a_b_c"
