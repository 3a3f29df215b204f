"""Content-negotiation unit tests.

Direct ports of the reference's ``tests/test_utils.py`` cases (same inputs,
same expected outputs) plus the M8 patch-policy matrix from
``utils/utils.py:60-100`` / README.md:33-45.
"""

from ontology_time_machine_ray.config import (
    OntoFormat,
    OntoFormatConfig,
    OntoPrecedence,
    OntoVersion,
)
from ontology_time_machine_ray.functions.negotiate import (
    get_format_from_accept_header,
    get_mime_type,
    map_mime_to_format,
    parse_accept_header_with_priority,
    patch_accept_header,
    resolve_format_vector,
    select_highest_priority_mime_from_archivo,
)


def test_get_mime_type():
    # reference tests/test_utils.py:18-23
    assert get_mime_type("turtle") == "text/turtle"
    assert get_mime_type("rdfxml") == "application/rdf+xml"
    assert get_mime_type("ntriples") == "application/n-triples"
    assert get_mime_type("htmldocu") == "text/html"
    assert get_mime_type("unknown") == "text/turtle"  # default


def test_map_mime_to_format():
    # reference tests/test_utils.py:25-30
    assert map_mime_to_format("application/rdf+xml") == "owl"
    assert map_mime_to_format("application/owl+xml") == "owl"
    assert map_mime_to_format("text/turtle") == "ttl"
    assert map_mime_to_format("application/n-triples") == "nt"
    assert map_mime_to_format("unknown/mime") is None


def test_select_highest_priority_mime():
    # reference tests/test_utils.py:32-45
    assert (
        select_highest_priority_mime_from_archivo(
            [
                ("application/rdf+xml", 1.0),
                ("text/turtle", 0.8),
                ("application/n-triples", 1.0),
            ]
        )
        == "application/rdf+xml"
    )
    assert select_highest_priority_mime_from_archivo([("text/html", 0.8)]) is None


def test_parse_accept_header_with_priority():
    # reference tests/test_utils.py:47-59 (werkzeug-compatible ordering)
    header = "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8"
    assert parse_accept_header_with_priority(header) == [
        ("text/html", 1),
        ("application/xhtml+xml", 1),
        ("image/webp", 1),
        ("application/xml", 0.9),
        ("*/*", 0.8),
    ]


def test_get_format_from_accept_header():
    # reference tests/test_utils.py:61-68, 85-97
    assert (
        get_format_from_accept_header(
            {"Accept": "application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8"}
        )
        == "owl"
    )
    assert get_format_from_accept_header({}) is None
    assert get_format_from_accept_header({"Accept": "application/json"}) is None
    assert get_format_from_accept_header({"Accept": "text/turtle"}) == "ttl"


DEFAULT = OntoFormatConfig()
ENFORCED = OntoFormatConfig(precedence=OntoPrecedence.ENFORCED_PRIORITY)
ALWAYS = OntoFormatConfig(precedence=OntoPrecedence.ALWAYS)
NT_ENFORCED = OntoFormatConfig(
    format=OntoFormat.NTRIPLES, precedence=OntoPrecedence.ENFORCED_PRIORITY
)


def test_patch_accept_header_matrix():
    # utils/utils.py:60-100 branch by branch
    latest = OntoVersion.LATEST_ARCHIVED
    original = OntoVersion.ORIGINAL
    # branch 1: ORIGINAL without patchAcceptUpstream: untouched
    assert patch_accept_header("application/json", DEFAULT, original) == "application/json"
    assert patch_accept_header(None, DEFAULT, original) is None
    # branch 2: absent header -> configured mime
    assert patch_accept_header(None, DEFAULT, latest) == "text/turtle"
    assert patch_accept_header("", ENFORCED, latest) == "text/turtle"
    # branch 3: sole */* -> configured mime
    assert patch_accept_header("*/*", DEFAULT, latest) == "text/turtle"
    # branch 4: mime present among several + enforcedPriority
    multi = "application/n-triples,text/html;q=0.5"
    assert patch_accept_header(multi, NT_ENFORCED, latest) == "application/n-triples"
    # same input under default precedence: untouched
    assert patch_accept_header(multi, DEFAULT, latest) == multi
    # branch 5: ALWAYS overrides anything
    assert patch_accept_header("application/json", ALWAYS, latest) == "text/turtle"
    # no branch matches: untouched
    assert patch_accept_header("application/json", DEFAULT, latest) == "application/json"


def test_resolve_format_vector():
    accepts = [
        "text/turtle",
        "application/rdf+xml,text/turtle;q=0.9",
        "*/*",
        None,
        "application/json",
        "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8",
    ]
    policies = ["latestArchived"] * len(accepts)
    patched, fmts = resolve_format_vector(accepts, policies, DEFAULT)
    assert fmts == ["ttl", "owl", "ttl", "ttl", None, None]
    assert patched[2] == "text/turtle" and patched[3] == "text/turtle"


def test_config_grid_invariants(ray_session, sf_dir):
    """kg_config_grid semantic invariants over the full 96-combo sweep."""
    import pandas as pd

    from ontology_time_machine_ray.pipelines.queries import QUERIES

    df = QUERIES["kg_config_grid"](sf_dir).to_pandas()
    key = ["onto_format", "onto_precedence", "patch_accept_upstream", "onto_version"]
    per_combo = df.groupby(key, dropna=False)["n_docs"].sum()
    # every combo partitions the whole corpus
    assert per_combo.nunique() == 1
    n_corpus = int(per_combo.iloc[0])
    assert set(df["onto_format"]) == {"turtle", "ntriples", "rdfxml", "htmldocu"}
    assert len(per_combo) == 4 * 3 * 2 * 4

    # ALWAYS precedence outside the original+unpatched guard rewrites ALL
    # headers to the configured mime -> one resolved format per combo
    always = df[
        (df["onto_precedence"] == "always")
        & ~((df["onto_version"] == "original") & (df["patch_accept_upstream"] == 0))
    ]
    expect = {"turtle": "ttl", "ntriples": "nt", "rdfxml": "owl", "htmldocu": None}
    for fmt, grp in always.groupby("onto_format"):
        assert (grp["n_patched"] == grp["n_docs"]).all()
        resolved = grp["resolved_format"]
        assert set(pd.isna(v) and None or v for v in resolved) == {expect[fmt]}

    # original + patch_accept_upstream=0 never patches (utils.py:66-70) and
    # resolves identically for every format/precedence
    orig = df[(df["onto_version"] == "original") & (df["patch_accept_upstream"] == 0)]
    assert (orig["n_patched"] == 0).all()
    base = None
    for _, grp in orig.groupby(["onto_format", "onto_precedence"]):
        dist = (
            grp.assign(resolved_format=grp["resolved_format"].fillna("<null>"))
            .set_index("resolved_format")["n_docs"]
            .sort_index()
        )
        if base is None:
            base = dist
        else:
            pd.testing.assert_series_equal(dist, base)
    assert base.sum() == n_corpus
