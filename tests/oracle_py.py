"""Independent row-at-a-time oracle for the KG pipeline.

Deliberately mirrors the REFERENCE's one-request-at-a-time control flow
(``proxy_logic.py:163-273``) in plain Python over the fixture parquet --
no Ray, no shared pipeline code (negotiation outcomes are a hand-derived
table per reference semantics, matching is re-implemented naively, and
canonicalization is a textbook union-find).  Used by the e2e tests to
compute triple P/R for the gate (BASELINE.md: P/R >= 0.95).
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq

PASSTHROUGH = {100, 101, 102, 103, 200, 300, 301, 302, 303, 304, 307, 308, 451}
RDF_CT = {"application/rdf+xml", "application/owl+xml", "text/turtle", "application/n-triples"}
CT_TO_FMT = {"application/rdf+xml": "owl", "application/owl+xml": "owl",
             "text/turtle": "ttl", "application/n-triples": "nt"}

#: hand-derived (format, requested-mimes-after-patch) per fixture Accept
#: header under the default config (format=turtle, precedence=default) --
#: worked out by hand from utils/utils.py:60-157, NOT computed by the
#: library under test.
NEGOTIATION = {
    "text/turtle": ("ttl", ["text/turtle"]),
    "application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8": (
        "owl", ["application/rdf+xml", "text/turtle", "*/*"]),
    "application/n-triples;q=0.9,text/plain;q=0.8": (
        "nt", ["application/n-triples", "text/plain"]),
    "*/*": ("ttl", ["text/turtle"]),  # patched
    "application/json": (None, ["application/json"]),
    None: ("ttl", ["text/turtle"]),  # patched
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8": (
        None, ["text/html", "application/xhtml+xml", "image/webp", "application/xml", "*/*"]),
    "application/owl+xml,application/n-triples;q=0.5": (
        "owl", ["application/owl+xml", "application/n-triples"]),
}

#: negotiated format WITHOUT patching -- what ORIGINAL-policy rows see,
#: because utils.py:66-70 skips the patch for original+!patchAcceptUpstream.
NEGOTIATION_UNPATCHED = {
    "text/turtle": "ttl",
    "application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8": "owl",
    "application/n-triples;q=0.9,text/plain;q=0.8": "nt",
    "*/*": None,
    "application/json": None,
    None: None,
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8": None,
    "application/owl+xml,application/n-triples;q=0.5": "owl",
}

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
IS_DEFINED_BY = "http://www.w3.org/2000/01/rdf-schema#isDefinedBy"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJPROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"
EQUIV = "http://www.w3.org/2002/07/owl#equivalentClass"

IRI_RE = re.compile(r"https?://[^\s\"'<>()\[\]{}]+")


class Oracle:
    def __init__(self, paths, timestamp="2021-06-01"):
        self.index = {}
        for r in pq.read_table(paths.ontology_index).to_pylist():
            self.index[(r["host"], r["path"])] = (r["ontology_id"], r["iri"])
        self.origins = {
            r["ontology_id"]: (r["origin_status"], r["origin_content_type"])
            for r in pq.read_table(paths.origins).to_pylist()
        }
        self.content = {}
        self.versions = {}
        for r in pq.read_table(paths.snapshot_content).to_pylist():
            self.versions.setdefault(r["ontology_id"], []).append(r["version"])
            self.content[(r["ontology_id"], r["version"])] = r
        for v in self.versions.values():
            v.sort()
        self.avail = {
            (r["ontology_id"], r["version"], r["format"]): (r["status"], r["status_https"])
            for r in pq.read_table(paths.snapshot_status).to_pylist()
        }
        self.T = timestamp
        self.docs = pq.read_table(paths.documents).to_pylist()

    # -- matching: naive re-derivation of proxy_logic.py:88-144 ---------- #
    def match(self, iri):
        body = iri.split("://", 1)[1]
        slash = body.find("/")
        if slash < 0:
            host, path = body, ""
        else:
            host, path = body[:slash], body[slash:]
        path = path.split("#")[0].split("?")[0]
        host = host.split("#")[0].split("?")[0]
        if not path:
            for (h, p), v in self.index.items():
                if h == host:
                    return v
            return None
        probe = path
        if (host, probe) in self.index:
            return self.index[(host, probe)]
        if probe.endswith("/"):
            probe = probe.rstrip("/")
            if (host, probe) in self.index:
                return self.index[(host, probe)]
        parts = probe.split("/")
        for cand in ["/".join(parts[:-1]), "/".join(parts[:-1]) + "/",
                     "/".join(parts[:-2]), "/".join(parts[:-2]) + "/"]:
            if (host, cand) in self.index:
                return self.index[(host, cand)]
        return None

    # -- routing --------------------------------------------------------- #
    def route(self, ont, policy, accept):
        """-> (served: bool, status, category, version, fmt)"""
        fmt, req_mimes = NEGOTIATION[accept]
        if fmt is None and policy != "original":
            return (False, 500, "no-archivo-format", None, None)

        def origin():
            if ont is None:
                return (False, 502, "origin-unreachable", None, None)
            st, ct = self.origins[ont]
            if st == 0:
                return (False, 502, "origin-unreachable", None, None)
            if st != 200:
                return (False, st, "origin-error", None, None)
            if ct in RDF_CT:
                return (True, 200, "served-origin", self.versions[ont][-1], CT_TO_FMT[ct])
            return (False, 200, "origin-non-rdf", None, None)

        def archived(version):
            if ont is None:
                return (False, 404, "not-in-archivo", None, None)
            if version is None:
                return (False, 404, "no-version-at-timestamp", None, None)
            st, st_https = self.avail.get((ont, version, fmt), (404, 404))
            if st != 500:
                if st == 200:
                    return (True, 200, "served-archivo", version, fmt)
                return (False, st, "archivo-error", None, None)
            if st_https == 200:
                return (True, 200, "served-archivo", version, fmt)
            return (False, st_https, "archivo-error", None, None)

        if policy == "original":
            return origin()
        if policy == "originalFailoverLiveLatest":
            if ont is not None:
                st, ct = self.origins[ont]
                if st != 0 and st in PASSTHROUGH and ct in req_mimes:
                    if st == 200:
                        return origin()
                    # non-200 passthrough (301/304/451...) with matching
                    # mime is returned as-is (proxy_logic.py:218-229)
                    return (False, st, "origin-passthrough", None, None)
            return archived(self.versions[ont][-1] if ont else None)
        if policy == "latestArchived":
            return archived(self.versions[ont][-1] if ont else None)
        if policy == "timestampArchived":
            if ont is None:
                return (False, 404, "not-in-archivo", None, None)
            v = None
            for cand in self.versions[ont]:
                if cand <= self.T:
                    v = cand
            return archived(v)
        raise ValueError(policy)

    # -- full pipeline --------------------------------------------------- #
    def run(self):
        """-> (deduped rows dict, status rows list)

        deduped: {(s,p,o): (doc_id, version, fmt)} with min tie-break.
        """
        triples = {}
        statuses = []

        def emit(s, p, o, doc, ver, fmt):
            key = (s, p, o)
            val = (doc, ver, fmt)
            if key not in triples or val < triples[key]:
                triples[key] = val

        for doc in self.docs:
            for span in doc["spans"]:
                if span["kind"] != "text":
                    continue
                for m in IRI_RE.finditer(span["text"]):
                    iri = m.group(0).rstrip(".,;:!?")
                    hit = self.match(iri)
                    ont, ciri = hit if hit else (None, None)
                    served, status, category, ver, fmt = self.route(
                        ont, doc["policy"], doc["accept"]
                    )
                    fmt_col = (
                        NEGOTIATION_UNPATCHED[doc["accept"]]
                        if doc["policy"] == "original"
                        else NEGOTIATION[doc["accept"]][0]
                    )
                    statuses.append((doc["doc_id"], iri, status, category, fmt_col))
                    if not served:
                        continue
                    emit(iri, IS_DEFINED_BY, ciri, doc["doc_id"], ver, fmt)
                    c = self.content[(ont, ver)]
                    for cls in c["classes"]:
                        emit(cls, RDF_TYPE, OWL_CLASS, doc["doc_id"], ver, fmt)
                    for p_ in c["properties"]:
                        emit(p_, RDF_TYPE, OWL_OBJPROP, doc["doc_id"], ver, fmt)
                    for a, b in zip(c["same_as_a"], c["same_as_b"]):
                        emit(a, SAME_AS, b, doc["doc_id"], ver, fmt)
                    for a, b in zip(c["equiv_a"], c["equiv_b"]):
                        emit(a, EQUIV, b, doc["doc_id"], ver, fmt)
        return triples, statuses

    def canonicalize(self, triples):
        """Textbook union-find over sameAs edges; min IRI is the root."""
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra == rb:
                return
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

        for (s, p, o) in triples:
            if p in (SAME_AS, EQUIV):
                union(s, o)
        # path-compress fully, rooted at min of each component
        comp = {}
        for x in list(parent):
            comp.setdefault(find(x), []).append(x)
        mapping = {}
        for root, members in comp.items():
            m = min(members + [root])
            for x in members:
                mapping[x] = m
        out = {}
        for (s, p, o), val in triples.items():
            s2, o2 = mapping.get(s, s), mapping.get(o, o)
            if p in (SAME_AS, EQUIV) and s2 == o2:
                continue
            key = (s2, p, o2)
            if key not in out or val < out[key]:
                out[key] = val
        return out
