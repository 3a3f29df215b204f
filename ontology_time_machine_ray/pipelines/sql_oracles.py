"""DuckDB oracle SQL for every SQL-expressible query.

Each statement is an INDEPENDENT restatement of the operator semantics in
ANSI-ish SQL (DuckDB dialect) over the same parquet the Ray pipeline
reads: testdata views (``documents``, ``lineitem``, ...) plus the fixture
tables via ``read_parquet('<fixture_root>/...')``.  The KG oracle
re-derives the reference's decision logic from scratch: truncation
matching as a rank-ordered candidate join (proxy_logic.py:88-144),
negotiation as a hand-built CASE table over the 8 corpus Accept headers
(utils.py:60-157), policy routing incl. the failover cascade and the
Archivo https retry (proxy_logic.py:163-273), as-of version resolution,
triple expansion, window-function dedup, and recursive-CTE connected
components for canonicalization.

Determinism contracts shared with the Ray side: money/value aggregates on
cent-scaled BIGINTs, Jaccard thresholds on integers, fingerprints via
``md5``, tie-breaks always written out explicitly.
"""

from __future__ import annotations

#: the detector's IRI scanner (functions/urls.py IRI_RE) with the single
#: quote doubled for SQL string-literal escaping.
IRI_REGEX = r"""https?://[^\s"''<>()\[\]{}]+"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
IS_DEFINED_BY = "http://www.w3.org/2000/01/rdf-schema#isDefinedBy"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
OWL_OBJPROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"
EQUIV_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"

A_OWL1 = "application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8"
A_NT = "application/n-triples;q=0.9,text/plain;q=0.8"
A_HTML = "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8"
A_OWL2 = "application/owl+xml,application/n-triples;q=0.5"

#: shared CTE chain: interleaved docs -> mentions with index match.
_MENTIONS_CTES = f"""
  raw_spans AS (
    SELECT doc_id, accept, policy,
           unnest(spans) AS span,
           unnest(range(len(spans))) AS span_idx
    FROM read_parquet('__ROOT__/documents_interleaved.parquet')
  ),
  iris AS (
    SELECT doc_id, accept, policy, CAST(span_idx AS INTEGER) AS span_idx,
           unnest(regexp_extract_all(span.text, '{IRI_REGEX}')) AS raw_iri
    FROM raw_spans
    WHERE span.kind = 'text'
  ),
  split0 AS (
    SELECT doc_id, accept, policy, span_idx,
           regexp_replace(raw_iri, '[.,;:!?]+$', '') AS term_iri
    FROM iris
    WHERE regexp_replace(raw_iri, '[.,;:!?]+$', '') <> ''
  ),
  split1 AS (
    SELECT *, substr(term_iri, strpos(term_iri, '://') + 3) AS body FROM split0
  ),
  hp AS (
    SELECT *,
      CASE WHEN strpos(body, '/') = 0
           THEN split_part(split_part(body, '#', 1), '?', 1)
           ELSE substr(body, 1, strpos(body, '/') - 1) END AS host,
      CASE WHEN strpos(body, '/') = 0 THEN ''
           ELSE split_part(split_part(substr(body, strpos(body, '/')), '#', 1), '?', 1)
      END AS path
    FROM split1
  ),
  m AS (
    SELECT row_number() OVER () AS mid, *,
      CASE WHEN path LIKE '%/' THEN rtrim(path, '/') ELSE path END AS stripped
    FROM hp
  ),
  m2 AS (
    SELECT *, regexp_replace(stripped, '/[^/]*$', '') AS parent,
           regexp_replace(regexp_replace(stripped, '/[^/]*$', ''), '/[^/]*$', '') AS grandparent
    FROM m
  ),
  cand AS (
              SELECT mid, host, 0 AS rank, path        AS cand FROM m2
    UNION ALL SELECT mid, host, 1, stripped            FROM m2
    UNION ALL SELECT mid, host, 2, parent              FROM m2
    UNION ALL SELECT mid, host, 3, parent || '/'       FROM m2
    UNION ALL SELECT mid, host, 4, grandparent         FROM m2
    UNION ALL SELECT mid, host, 5, grandparent || '/'  FROM m2
  ),
  idx AS (SELECT * FROM read_parquet('__ROOT__/ontology_index.parquet')),
  hits AS (
    SELECT c.mid, min(c.rank) AS best_rank
    FROM cand c JOIN idx i ON i.host = c.host AND i.path = c.cand
    GROUP BY c.mid
  ),
  mentions AS (
    SELECT m2.doc_id, m2.span_idx, m2.term_iri, m2.accept, m2.policy,
           CASE WHEN CAST(concat('0x',
                  substr(md5(m2.doc_id || ':method'), 1, 16)) AS UBIGINT) % 8 = 0
                THEN 'HEAD' ELSE 'GET' END AS method,
           i.ontology_id, i.iri AS canonical_iri
    FROM m2
    LEFT JOIN hits h ON h.mid = m2.mid
    LEFT JOIN cand c ON c.mid = m2.mid AND c.rank = h.best_rank
    LEFT JOIN idx i ON i.host = c.host AND i.path = c.cand
  )"""

#: negotiation + policy routing on top of mentions.
_ROUTING_CTES = f"""
  neg AS (
    SELECT *,
      CASE WHEN accept IS NULL THEN 'ttl'
           WHEN accept = 'text/turtle' THEN 'ttl'
           WHEN accept = '*/*' THEN 'ttl'
           WHEN accept = '{A_OWL1}' THEN 'owl'
           WHEN accept = '{A_NT}' THEN 'nt'
           WHEN accept = '{A_OWL2}' THEN 'owl'
           ELSE NULL END AS fmt_patched,
      CASE WHEN accept = 'text/turtle' THEN 'ttl'
           WHEN accept = '{A_OWL1}' THEN 'owl'
           WHEN accept = '{A_NT}' THEN 'nt'
           WHEN accept = '{A_OWL2}' THEN 'owl'
           ELSE NULL END AS fmt_unpatched,
      (accept IS NULL OR accept IN ('text/turtle', '*/*', '{A_OWL1}')) AS ttl_in_req,
      (accept = '{A_HTML}') AS html_in_req
    FROM mentions
  ),
  content AS (SELECT * FROM read_parquet('__ROOT__/snapshot_content.parquet')),
  avail AS (SELECT * FROM read_parquet('__ROOT__/snapshot_status.parquet')),
  origins AS (SELECT * FROM read_parquet('__ROOT__/origins.parquet')),
  latest AS (SELECT ontology_id, max(version) AS latest_version FROM content GROUP BY 1),
  as_of AS (SELECT ontology_id, max(version) AS asof_version FROM content
           WHERE version <= '__T__' GROUP BY 1),
  routed AS (
    SELECT n.*, o.origin_status, o.origin_content_type,
           l.latest_version, a.asof_version,
      CASE WHEN n.policy = 'original' THEN n.fmt_unpatched ELSE n.fmt_patched END AS report_fmt,
      CASE WHEN n.policy = 'timestampArchived' THEN a.asof_version
           ELSE l.latest_version END AS arch_version,
      (n.policy = 'original'
       OR (n.policy = 'originalFailoverLiveLatest' AND n.ontology_id IS NOT NULL
           AND o.origin_status IN (100,101,102,103,200,300,301,302,303,304,307,308,451)
           AND ((o.origin_content_type = 'text/turtle' AND n.ttl_in_req)
                OR (o.origin_content_type = 'text/html' AND n.html_in_req)))
      ) AS origin_branch
    FROM neg n
    LEFT JOIN origins o USING (ontology_id)
    LEFT JOIN latest l USING (ontology_id)
    LEFT JOIN as_of a USING (ontology_id)
  ),
  routed2 AS (
    SELECT r.*,
      CASE WHEN s.status IS NULL THEN 404
           WHEN s.status != 500 THEN s.status
           ELSE s.status_https END AS arch_status
    FROM routed r
    LEFT JOIN avail s ON s.ontology_id = r.ontology_id
                     AND s.version = r.arch_version AND s.format = r.fmt_patched
  ),
  outcome AS (
    SELECT *,
      CASE
        WHEN policy != 'original' AND fmt_patched IS NULL THEN FALSE
        WHEN origin_branch THEN
          (ontology_id IS NOT NULL AND origin_status = 200
           AND origin_content_type = 'text/turtle')
        ELSE (ontology_id IS NOT NULL AND arch_version IS NOT NULL AND arch_status = 200)
      END AS served,
      CASE WHEN origin_branch THEN latest_version ELSE arch_version END AS serve_version,
      CASE WHEN origin_branch THEN 'ttl' ELSE fmt_patched END AS serve_fmt,
      CASE
        WHEN policy != 'original' AND fmt_patched IS NULL THEN 500
        WHEN origin_branch THEN
          CASE WHEN ontology_id IS NULL THEN 502
               WHEN origin_status = 0 THEN 502
               ELSE origin_status END
        WHEN ontology_id IS NULL THEN 404
        WHEN policy = 'timestampArchived' AND arch_version IS NULL THEN 404
        ELSE arch_status
      END AS status,
      CASE
        WHEN policy != 'original' AND fmt_patched IS NULL THEN 'no-archivo-format'
        WHEN origin_branch THEN
          CASE WHEN ontology_id IS NULL OR origin_status = 0 THEN 'origin-unreachable'
               -- failover passthrough: non-200 passthrough status with a
               -- matching mime is returned as-is (proxy_logic.py:218-229)
               WHEN policy != 'original' AND origin_status != 200 THEN 'origin-passthrough'
               WHEN origin_status != 200 THEN 'origin-error'
               WHEN origin_content_type = 'text/turtle' THEN 'served-origin'
               ELSE 'origin-non-rdf' END
        WHEN ontology_id IS NULL THEN 'not-in-archivo'
        WHEN policy = 'timestampArchived' AND arch_version IS NULL THEN 'no-version-at-timestamp'
        WHEN arch_status = 200 THEN 'served-archivo'
        ELSE 'archivo-error'
      END AS category
    FROM routed2
  )"""

def _triples_ctes(srv_where: str = "served") -> str:
    """Triple-expansion CTE chain over routed outcomes.  ``srv_where``
    selects which served rows emit content: the default is every served
    request; the HEAD-aware queries pass ``served AND method = 'GET'``
    (a HEAD response is headers-only, proxy_logic.py:147-159)."""
    return f"""
  srv AS (SELECT * FROM outcome WHERE {srv_where}),
  all_triples AS (
    SELECT term_iri AS subj, '{IS_DEFINED_BY}' AS pred, canonical_iri AS obj,
           doc_id, serve_version AS ontology_version, serve_fmt AS format
    FROM srv
    UNION ALL
    SELECT unnest(c.classes), '{RDF_TYPE}', '{OWL_CLASS}',
           s.doc_id, s.serve_version, s.serve_fmt
    FROM srv s JOIN content c ON c.ontology_id = s.ontology_id AND c.version = s.serve_version
    UNION ALL
    SELECT unnest(c.properties), '{RDF_TYPE}', '{OWL_OBJPROP}',
           s.doc_id, s.serve_version, s.serve_fmt
    FROM srv s JOIN content c ON c.ontology_id = s.ontology_id AND c.version = s.serve_version
    UNION ALL
    SELECT unnest(c.same_as_a), '{SAME_AS}', unnest(c.same_as_b),
           s.doc_id, s.serve_version, s.serve_fmt
    FROM srv s JOIN content c ON c.ontology_id = s.ontology_id AND c.version = s.serve_version
    UNION ALL
    SELECT unnest(c.equiv_a), '{EQUIV_CLASS}', unnest(c.equiv_b),
           s.doc_id, s.serve_version, s.serve_fmt
    FROM srv s JOIN content c ON c.ontology_id = s.ontology_id AND c.version = s.serve_version
  ),
  dedup AS (
    SELECT * FROM all_triples
    QUALIFY row_number() OVER (
      PARTITION BY subj, pred, obj ORDER BY doc_id, ontology_version, format) = 1
  )"""


_TRIPLES_CTES = _triples_ctes()

#: srv filter for the HEAD-aware queries: only GET responses carry a body
_SRV_GET_ONLY = "served AND method = 'GET'"

_COMPONENT_CTES = f"""
  edges AS MATERIALIZED (SELECT subj AS u, obj AS v FROM dedup
            WHERE pred IN ('{SAME_AS}', '{EQUIV_CLASS}')),
  nodes AS (SELECT u AS n FROM edges UNION SELECT v FROM edges),
  sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
  reach(a, b) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.a, s.v FROM reach r JOIN sym s ON s.u = r.b
  ),
  comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a)"""


def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled fixed-point PageRank (stages/graph.py pagerank): int64
    nano-unit ranks, floor division, damping 85/100 -- every iteration is
    one CTE, so the 'iterative' algorithm is exactly SQL-expressible.
    SUM(BIGINT) is HUGEINT in DuckDB; each iteration casts back."""
    ctes = [
        """deps AS (
  SELECT DISTINCT ontology_id AS src, depends_on AS dst
  FROM read_parquet('__ROOT__/dependencies.parquet')
),
nodes AS (SELECT src AS node FROM deps UNION SELECT dst FROM deps),
deg AS (SELECT src, count(*) AS deg FROM deps GROUP BY src),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.r // d.deg) AS s
    FROM deps e
    JOIN deg d ON d.src = e.src
    JOIN r{i - 1} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_nanos FROM r{iters}"
    )


def _kmeans_ctes(n_clusters: int, iters: int, source: str = "embeddings") -> str:
    """Unrolled Lloyd iterations over the ``embeddings`` view, mirroring
    stages/similarity._kmeans_centroids: init = the n lowest-vec_id
    vectors (cluster = rank by vec_id), cosine assignment with
    first-centroid tie-break, centroid = L2-normalized mean of assigned
    normalized vectors, empty clusters keep the previous centroid.
    Discrete outputs (cluster ids / top-k ids) tolerate the float
    summation-order noise between numpy and DuckDB; only an exact
    similarity tie could flip, which the fixtures' random vectors never
    produce."""
    parts = [
        f"""emb AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         unnest(range(len(embedding))) AS j
  FROM {source}
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM emb GROUP BY vec_id),
vn AS (
  SELECT e.vec_id, e.j, e.x / greatest(n.nrm, 1e-30) AS x
  FROM emb e JOIN norms n USING (vec_id)
),
init_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {n_clusters})
),
c0 AS (SELECT i.cluster, v.j, v.x FROM init_ids i JOIN vn v USING (vec_id))"""
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY sum(v.x * c.x) DESC, c.cluster ASC) AS rn
    FROM vn v JOIN c{p} c ON c.j = v.j
    GROUP BY v.vec_id, c.cluster
  ) WHERE rn = 1
),
m{t} AS (
  SELECT a.cluster, v.j, sum(v.x) / count(*) AS mu
  FROM a{t} a JOIN vn v USING (vec_id)
  GROUP BY a.cluster, v.j
),
mn{t} AS (SELECT cluster, sqrt(sum(mu * mu)) AS nrm FROM m{t} GROUP BY cluster),
c{t} AS (
  SELECT c.cluster, c.j,
         coalesce(m.mu / greatest(n.nrm, 1e-30), c.x) AS x
  FROM c{p} c
  LEFT JOIN m{t} m ON m.cluster = c.cluster AND m.j = c.j
  LEFT JOIN mn{t} n ON n.cluster = c.cluster
)"""
        )
    return ",\n".join(parts)


def _final_assign_cte(iters: int) -> str:
    return f"""af AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY sum(v.x * c.x) DESC, c.cluster ASC) AS rn
    FROM vn v JOIN c{iters} c ON c.j = v.j
    GROUP BY v.vec_id, c.cluster
  ) WHERE rn = 1
)"""


def embed_kmeans_sql(n_clusters: int = 16, iters: int = 3) -> str:
    """stages/similarity.embed_kmeans: final cluster assignment after the
    unrolled Lloyd rounds."""
    return (
        "WITH "
        + _kmeans_ctes(n_clusters, iters)
        + ",\n"
        + _final_assign_cte(iters)
        + "\nSELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM af"
    )


def ann_ivf_sql(
    k: int = 10, n_queries: int = 3, n_lists: int = 16, n_probe: int = 8, iters: int = 3
) -> str:
    """stages/similarity.ann_ivf: IVF probe + within-list exact top-k,
    over the same unrolled k-means lists."""
    return (
        "WITH "
        + _kmeans_ctes(n_lists, iters)
        + ",\n"
        + _final_assign_cte(iters)
        + f""",
qids AS (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {n_queries}),
probes AS (
  SELECT query_id, cluster FROM (
    SELECT q.vec_id AS query_id, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum(v.x * c.x) DESC, c.cluster ASC) AS rn
    FROM qids q
    JOIN vn v ON v.vec_id = q.vec_id
    JOIN c{iters} c ON c.j = v.j
    GROUP BY q.vec_id, c.cluster
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM af a JOIN probes p ON p.cluster = a.cluster
),
sims AS (
  SELECT c.query_id, c.vec_id, sum(v.x * q.x) AS sim
  FROM cand c
  JOIN vn v ON v.vec_id = c.vec_id
  JOIN vn q ON q.vec_id = c.query_id AND q.j = v.j
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rn
  FROM sims
) WHERE rn <= {k}"""
    )


def ann_pq_sql(
    k: int = 10, n_queries: int = 3, m: int = 4, ks: int = 16, iters: int = 2, dim: int = 64
) -> str:
    """stages/similarity.ann_pq: unrolled per-subspace L2 Lloyd rounds +
    final encode + ADC lookup scoring, replayed exactly.  Same discrete-
    output tolerance argument as the kmeans CTEs: only an exact distance
    tie between distinct codes could flip, which the fixtures' random
    vectors never produce."""
    sub_d = dim // m
    parts = [
        f"""emb AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         unnest(range(len(embedding))) AS j
  FROM embeddings
),
sv AS (SELECT vec_id, CAST(j // {sub_d} AS BIGINT) AS s, j % {sub_d} AS jj, x FROM emb),
init_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {ks})
),
pc0 AS (SELECT i.code, v.s, v.jj, v.x FROM init_ids i JOIN sv v USING (vec_id))"""
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f"""pa{t} AS (
  SELECT vec_id, s, code FROM (
    SELECT v.vec_id, v.s, c.code,
           row_number() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY sum((v.x - c.x) * (v.x - c.x)) ASC, c.code ASC) AS rn
    FROM sv v JOIN pc{p} c ON c.s = v.s AND c.jj = v.jj
    GROUP BY v.vec_id, v.s, c.code
  ) WHERE rn = 1
),
pm{t} AS (
  SELECT a.s, a.code, v.jj, sum(v.x) / count(*) AS mu
  FROM pa{t} a JOIN sv v ON v.vec_id = a.vec_id AND v.s = a.s
  GROUP BY a.s, a.code, v.jj
),
pc{t} AS (
  SELECT c.s, c.code, c.jj, coalesce(m.mu, c.x) AS x
  FROM pc{p} c
  LEFT JOIN pm{t} m ON m.s = c.s AND m.code = c.code AND m.jj = c.jj
)"""
        )
    parts.append(
        f"""paf AS (
  SELECT vec_id, s, code FROM (
    SELECT v.vec_id, v.s, c.code,
           row_number() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY sum((v.x - c.x) * (v.x - c.x)) ASC, c.code ASC) AS rn
    FROM sv v JOIN pc{iters} c ON c.s = v.s AND c.jj = v.jj
    GROUP BY v.vec_id, v.s, c.code
  ) WHERE rn = 1
),
qids AS (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {n_queries}),
lut AS (
  SELECT q.vec_id AS query_id, c.s, c.code, sum(qv.x * c.x) AS dot
  FROM qids q
  JOIN sv qv ON qv.vec_id = q.vec_id
  JOIN pc{iters} c ON c.s = qv.s AND c.jj = qv.jj
  GROUP BY q.vec_id, c.s, c.code
),
psims AS (
  SELECT l.query_id, a.vec_id, sum(l.dot) AS sim
  FROM paf a JOIN lut l ON l.s = a.s AND l.code = a.code
  GROUP BY l.query_id, a.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rn
  FROM psims
) WHERE rn <= {k}"""
    )


def ann_ivfpq_sql(
    k: int = 10,
    n_queries: int = 3,
    n_lists: int = 16,
    n_probe: int = 8,
    m: int = 4,
    ks: int = 16,
    iters_ivf: int = 3,
    iters_pq: int = 2,
    dim: int = 64,
) -> str:
    """stages/similarity.ann_ivfpq: the composed IVF-PQ plan unrolled end
    to end -- coarse Lloyd rounds (the shared kmeans CTEs), residual
    ``x_norm - c_assigned``, per-subspace residual Lloyd rounds, final
    codes, probe filter, and the ADC score ``q.c_list + sum_s
    LUT[s][q, code_s]``.  Same discrete-output tolerance argument as the
    other unrolled k-means oracles."""
    sub_d = dim // m
    parts = [
        "WITH " + _kmeans_ctes(n_lists, iters_ivf) + ",\n" + _final_assign_cte(iters_ivf)
    ]
    parts.append(
        f"""res AS MATERIALIZED (
  SELECT v.vec_id, v.j, v.x - c.x AS x
  FROM vn v
  JOIN af a USING (vec_id)
  JOIN c{iters_ivf} c ON c.cluster = a.cluster AND c.j = v.j),
rsv AS MATERIALIZED (
  SELECT vec_id, CAST(j // {sub_d} AS BIGINT) AS s, j % {sub_d} AS jj, x
  FROM res),
pq_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {ks})),
pb0 AS (SELECT i.code, v.s, v.jj, v.x FROM pq_ids i JOIN rsv v USING (vec_id))"""
    )
    for t in range(1, iters_pq + 1):
        p = t - 1
        parts.append(
            f"""pa{t} AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT v.vec_id, v.s, c.code,
           row_number() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY sum((v.x - c.x) * (v.x - c.x)) ASC, c.code ASC) AS rn
    FROM rsv v JOIN pb{p} c ON c.s = v.s AND c.jj = v.jj
    GROUP BY v.vec_id, v.s, c.code
  ) WHERE rn = 1
),
pm{t} AS (
  SELECT a.s, a.code, v.jj, sum(v.x) / count(*) AS mu
  FROM pa{t} a JOIN rsv v ON v.vec_id = a.vec_id AND v.s = a.s
  GROUP BY a.s, a.code, v.jj
),
pb{t} AS MATERIALIZED (
  SELECT c.s, c.code, c.jj, coalesce(m.mu, c.x) AS x
  FROM pb{p} c
  LEFT JOIN pm{t} m ON m.s = c.s AND m.code = c.code AND m.jj = c.jj
)"""
        )
    parts.append(
        f"""paf AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT v.vec_id, v.s, c.code,
           row_number() OVER (
             PARTITION BY v.vec_id, v.s
             ORDER BY sum((v.x - c.x) * (v.x - c.x)) ASC, c.code ASC) AS rn
    FROM rsv v JOIN pb{iters_pq} c ON c.s = v.s AND c.jj = v.jj
    GROUP BY v.vec_id, v.s, c.code
  ) WHERE rn = 1
),
qids AS (SELECT DISTINCT vec_id FROM emb ORDER BY vec_id LIMIT {n_queries}),
probes AS (
  SELECT query_id, cluster FROM (
    SELECT q.vec_id AS query_id, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY sum(v.x * c.x) DESC, c.cluster ASC) AS rn
    FROM qids q
    JOIN vn v ON v.vec_id = q.vec_id
    JOIN c{iters_ivf} c ON c.j = v.j
    GROUP BY q.vec_id, c.cluster
  ) WHERE rn <= {n_probe}
),
qsv AS (
  SELECT v.vec_id, CAST(v.j // {sub_d} AS BIGINT) AS s, v.j % {sub_d} AS jj, v.x
  FROM vn v JOIN qids q ON q.vec_id = v.vec_id),
lut AS (
  SELECT qv.vec_id AS query_id, c.s, c.code, sum(qv.x * c.x) AS dot
  FROM qsv qv JOIN pb{iters_pq} c ON c.s = qv.s AND c.jj = qv.jj
  GROUP BY qv.vec_id, c.s, c.code
),
qc AS (
  SELECT q.vec_id AS query_id, c.cluster, sum(v.x * c.x) AS dot
  FROM qids q
  JOIN vn v ON v.vec_id = q.vec_id
  JOIN c{iters_ivf} c ON c.j = v.j
  GROUP BY q.vec_id, c.cluster
),
cand AS (
  SELECT p.query_id, a.vec_id, a.cluster
  FROM af a JOIN probes p ON p.cluster = a.cluster
),
adc AS (
  SELECT l.query_id, a.vec_id, sum(l.dot) AS dot
  FROM paf a JOIN lut l ON l.s = a.s AND l.code = a.code
  GROUP BY l.query_id, a.vec_id
),
sims AS (
  SELECT c.query_id, c.vec_id, qc.dot + adc.dot AS sim
  FROM cand c
  JOIN qc ON qc.query_id = c.query_id AND qc.cluster = c.cluster
  JOIN adc ON adc.query_id = c.query_id AND adc.vec_id = c.vec_id
)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rn
  FROM sims
) WHERE rn <= {k}"""
    )


def corpus_mix_sql(rates_e6: dict[str, int], seed: str) -> str:
    """stages/packing.corpus_mix: per-source epoch expansion + the
    hash-uniform fractional subset, as one VALUES join + range unnest.
    The keep test is the identical lowercase-hex string compare."""
    vals = ", ".join(
        f"('{src}', {rate})" for src, rate in rates_e6.items() if rate > 0
    )
    return f"""
WITH rates(source, rate_e6) AS (VALUES {vals}),
d AS (
  SELECT doc_id, documents.source, r.rate_e6,
         range((r.rate_e6 + 999999) // 1000000) AS eps
  FROM documents JOIN rates r USING (source)
),
e AS (SELECT doc_id, source, rate_e6, unnest(eps) AS epoch FROM d)
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
FROM e
WHERE epoch < rate_e6 // 1000000
   OR substr(md5(concat('{seed}:', epoch, ':', doc_id)), 1, 6)
      < printf('%06x', CAST(rate_e6 % 1000000 AS BIGINT) * 16777216 // 1000000)"""


def kg_skipgram_negatives_sql(
    fixture_root: str, timestamp: str, k: int = 3, seed: str = "neg1"
) -> str:
    """``kg_skipgram_negatives``: the kg_skipgrams walk/pair CTEs plus a
    row_number vocabulary index and the identical md5-mod-|V| draw."""
    body = (
        f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        + f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
e AS MATERIALIZED (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE subj <> obj),
{_walk_step_ctes_named(4, 2, 'w')},
sg AS (
  SELECT DISTINCT x.node AS center, y.node AS context
  FROM walks x JOIN walks y ON y.walk_id = x.walk_id
   AND abs(y.step - x.step) BETWEEN 1 AND 2),
vocab AS (
  SELECT node, row_number() OVER (ORDER BY node) - 1 AS idx
  FROM (SELECT DISTINCT node FROM walks)),
vc AS (SELECT COUNT(*) AS v FROM vocab),
negdraw AS (
  SELECT sg.center, sg.context, CAST(u.j AS BIGINT) AS sample_idx,
    CAST(CAST(concat('0x', substr(md5(concat('{seed}:', sg.center, ':',
                                             sg.context, ':', u.j)), 1, 16))
              AS UBIGINT) % CAST(t2.v AS UBIGINT) AS BIGINT) AS idx
  FROM sg, (SELECT unnest(range(0, {k})) AS j) u, vc t2)
SELECT n.center, n.context, n.sample_idx, v.node AS negative
FROM negdraw n JOIN vocab v USING (idx)"""
    )
    return body.replace("__ROOT__", fixture_root).replace("__T__", timestamp)


def corpus_to_shards_sql(fixture_root: str, budget: int) -> str:
    """``corpus_to_shards``: the curation funnel (corpus_curate_sql as a
    nested CTE), the scalar-reference BPE vocab join for survivor token
    counts, and the doc_id-ordered window cumsum shard rule."""
    return f"""
WITH curated AS ({corpus_curate_sql()}),
surv AS (SELECT doc_id FROM curated),
pt AS (
  SELECT d.doc_id, unnest(regexp_extract_all(d.text, '{_BPE_RE_SQL}')) AS word
  FROM documents d JOIN surv USING (doc_id)),
v AS (SELECT * FROM read_parquet('{fixture_root}/bpe_vocab.parquet')),
c AS (
  SELECT s.doc_id,
    CAST(COALESCE(SUM(v.n_tokens), 0) AS BIGINT) AS n_tokens
  FROM surv s
  LEFT JOIN pt ON s.doc_id = pt.doc_id
  LEFT JOIN v ON pt.word = v.word
  GROUP BY s.doc_id)
SELECT doc_id, n_tokens,
  (SUM(n_tokens) OVER (ORDER BY doc_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
    // {budget} AS shard
FROM c"""


def corpus_mix_temperature_sql(seed: str, cap_e6: int) -> str:
    """stages/packing.corpus_mix_temperature: the sqrt-rule rates
    re-derived in SQL (IEEE sqrt is correctly rounded, so DuckDB's
    floor(sqrt(n)) equals numpy's bit-for-bit; everything else is
    integer), then the same epoch expansion + hash-uniform subset as
    corpus_mix_sql."""
    return f"""
WITH nsrc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1),
wsrc AS (SELECT source, n,
                CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
         FROM nsrc),
tot AS (SELECT SUM(n) AS nn, SUM(w) AS ww FROM wsrc),
rates AS (
  SELECT source,
    CAST(LEAST({cap_e6}, 1000000 * t.nn * w.w // (t.ww * w.n)) AS BIGINT)
      AS rate_e6
  FROM wsrc w, tot t),
d AS (
  SELECT doc_id, documents.source, r.rate_e6,
         range((r.rate_e6 + 999999) // 1000000) AS eps
  FROM documents JOIN rates r USING (source)),
e AS (SELECT doc_id, source, rate_e6, unnest(eps) AS epoch FROM d)
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
FROM e
WHERE epoch < rate_e6 // 1000000
   OR substr(md5(concat('{seed}:', epoch, ':', doc_id)), 1, 6)
      < printf('%06x', CAST(rate_e6 % 1000000 AS BIGINT) * 16777216 // 1000000)"""


def _walk_step_parts(length: int, walks_per_node: int, seed: str) -> tuple[str, str]:
    """The kg_walks oracle split into (step CTEs, walk-relation UNION
    select) so callers compose the walk relation STRUCTURALLY --
    kg_skipgrams wraps the select in a named ``walks`` CTE instead of
    text-splicing into the rendered statement."""
    vals = ", ".join(f"({w})" for w in range(walks_per_node))
    parts = [
        "adj AS MATERIALIZED (SELECT a, b,"
        " row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx,"
        " COUNT(*) OVER (PARTITION BY a) AS deg FROM e),",
        f"w0 AS (SELECT DISTINCT a || ':' || ws.w AS walk_id, a AS node"
        f" FROM e CROSS JOIN (VALUES {vals}) ws(w)),",
    ]
    for st in range(1, length + 1):
        prev = "w0" if st == 1 else f"s{st - 1}"
        parts.append(
            f"s{st} AS (SELECT w.walk_id, adj.b AS node FROM {prev} w"
            " JOIN adj ON adj.a = w.node AND adj.idx ="
            " CAST(CAST(concat('0x', substr(md5(concat("
            f"'{seed}:', w.walk_id, ':{st}:', w.node)), 1, 16)) AS UBIGINT)"
            " % CAST(adj.deg AS UBIGINT) AS BIGINT)),"
        )
    selects = ["SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0"]
    for st in range(1, length + 1):
        selects.append(f"SELECT walk_id, {st}, node FROM s{st}")
    parts[-1] = parts[-1].rstrip(",")  # last CTE has no trailing comma
    return "\n".join(parts), "\nUNION ALL ".join(selects)


def _walk_step_ctes(length: int, walks_per_node: int, seed: str) -> str:
    """kg_walks form: the step CTEs followed directly by the walk union."""
    ctes, union = _walk_step_parts(length, walks_per_node, seed)
    return ctes + "\n" + union


def _walk_step_ctes_named(length: int, walks_per_node: int, seed: str) -> str:
    """kg_skipgrams form: same step CTEs, walk union wrapped as a
    ``walks`` CTE for downstream self-joins."""
    ctes, union = _walk_step_parts(length, walks_per_node, seed)
    return ctes + "\n,walks AS (" + union + ")"


def kg_sql(name: str, fixture_root: str, timestamp: str = "2021-06-01") -> str:
    """Full SQL statement for a KG-family query over ``fixture_root``."""
    bodies = {
        "kg_mentions": f"WITH {_MENTIONS_CTES}\n"
        "SELECT doc_id, span_idx, term_iri, ontology_id, canonical_iri FROM mentions",
        "kg_status": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES}\n"
        "SELECT doc_id, term_iri, CAST(status AS INTEGER) AS status, category, "
        "report_fmt AS format FROM outcome",
        "kg_report": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES}\n"
        'SELECT category, report_fmt AS format, count(*) AS "count()" '
        "FROM outcome GROUP BY 1, 2",
        # per-method outcome counts: HEAD requests route/negotiate/fail
        # over EXACTLY like GET (the outcome CTE never looks at method),
        # so the split only reweights categories
        "kg_head_status": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES}\n"
        'SELECT method, category, count(*) AS "count()" '
        "FROM outcome GROUP BY 1, 2",
        # HEAD-aware triple store: content expansion restricted to GET
        # (a HEAD response is headers-only -- no body, no triples)
        "kg_head_requests": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},"
        f"{_triples_ctes(srv_where=_SRV_GET_ONLY)}\n"
        "SELECT subj, pred, obj, doc_id, ontology_version, format FROM dedup",
        "kg_triples": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES}\n"
        "SELECT subj, pred, obj, doc_id, ontology_version, format FROM dedup",
        # 2-hop property paths over the deduped triple store: the KG-side
        # traversal primitive (a -p1-> mid -p2-> b), distinct paths only
        "kg_two_hop": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        """t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT DISTINCT a.subj, a.pred AS pred1, a.obj AS mid, b.pred AS pred2, b.obj AS obj
FROM t a JOIN t b ON a.obj = b.subj
WHERE a.subj <> b.obj""",
        # conjunctive BGP instance (stages/bgp.py left-deep join plan):
        # sameAs pairs whose BOTH endpoints are typed owl:Class
        "kg_bgp": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT sa.subj AS cls, sa.obj AS peer
FROM t sa
JOIN t tc ON tc.subj = sa.subj AND tc.pred = '{RDF_TYPE}' AND tc.obj = '{OWL_CLASS}'
JOIN t tp ON tp.subj = sa.obj AND tp.pred = '{RDF_TYPE}' AND tp.obj = '{OWL_CLASS}'
WHERE sa.pred = '{SAME_AS}'""",
        # NT export -> re-ingest must equal the store's distinct keys
        "kg_nt_roundtrip": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES}\n"
        "SELECT DISTINCT subj, pred, obj FROM dedup",
        # OPTIONAL clause = LEFT JOIN in the binding algebra
        "kg_bgp_optional": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT sa.subj AS cls, sa.obj AS peer, tp.obj AS ptype
FROM t sa
LEFT JOIN t tp ON tp.subj = sa.obj AND tp.pred = '{RDF_TYPE}'
WHERE sa.pred = '{SAME_AS}'""",
        # SPARQL negation (MINUS / FILTER NOT EXISTS with shared vars):
        # anti join in the binding algebra
        "kg_bgp_minus": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT sa.subj AS cls, sa.obj AS peer
FROM t sa
WHERE sa.pred = '{SAME_AS}'
  AND NOT EXISTS (SELECT 1 FROM t tp
                  WHERE tp.subj = sa.obj AND tp.pred = '{RDF_TYPE}'
                    AND tp.obj = '{OWL_CLASS}')""",
        # SPARQL UNION = solution-mapping union with NULL padding for
        # branch-absent variables; SELECT DISTINCT = set semantics
        "kg_bgp_union": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT DISTINCT cls, peer, ont FROM (
  SELECT subj AS cls, obj AS peer, CAST(NULL AS VARCHAR) AS ont FROM t
  WHERE pred = '{SAME_AS}'
  UNION ALL
  SELECT subj, obj, CAST(NULL AS VARCHAR) FROM t WHERE pred = '{EQUIV_CLASS}'
  UNION ALL
  SELECT subj, CAST(NULL AS VARCHAR), obj FROM t WHERE pred = '{IS_DEFINED_BY}')""",
        # SPARQL FILTER over the binding algebra: constant clauses are
        # WHERE predicates on the scans, var-var comparisons on the join
        "kg_bgp_filter": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT sa.subj AS cls, sa.obj AS peer
FROM t sa
JOIN t tc ON tc.subj = sa.subj AND tc.pred = '{RDF_TYPE}' AND tc.obj = '{OWL_CLASS}'
JOIN t tp ON tp.subj = sa.obj AND tp.pred = '{RDF_TYPE}' AND tp.obj = '{OWL_CLASS}'
WHERE sa.pred = '{SAME_AS}' AND sa.subj < sa.obj AND sa.subj LIKE '%#C0'""",
        # SPARQL 1.1 property path (sameAs|^sameAs|equivalentClass|
        # ^equivalentClass)+/rdf:type: recursive closure over the
        # symmetrized union edge set, then one join to the type triples
        "kg_path_query": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
pe AS MATERIALIZED (
  SELECT DISTINCT s, o FROM (
    SELECT subj AS s, obj AS o FROM t
    WHERE pred IN ('{SAME_AS}', '{EQUIV_CLASS}')
    UNION
    SELECT obj, subj FROM t
    WHERE pred IN ('{SAME_AS}', '{EQUIV_CLASS}'))),
reach(s, o) AS (
  SELECT s, o FROM pe
  UNION
  SELECT r.s, e.o FROM reach r JOIN pe e ON e.s = r.o)
SELECT DISTINCT r.s AS term, d.obj AS typ
FROM reach r
JOIN t d ON d.subj = r.o AND d.pred = '{RDF_TYPE}'""",
        # SPARQL zero-or-more path (sameAs|^sameAs)*: node-universe
        # self-pairs unioned with the recursive symmetric closure
        "kg_path_star": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
nodes AS (SELECT DISTINCT n FROM (
  SELECT subj AS n FROM t UNION SELECT obj FROM t)),
pe AS MATERIALIZED (
  SELECT DISTINCT s, o FROM (
    SELECT subj AS s, obj AS o FROM t WHERE pred = '{SAME_AS}'
    UNION
    SELECT obj, subj FROM t WHERE pred = '{SAME_AS}')),
reach(s, o) AS (
  SELECT s, o FROM pe
  UNION
  SELECT r.s, e.o FROM reach r JOIN pe e ON e.s = r.o)
SELECT DISTINCT s AS term, o AS peer FROM (
  SELECT n AS s, n AS o FROM nodes
  UNION ALL
  SELECT s, o FROM reach)""",
        # SPARQL ASK: existence as a 1-row 0/1 table
        "kg_ask": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT CAST(EXISTS (
  SELECT 1 FROM t sa
  JOIN t ty ON ty.subj = sa.obj AND ty.pred = '{RDF_TYPE}'
           AND ty.obj = '{OWL_CLASS}'
  WHERE sa.pred = '{SAME_AS}') AS BIGINT) AS ask""",
        # SPARQL DESCRIBE: symmetric concise form of one resource
        "kg_describe": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        """t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT subj, pred, obj FROM t
WHERE subj = 'http://onto0.example.org/ns/v0#C0'
   OR obj = 'http://onto0.example.org/ns/v0#C0'""",
        # SPARQL BIND expression columns: STRAFTER/UCASE/CONCAT/STRLEN
        # restated as ANSI-SQL string functions
        "kg_bgp_bind": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT subj AS cls, obj AS peer,
  CASE WHEN strpos(subj, '#') > 0
       THEN substr(subj, strpos(subj, '#') + 1) ELSE '' END AS local_name,
  upper(obj) AS peer_up,
  subj || '|' || obj AS pair,
  CAST(length(subj) AS BIGINT) AS len_cls
FROM t WHERE pred = '{SAME_AS}'""",
        # deterministic random-walk corpus: the md5 hop choice replayed
        # step by step against the indexed adjacency
        "kg_walks": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
e AS MATERIALIZED (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE subj <> obj),
{_walk_step_ctes(4, 2, 'w')}""",
        # skip-grams over the walk corpus: within-walk self-join bounded
        # by |step diff| <= window, then pair counts
        "kg_skipgrams": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
e AS MATERIALIZED (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE subj <> obj),
{_walk_step_ctes_named(4, 2, 'w')}
SELECT x.node AS center, y.node AS context,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM walks x JOIN walks y ON y.walk_id = x.walk_id
 AND abs(y.step - x.step) BETWEEN 1 AND 2
GROUP BY 1, 2""",
        # seeded multi-source BFS: depth-bounded recursive expansion,
        # MIN depth per node (= BFS first-discovery depth)
        "kg_bfs": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
e AS MATERIALIZED (SELECT DISTINCT subj AS a, obj AS b FROM t WHERE subj <> obj),
seeds(node) AS (VALUES ('http://onto0.example.org/ns/v0#C0'),
                      ('http://onto0.example.org/ns/v12#C0'),
                      ('http://onto1.example.org/ontology1#C0')),
reach(node, depth) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.b, r.depth + 1 FROM reach r JOIN e ON e.a = r.node
  WHERE r.depth < 16)
SELECT node, MIN(depth) AS depth FROM reach GROUP BY node""",
        # SPARQL VALUES: inline binding table inner-joined on ?cls
        "kg_bgp_values": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
seeds(cls) AS (VALUES ('http://onto0.example.org/ns/v0#C0'),
                      ('http://onto0.example.org/ns/v12#C0'),
                      ('http://onto1.example.org/ontology1#C0'))
SELECT DISTINCT ty.subj AS cls, ty.obj AS typ, sa.obj AS peer
FROM t ty
JOIN t sa ON sa.subj = ty.subj AND sa.pred = '{SAME_AS}'
JOIN seeds s ON s.cls = ty.subj
WHERE ty.pred = '{RDF_TYPE}'""",
        # SPARQL SELECT solution modifiers: GROUP BY + COUNT(*) /
        # COUNT(DISTINCT) / MIN over the distinct-binding relation,
        # ORDER BY with full-column tie-break, LIMIT
        "kg_sparql_agg": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
b AS (SELECT DISTINCT subj AS term, obj AS ont FROM t
      WHERE pred = '{IS_DEFINED_BY}')
SELECT ont, COUNT(*) AS n_bindings, COUNT(DISTINCT term) AS n_terms,
       MIN(term) AS first_term, MAX(term) AS last_term
FROM b GROUP BY ont
ORDER BY n_terms DESC, ont
LIMIT 10""",
        # BIND -> GROUP BY -> SUM/COUNT DISTINCT -> HAVING -> ORDER/LIMIT
        "kg_sparql_having": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
b AS (SELECT DISTINCT subj AS term, obj AS ont FROM t
      WHERE pred = '{IS_DEFINED_BY}')
SELECT ont, COUNT(DISTINCT term) AS n_terms,
       CAST(SUM(length(term)) AS BIGINT) AS sum_len
FROM b GROUP BY ont
HAVING COUNT(DISTINCT term) >= 3
ORDER BY sum_len DESC, ont
LIMIT 10""",
        # SHACL-lite report: one SELECT per (shape, constraint), UNION
        # ALL (rows are distinct across constraints by construction)
        "kg_shacl_report": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
cls AS (SELECT subj AS focus FROM t
        WHERE pred = '{RDF_TYPE}' AND obj = '{OWL_CLASS}'),
sas AS (SELECT DISTINCT subj AS focus FROM t WHERE pred = '{SAME_AS}'),
defby AS (SELECT subj AS focus, obj AS value FROM t
          WHERE pred = '{IS_DEFINED_BY}'),
defcnt AS (SELECT focus, COUNT(*) AS cnt FROM defby GROUP BY focus),
typecnt AS (SELECT subj AS focus, COUNT(*) AS cnt FROM t
            WHERE pred = '{RDF_TYPE}' GROUP BY subj)
SELECT c.focus, 'ClassShape' AS shape,
       'minCount({IS_DEFINED_BY},1)' AS constraint,
       CAST(COALESCE(d.cnt, 0) AS VARCHAR) AS value
FROM cls c LEFT JOIN defcnt d ON d.focus = c.focus
WHERE COALESCE(d.cnt, 0) < 1
UNION ALL
SELECT c.focus, 'ClassShape', 'maxCount({IS_DEFINED_BY},1)',
       CAST(d.cnt AS VARCHAR)
FROM cls c JOIN defcnt d ON d.focus = c.focus WHERE d.cnt > 1
UNION ALL
SELECT v.focus, 'ClassShape', 'pattern({IS_DEFINED_BY},[^/]$)', v.value
FROM defby v JOIN cls c ON c.focus = v.focus
WHERE NOT regexp_matches(v.value, '[^/]$')
UNION ALL
SELECT s.focus, 'SameAsShape', 'minCount({RDF_TYPE},1)',
       CAST(COALESCE(tc.cnt, 0) AS VARCHAR)
FROM sas s LEFT JOIN typecnt tc ON tc.focus = s.focus
WHERE COALESCE(tc.cnt, 0) < 1
UNION ALL
SELECT v.subj, 'SameAsShape', 'class({SAME_AS},{OWL_CLASS})', v.obj
FROM t v
WHERE v.pred = '{SAME_AS}'
  AND NOT EXISTS (SELECT 1 FROM t ty WHERE ty.subj = v.obj
                  AND ty.pred = '{RDF_TYPE}' AND ty.obj = '{OWL_CLASS}')""",
        # VoID dataset descriptor: per-predicate triple count + exact
        # distinct subject/object counts
        "kg_void_stats": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        """t AS (SELECT DISTINCT subj, pred, obj FROM dedup)
SELECT pred, COUNT(*) AS n_triples, COUNT(DISTINCT subj) AS n_subjects,
       COUNT(DISTINCT obj) AS n_objects
FROM t GROUP BY pred""",
        # SPARQL CONSTRUCT: one instantiation of each template pattern
        # per solution, DISTINCT over the resulting graph
        "kg_construct": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        f"""t AS (SELECT DISTINCT subj, pred, obj FROM dedup),
b AS (SELECT sa.subj AS cls, sa.obj AS peer
      FROM t sa
      JOIN t tc ON tc.subj = sa.subj AND tc.pred = '{RDF_TYPE}'
                AND tc.obj = '{OWL_CLASS}'
      WHERE sa.pred = '{SAME_AS}')
SELECT DISTINCT subj, pred, obj FROM (
  SELECT peer AS subj, '{SAME_AS}' AS pred, cls AS obj FROM b
  UNION ALL
  SELECT peer, '{RDF_TYPE}', '{OWL_CLASS}' FROM b)""",
        # bounded-hop reachability: the kg_reachability frontier expansion
        # unrolled (walks of length 1..3, min hops per pair)
        "kg_reachability": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        """e AS (SELECT DISTINCT subj AS a, obj AS b FROM dedup WHERE subj <> obj),
h2 AS (SELECT DISTINCT e1.a, e2.b FROM e e1 JOIN e e2 ON e2.a = e1.b
       WHERE e1.a <> e2.b),
h3 AS (SELECT DISTINCT h2.a, e.b FROM h2 JOIN e ON e.a = h2.b
       WHERE h2.a <> e.b),
u AS (SELECT a, b, 1 AS hops FROM e
      UNION ALL SELECT a, b, 2 FROM h2
      UNION ALL SELECT a, b, 3 FROM h3)
SELECT a, b, CAST(min(hops) AS BIGINT) AS hops FROM u GROUP BY a, b""",
        # rdfs11 entailment over the as-of-resolved class hierarchy:
        # recursive closure with min subsumption depth per pair (the
        # fixture hierarchy is a DAG, so the depth-carrying recursion
        # terminates)
        "kg_subclass_closure": """WITH RECURSIVE
content AS (SELECT * FROM read_parquet('__ROOT__/snapshot_content.parquet')),
vpick AS (SELECT ontology_id, max(version) AS v FROM content
          WHERE version <= '__T__' GROUP BY 1),
sel AS (SELECT c.subclass_a, c.subclass_b FROM content c
        JOIN vpick a ON a.ontology_id = c.ontology_id AND a.v = c.version),
e AS (SELECT DISTINCT unnest(subclass_a) AS a, unnest(subclass_b) AS b FROM sel),
r AS (
  SELECT a, b, 1 AS depth FROM e
  UNION
  SELECT r.a, e.b, r.depth + 1 FROM r JOIN e ON e.a = r.b
)
SELECT a AS subclass, b AS superclass, CAST(min(depth) AS BIGINT) AS depth
FROM r GROUP BY 1, 2""",
        # incremental build+update must equal the one-shot build, so it
        # shares the kg_triples statement -- the equality IS the claim
        "kg_incremental": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES}\n"
        "SELECT subj, pred, obj, doc_id, ontology_version, format FROM dedup",
        # pruned point lookup off the same store: the one-shot dedup
        # filtered to the dereferenced subject
        "kg_lookup": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES}\n"
        "SELECT subj, pred, obj, doc_id, ontology_version, format FROM dedup\n"
        "WHERE subj = 'http://onto0.example.org/ns/v0#C0'",
        # likewise the incremental CANONICAL update (mapping repair +
        # moved-representative rewrite) must equal the one-shot canonical
        # build, so it shares kg_triples_canonical's statement verbatim
        "kg_incremental_canonical": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},{_COMPONENT_CTES},\n"
        f"""  rewritten AS (
    SELECT coalesce(c1.component, d.subj) AS subj, d.pred,
           coalesce(c2.component, d.obj) AS obj,
           d.doc_id, d.ontology_version, d.format
    FROM dedup d
    LEFT JOIN comp c1 ON c1.node = d.subj
    LEFT JOIN comp c2 ON c2.node = d.obj
  ),
  no_loops AS (
    SELECT * FROM rewritten
    WHERE NOT (pred IN ('{SAME_AS}', '{EQUIV_CLASS}') AND subj = obj)
  )
SELECT * FROM no_loops
QUALIFY row_number() OVER (
  PARTITION BY subj, pred, obj ORDER BY doc_id, ontology_version, format) = 1""",
        "kg_components": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},{_COMPONENT_CTES}\n"
        "SELECT node, component FROM comp",
        # entity cards: per-subject provenance/version rollup
        "kg_entity_profile": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES}\n"
        """SELECT subj,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT pred) AS BIGINT) AS n_preds,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       min(ontology_version) AS v_min,
       max(ontology_version) AS v_max
FROM dedup GROUP BY 1""",
        # hub-skew diagnostic: the component-size distribution
        "kg_component_sizes": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},{_COMPONENT_CTES},\n"
        """sizes AS (SELECT component, count(*) AS size FROM comp GROUP BY 1)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_components,
       min(component) AS min_root
FROM sizes GROUP BY size""",
        "kg_triples_canonical": f"WITH RECURSIVE {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},{_COMPONENT_CTES},\n"
        f"""  rewritten AS (
    SELECT coalesce(c1.component, d.subj) AS subj, d.pred,
           coalesce(c2.component, d.obj) AS obj,
           d.doc_id, d.ontology_version, d.format
    FROM dedup d
    LEFT JOIN comp c1 ON c1.node = d.subj
    LEFT JOIN comp c2 ON c2.node = d.obj
  ),
  no_loops AS (
    SELECT * FROM rewritten
    WHERE NOT (pred IN ('{SAME_AS}', '{EQUIV_CLASS}') AND subj = obj)
  )
SELECT * FROM no_loops
QUALIFY row_number() OVER (
  PARTITION BY subj, pred, obj ORDER BY doc_id, ontology_version, format) = 1""",
        "kg_doc_stats": f"WITH {_MENTIONS_CTES},{_ROUTING_CTES},{_TRIPLES_CTES},\n"
        """  ms AS (SELECT doc_id, count(*) AS n_mentions,
               count(ontology_id) AS n_matched FROM mentions GROUP BY 1),
  ts AS (SELECT doc_id, count(*) AS n_triples FROM dedup GROUP BY 1)
SELECT m.doc_id, m.n_mentions, m.n_matched,
       coalesce(t.n_triples, 0) AS n_triples
FROM ms m LEFT JOIN ts t USING (doc_id)""",
        "kg_restricted_denied": f"WITH {_MENTIONS_CTES}\n"
        "SELECT doc_id, term_iri, CAST(403 AS INTEGER) AS status FROM mentions "
        "WHERE ontology_id IS NULL",
        "kg_formats_complete": """
WITH content AS (SELECT * FROM read_parquet('__ROOT__/snapshot_content.parquet')),
latest AS (SELECT ontology_id, max(version) AS latest_version FROM content GROUP BY 1),
ok AS (
  SELECT s.ontology_id, s.format
  FROM read_parquet('__ROOT__/snapshot_status.parquet') s
  JOIN latest l ON l.ontology_id = s.ontology_id AND l.latest_version = s.version
  WHERE (CASE WHEN s.status != 500 THEN s.status ELSE s.status_https END) = 200
)
SELECT ontology_id, count(*) AS n_formats,
       CAST(count(*) = 3 AS BIGINT) AS all_formats
FROM ok GROUP BY 1""",
        "kg_spans_passthrough": """
WITH flat AS (
  SELECT doc_id, unnest(spans) AS span,
         unnest(range(len(spans))) AS span_idx
  FROM read_parquet('__ROOT__/documents_interleaved.parquet')
)
SELECT doc_id, CAST(span_idx AS INTEGER) AS span_idx,
       span.kind AS kind, span.text AS text, span.media_ref AS media_ref
FROM flat""",
        "kg_intercept_archivo": f"WITH {_MENTIONS_CTES}\n"
        "SELECT doc_id, term_iri, CAST(ontology_id IS NOT NULL AS BIGINT) AS intercept "
        "FROM mentions",
        "kg_intercept_modes": f"WITH {_MENTIONS_CTES},\n"
        "  modes(mode) AS (VALUES ('all'), ('none'), ('block'), ('archivo'))\n"
        "SELECT m.doc_id, m.term_iri, mo.mode,\n"
        "  CASE mo.mode WHEN 'all' THEN CAST(1 AS BIGINT)\n"
        "       WHEN 'none' THEN CAST(0 AS BIGINT)\n"
        "       WHEN 'block' THEN CAST(0 AS BIGINT)\n"
        "       ELSE CAST(m.ontology_id IS NOT NULL AS BIGINT) END AS intercept\n"
        "FROM mentions m CROSS JOIN modes mo",
        "kg_dependency_closure": """
WITH RECURSIVE deps AS (
  SELECT * FROM read_parquet('__ROOT__/dependencies.parquet')
),
reach(a, b) AS (
  SELECT ontology_id, depends_on FROM deps
  UNION
  SELECT r.a, d.depends_on FROM reach r JOIN deps d ON d.ontology_id = r.b
)
SELECT a AS ontology_id, b AS dep_id FROM reach""",
        # the Turtle manifest encodes the same edges as the parquet table,
        # so the TTL-ingestion query shares the recursive-CTE oracle
        "kg_dependency_closure_ttl": """
WITH RECURSIVE deps AS (
  SELECT * FROM read_parquet('__ROOT__/dependencies.parquet')
),
reach(a, b) AS (
  SELECT ontology_id, depends_on FROM deps
  UNION
  SELECT r.a, d.depends_on FROM reach r JOIN deps d ON d.ontology_id = r.b
)
SELECT a AS ontology_id, b AS dep_id FROM reach""",
        "kg_pagerank": _pagerank_sql(iters=5),
        "media_catalog": """
WITH flat AS (
  SELECT doc_id, unnest(spans) AS span,
         unnest(range(len(spans))) AS span_idx
  FROM read_parquet('__ROOT__/documents_interleaved.parquet')
)
SELECT doc_id, CAST(span_idx AS INTEGER) AS span_idx, span.media_ref AS media_ref,
       64 + length(span.media_ref) % 128 AS width,
       64 + (length(span.media_ref) * 7) % 128 AS height,
       length(span.media_ref) AS n_bytes
FROM flat WHERE span.kind = 'media'""",
        "media_frames": """
WITH flat AS (
  SELECT doc_id, unnest(spans) AS span
  FROM read_parquet('__ROOT__/documents_interleaved.parquet')
),
cat AS (
  SELECT doc_id, span.media_ref AS media_ref,
         length(span.media_ref) AS n_bytes
  FROM flat WHERE span.kind = 'media'
),
f AS (SELECT doc_id, media_ref, 10 + (n_bytes % 90) AS n_frames FROM cat),
s AS (SELECT doc_id, media_ref, n_frames,
             greatest(1, n_frames // 3) AS step FROM f)
SELECT doc_id, media_ref,
       CAST(least(i * step, n_frames - 1) AS BIGINT) AS frame_idx
FROM s CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) t""",
    }
    return bodies[name].replace("__ROOT__", fixture_root).replace("__T__", timestamp)


def kg_download_log_sql(fixture_root: str) -> str:
    """M16 oracle: DuckDB's native JSON functions flatten the same nested
    download-log documents the Ray stage parses."""
    return f"""
WITH src AS (
  SELECT log_json AS j FROM read_parquet('{fixture_root}/download_log.parquet')),
fmts AS (
  SELECT j, unnest(json_keys(j, '$.downloads')) AS fmt FROM src)
SELECT j->>'$.url' AS url,
       fmt,
       CAST(json_extract(j, '$.downloads.' || fmt || '.status_code') AS BIGINT) AS status_code,
       CAST(json_extract(j, '$.downloads.' || fmt || '.request_duration_ms') AS BIGINT) AS request_duration_ms,
       CAST(json_extract(j, '$.downloads.' || fmt || '.content_length') AS BIGINT) AS content_length,
       json_extract_string(j, '$.downloads.' || fmt || '.error.type') AS error_type,
       CAST(coalesce(json_array_length(
         json_extract(j, '$.downloads.' || fmt || '.error.chain_details')), 0) AS BIGINT)
         AS error_chain_len
FROM fmts"""


def media_decode_sql(fixture_root: str) -> str:
    """Decode oracle: the ASSET GENERATOR's formulas (index embedded in
    the ref) + octet_length of the actual payload.  The Ray side parses
    the BYTES -- agreement proves the decoder extracts exactly what the
    generator encoded."""
    return f"""
WITH a AS (
  SELECT media_ref, payload,
         CAST(regexp_extract(media_ref, '([0-9]+)', 1) AS BIGINT) AS i
  FROM read_parquet('{fixture_root}/media_assets.parquet'))
SELECT media_ref,
       CASE WHEN i % 2 = 0 THEN 'ppm' ELSE 'wav' END AS media_type,
       i % 17 <> 0 AS parse_ok,
       CAST(CASE WHEN i % 2 = 0 AND i % 17 <> 0 THEN 4 + (i % 13) ELSE 0 END AS BIGINT) AS width,
       CAST(CASE WHEN i % 2 = 0 AND i % 17 <> 0 THEN 3 + ((i * 7) % 11) ELSE 0 END AS BIGINT) AS height,
       CAST(CASE WHEN i % 2 = 1 AND i % 17 <> 0 THEN 1 + ((i // 2) % 2) ELSE 0 END AS BIGINT) AS channels,
       CAST(CASE WHEN i % 2 = 1 AND i % 17 <> 0 THEN 8000 * (1 + (i % 3)) ELSE 0 END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN i % 2 = 1 AND i % 17 <> 0 THEN 50 + ((i * 11) % 200) ELSE 0 END AS BIGINT) AS n_frames,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes
FROM a"""


def media_decode_frames_sql(fixture_root: str, k: int = 3) -> str:
    """Frame-sample oracle over the real decoded WAV frame counts."""
    return f"""
WITH a AS (
  SELECT media_ref,
         CAST(regexp_extract(media_ref, '([0-9]+)', 1) AS BIGINT) AS i
  FROM read_parquet('{fixture_root}/media_assets.parquet')),
w AS (
  SELECT media_ref, 50 + ((i * 11) % 200) AS n_frames
  FROM a WHERE i % 2 = 1 AND i % 17 <> 0),
s AS (SELECT media_ref, n_frames, greatest(1, n_frames // {k}) AS step FROM w)
SELECT media_ref,
       CAST(least(j * step, n_frames - 1) AS BIGINT) AS frame_idx
FROM s CROSS JOIN (SELECT unnest(range({k})) AS j) t"""


def media_features_sql(fixture_root: str) -> str:
    """``media_features`` oracle: the Ray side decodes BYTES (PPM pixel
    buffer / PCM int16); this side replays the asset GENERATOR's
    formulas through the same thumbnail / energy math (fixtures.py
    build_media_assets: ppm byte p = (i+p)%256, wav byte p = (i*3+p)%256)
    -- agreement proves the decode+feature path reads exactly what the
    generator wrote."""
    w = "(4 + (i % 13))"
    h = "(3 + ((i * 7) % 11))"
    ch = "(1 + ((i // 2) % 2))"
    nf = "(50 + ((i * 11) % 200))"

    def px(c: int) -> str:  # pixel value at thumbnail cell (ty, tx), channel c
        return f"(i + (((ty * {h}) // 2) * {w} + ((tx * {w}) // 2)) * 3 + {c}) % 256"

    u = f"((i * 3 + f * {ch} * 2) % 256) + 256 * ((i * 3 + f * {ch} * 2 + 1) % 256)"
    return f"""
WITH a AS (
  SELECT media_ref, CAST(regexp_extract(media_ref, '([0-9]+)', 1) AS BIGINT) AS i
  FROM read_parquet('{fixture_root}/media_assets.parquet')),
pt AS (
  SELECT media_ref,
         SUM({px(0)}) AS sum_r, SUM({px(1)}) AS sum_g, SUM({px(2)}) AS sum_b
  FROM a
  CROSS JOIN (SELECT unnest(range(2)) AS ty)
  CROSS JOIN (SELECT unnest(range(2)) AS tx)
  WHERE i % 2 = 0 AND i % 17 <> 0
  GROUP BY media_ref),
ws AS (
  SELECT media_ref, i, unnest(range({nf})) AS f
  FROM a WHERE i % 2 = 1 AND i % 17 <> 0),
wt AS (
  SELECT media_ref,
         SUM(CASE WHEN u >= 32768 THEN abs(u - 65536) ELSE u END) AS sum_abs
  FROM (SELECT media_ref, {u} AS u FROM ws)
  GROUP BY media_ref)
SELECT a.media_ref,
       CASE WHEN i % 2 = 0 THEN 'ppm' ELSE 'wav' END AS media_type,
       i % 17 <> 0 AS parse_ok,
       CAST(coalesce(pt.sum_r, 0) AS BIGINT) AS sum_r,
       CAST(coalesce(pt.sum_g, 0) AS BIGINT) AS sum_g,
       CAST(coalesce(pt.sum_b, 0) AS BIGINT) AS sum_b,
       CAST(coalesce(wt.sum_abs, 0) AS BIGINT) AS sum_abs
FROM a
LEFT JOIN pt USING (media_ref)
LEFT JOIN wt USING (media_ref)"""


def kg_version_diff_sql(fixture_root: str, old_ts: str, new_ts: str) -> str:
    """``kg_version_diff`` restatement: the kg_triples statement at two
    time coordinates, FULL OUTER JOINed on the triple key; '' stands for
    the absent side (matching the engine's sentinel)."""
    old_stmt = kg_sql("kg_triples", fixture_root, old_ts)
    new_stmt = kg_sql("kg_triples", fixture_root, new_ts)
    return f"""
SELECT COALESCE(o.subj, n.subj) AS subj,
       COALESCE(o.pred, n.pred) AS pred,
       COALESCE(o.obj, n.obj) AS obj,
       COALESCE(o.doc_id, n.doc_id) AS doc_id,
       COALESCE(o.ontology_version, '') AS version_old,
       COALESCE(n.ontology_version, '') AS version_new,
       CASE WHEN o.subj IS NULL THEN 'added'
            WHEN n.subj IS NULL THEN 'removed'
            ELSE 'moved' END AS change
FROM ({old_stmt}) o
FULL OUTER JOIN ({new_stmt}) n
  ON o.subj = n.subj AND o.pred = n.pred AND o.obj = n.obj
 AND o.doc_id = n.doc_id
WHERE COALESCE(o.ontology_version, '') <> COALESCE(n.ontology_version, '')"""


def cooccur_triangles_sql(fixture_root: str) -> str:
    """``kg_cooccur_triangles`` restatement: distinct per-doc co-mention
    pairs, id-ordered wedge closure (each triangle once as x<y<z), degree
    and per-node triangle counts.  The engine's degree-ordered
    orientation yields the identical triangle SET -- the equality is the
    claim that orientation choice is output-invariant."""
    return f"""
WITH {_MENTIONS_CTES},
mo AS (SELECT DISTINCT doc_id, ontology_id FROM mentions WHERE ontology_id IS NOT NULL),
e AS (SELECT DISTINCT a.ontology_id AS a, b.ontology_id AS b
      FROM mo a JOIN mo b ON a.doc_id = b.doc_id AND a.ontology_id < b.ontology_id),
deg AS (SELECT node, count(*) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY 1),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tn AS (SELECT node, count(*) AS t
       FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri)
       GROUP BY 1)
SELECT d.node AS ontology_id, CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN tn t ON t.node = d.node""".replace("__ROOT__", fixture_root)


def kg_nir_report_sql(fixture_root: str) -> str:
    """NIR-check oracle over the TABLE-DRIVEN snapshot content (the Ray
    side parses the serialized RDF -- equality also revalidates the
    parser)."""
    return f"""
WITH content AS (SELECT * FROM read_parquet('{fixture_root}/snapshot_content.parquet')),
idx AS (SELECT * FROM read_parquet('{fixture_root}/ontology_index.parquet')),
per AS (
  SELECT c.ontology_id, c.version,
         CAST(len(c.classes) + len(c.properties) + len(c.same_as_a)
              + len(c.equiv_a) AS BIGINT) AS parsed_triples,
         list_contains(
           [split_part(x, '#', 1)
            FOR x IN list_concat(list_concat(c.classes, c.properties),
                                 list_concat(c.same_as_a, c.equiv_a))],
           rtrim(i.iri, '/')) AS uri_in_subject_position
  FROM content c JOIN idx i USING (ontology_id))
SELECT uri_in_subject_position,
       CAST(count(*) AS BIGINT) AS n_snapshots,
       CAST(sum(parsed_triples) AS BIGINT) AS parsed_triples
FROM per GROUP BY 1"""


def kg_report_ab_sql(fixture_root: str, timestamp: str = "2021-06-01") -> str:
    """A/B policy report: the kg_report chain evaluated TWICE with the
    per-row policy column overridden to a fixed policy (exactly what
    KgPipeline.with_policy does -- per_row_policy=False), full-outer
    joined on (category, format) with NULL-safe key equality."""

    def fixed(policy: str) -> str:
        body = (
            f"WITH {_MENTIONS_CTES},{_ROUTING_CTES}\n"
            "SELECT category, report_fmt AS format, count(*) AS n "
            "FROM outcome GROUP BY 1, 2"
        )
        forced = body.replace(
            "SELECT doc_id, accept, policy,\n",
            f"SELECT doc_id, accept, '{policy}' AS policy,\n",
            1,
        )
        assert forced != body, "raw_spans policy projection not found"
        return forced.replace("__ROOT__", fixture_root).replace("__T__", timestamp)

    return f"""
WITH a AS ({fixed('original')}),
     b AS ({fixed('originalFailoverLiveLatest')})
SELECT coalesce(a.category, b.category) AS category,
       coalesce(a.format, b.format) AS format,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_original,
       CAST(coalesce(b.n, 0) AS BIGINT) AS n_failover
FROM a FULL OUTER JOIN b
  ON a.category = b.category AND a.format IS NOT DISTINCT FROM b.format"""


#: testdata-view queries (driver pre-registers the views).
STOP_RE = "|".join(("the", "a", "and", "of", "to", "in", "is"))

TESTDATA_SQL: dict[str, str] = {
    "rel_q1_lineitem": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
  SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
  count(*) AS count_order
FROM lineitem GROUP BY 1, 2""",
    "rel_topk_orders": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "rel_orders_by_nation": """
SELECT n.n_name, count(*) AS n_orders,
  SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1""",
    "rel_order_lineitem_join": """
SELECT o.o_orderpriority, count(*) AS n_items,
  SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1""",
    "rel_full_outer": """
WITH c AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer WHERE c_custkey % 3 <> 0
),
o AS (SELECT o_custkey AS c_custkey, count(*) AS n_orders FROM orders
      WHERE o_custkey % 5 <> 0 GROUP BY 1)
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey,
       COALESCE(c.acctbal_cents, -1) AS acctbal_cents,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CASE WHEN c.c_custkey IS NULL THEN 'right_only'
            WHEN o.c_custkey IS NULL THEN 'left_only'
            ELSE 'both' END AS side
FROM c FULL OUTER JOIN o ON o.c_custkey = c.c_custkey""",
    "rel_price_quantiles": """
WITH c AS (SELECT round(o_totalprice * 100) / 100.0 AS p FROM orders)
SELECT 0.25 AS q, quantile_disc(p, 0.25) AS price FROM c
UNION ALL SELECT 0.50, quantile_disc(p, 0.50) FROM c
UNION ALL SELECT 0.75, quantile_disc(p, 0.75) FROM c
UNION ALL SELECT 0.90, quantile_disc(p, 0.90) FROM c""",
    "rel_distinct_customers": """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1""",
    "rel_distinct_sketch": """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders""",
    "sample_docs_hash": """
SELECT doc_id FROM documents
WHERE substr(md5(coalesce(text, '')), 1, 1) IN ('0', '1')""",
    "events_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour,
  count(*) AS n_events,
  CAST(SUM(CAST(coalesce(regexp_extract(props, '"k":\\s*(\\d+)', 1), '0') AS BIGINT)) AS BIGINT) AS sum_k,
  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2""",
    "events_asof_join": """
WITH ev AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase', 'click')
), marked AS (
  SELECT *,
    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_event_id,
    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM ev)
SELECT event_id AS purchase_event_id, user_id, ts AS purchase_ts,
       click_event_id, click_ts
FROM marked
WHERE event_type = 'purchase' AND click_event_id IS NOT NULL""",
    "events_range_join": """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT e.event_id AS error_event_id, e.user_id, e.ts AS error_ts,
       CAST(count(c.ts) AS BIGINT) AS n_recent_clicks
FROM e LEFT JOIN c ON c.user_id = e.user_id
  AND c.ts > e.ts - INTERVAL 5 MINUTE AND c.ts <= e.ts
GROUP BY 1, 2, 3""",
    "events_sessions": """
WITH x AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT user_id, count(*) AS n_events,
  CAST(SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY 1""",
    "events_sliding": """
WITH expanded AS (
  SELECT user_id,
         time_bucket(INTERVAL '30 minutes', ts)
           - (unnest([0, 1])) * INTERVAL 30 MINUTE AS window_start,
         CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events)
SELECT user_id, window_start,
  count(*) AS n_events,
  SUM(value_c) / 100.0 AS sum_value
FROM expanded GROUP BY 1, 2""",
    "events_topk_users": """
SELECT user_id, count(*) AS n_events,
  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY 1
ORDER BY SUM(CAST(round(value * 100) AS BIGINT)) DESC, user_id LIMIT 10""",
    # co-movement companions: same (hour, type) cell >= k times, hot
    # cells (> 64 users) dropped before the pair self-join
    "events_comovement": """
WITH c AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hh, event_type
           FROM events),
ok AS (SELECT hh, event_type FROM c GROUP BY 1, 2 HAVING COUNT(*) <= 64),
p AS (SELECT x.user_id AS ua, y.user_id AS ub
      FROM c x
      JOIN ok ON ok.hh = x.hh AND ok.event_type = x.event_type
      JOIN c y ON y.hh = x.hh AND y.event_type = x.event_type
             AND x.user_id < y.user_id)
SELECT ua AS user_a, ub AS user_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 4""",
    # Kleene+ event-trend aggregation: maximal strictly-increasing runs
    # per user via the lag/gap-and-island window idiom
    "events_trends": """
WITH s AS (
  SELECT user_id, ts, event_id,
    CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
rid AS (
  SELECT user_id,
    SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s),
runs AS (SELECT user_id, run_id, COUNT(*) AS run_len FROM rid GROUP BY 1, 2)
SELECT user_id,
       CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_trends,
       CAST(MAX(run_len) AS BIGINT) AS max_run
FROM runs GROUP BY user_id""",
    "text_stats": f"""
SELECT doc_id, length(text) AS n_chars,
  len(regexp_extract_all(text, '\\S+')) AS n_tokens,
  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
  len(regexp_extract_all(text, '\\b({STOP_RE})\\b')) AS n_stopwords
FROM documents""",
    "text_quality": f"""
SELECT doc_id,
  CAST(length(text) BETWEEN 100 AND 20000 AS BIGINT)
  + CAST(len(regexp_extract_all(text, '\\S+')) > 0
         AND len(regexp_extract_all(text, '\\b({STOP_RE})\\b')) * 100
         >= len(regexp_extract_all(text, '\\S+')) AS BIGINT)
  + CAST(len(regexp_extract_all(text, '\\S+')) > 0
         AND len(regexp_extract_all(text, '[.,;:!?]')) * 10
         <= len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS quality
FROM documents""",
    # source-level reputation: same integer quality formula, grouped
    # at the publisher grain, integer-rational accept verdict
    "source_reputation": f"""
WITH q AS (SELECT COALESCE(source, '') AS source,
      CAST(length(text) BETWEEN 100 AND 20000 AS BIGINT)
      + CAST(len(regexp_extract_all(text, '\\S+')) > 0
             AND len(regexp_extract_all(text, '\\b({STOP_RE})\\b')) * 100
             >= len(regexp_extract_all(text, '\\S+')) AS BIGINT)
      + CAST(len(regexp_extract_all(text, '\\S+')) > 0
             AND len(regexp_extract_all(text, '[.,;:!?]')) * 10
             <= len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS quality
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       SUM(CAST(quality >= 2 AS BIGINT)) AS n_ok,
       CAST(SUM(CAST(quality >= 2 AS BIGINT)) * 1000
            >= 950 * COUNT(*) AS BIGINT) AS accepted
FROM q GROUP BY source""",
    "source_filter": f"""
WITH q AS (SELECT COALESCE(source, '') AS source,
      CAST(length(text) BETWEEN 100 AND 20000 AS BIGINT)
      + CAST(len(regexp_extract_all(text, '\\S+')) > 0
             AND len(regexp_extract_all(text, '\\b({STOP_RE})\\b')) * 100
             >= len(regexp_extract_all(text, '\\S+')) AS BIGINT)
      + CAST(len(regexp_extract_all(text, '\\S+')) > 0
             AND len(regexp_extract_all(text, '[.,;:!?]')) * 10
             <= len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS quality
  FROM documents),
rep AS (SELECT source FROM q GROUP BY source
        HAVING SUM(CAST(quality >= 2 AS BIGINT)) * 1000 >= 950 * COUNT(*))
SELECT d.doc_id, d.source FROM documents d
JOIN rep ON rep.source = COALESCE(d.source, '')""",
    "text_repetition": """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
e AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      FROM w WHERE len(w) >= 2),
c AS (SELECT doc_id, g, count(*) AS c FROM e GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(sum(c) - count(*) AS BIGINT) AS n_dup_bigrams,
             CAST(max(c) AS BIGINT) AS top_bigram_count
      FROM c GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.n_dup_bigrams, 0) AS n_dup_bigrams,
       coalesce(a.top_bigram_count, 0) AS top_bigram_count,
       CAST(coalesce(a.n_dup_bigrams * 100 > 20 * a.n_bigrams
                     OR a.top_bigram_count * 100 > 8 * a.n_bigrams, FALSE) AS BIGINT) AS repetitive
FROM documents d LEFT JOIN a USING (doc_id)""",
    "text_decontaminate": """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 2),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
      FROM w WHERE len(w) >= 4),
bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0 AND doc_id < 970000)
SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_hits
FROM (SELECT doc_id, g FROM g
      WHERE NOT (doc_id % 97 = 0 AND doc_id < 970000)) c
JOIN bg USING (g) GROUP BY 1""",
    "pack_sequences": """
WITH t AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
           FROM documents)
SELECT doc_id, n_tokens,
  (SUM(n_tokens) OVER (ORDER BY doc_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2048 AS shard
FROM t""",
    "chunk_documents": """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
c AS (SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) = 0 THEN 0
                  WHEN len(w) <= 64 THEN 1
                  ELSE 1 + (len(w) - 64 + 47) // 48 END AS n_chunks
      FROM w),
e AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * 48 AS BIGINT) AS start_tok,
       CAST(least(n - chunk_idx * 48, 64) AS BIGINT) AS n_tokens,
       array_to_string(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
FROM e""",
    "chunk_pack": """
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
c AS (SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) = 0 THEN 0
                  WHEN len(w) <= 64 THEN 1
                  ELSE 1 + (len(w) - 64 + 47) // 48 END AS n_chunks
      FROM w),
e AS (SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
t AS (SELECT doc_id * 4096 + chunk_idx AS doc_id,
             CAST(least(n - chunk_idx * 48, 64) AS BIGINT) AS n_tokens
      FROM e)
SELECT doc_id, n_tokens,
  (SUM(n_tokens) OVER (ORDER BY doc_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2048 AS shard
FROM t""",
    "shuffle_index": """
SELECT doc_id,
  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS shuffle_pos
FROM documents""",
    "text_fingerprint": """
SELECT doc_id, md5(lower(trim(text, ' \t\n\r'))) AS fingerprint FROM documents""",
    "dedup_exact": """
SELECT doc_id, md5(lower(trim(text, ' \t\n\r'))) AS fingerprint FROM documents
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1""",
    "dedup_incremental": """
WITH split AS (SELECT (max(doc_id) + 1) // 2 AS s FROM documents),
fp AS (SELECT doc_id, md5(lower(trim(text, ' \t\n\r'))) AS fingerprint
       FROM documents),
base AS (SELECT DISTINCT fingerprint FROM fp, split WHERE doc_id < s),
delta AS (SELECT doc_id, fingerprint FROM fp, split WHERE doc_id >= s)
SELECT doc_id, fingerprint FROM delta
WHERE fingerprint NOT IN (SELECT fingerprint FROM base)
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1""",
    "corpus_clean": f"""
WITH w AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS tok FROM documents),
q AS (SELECT doc_id,
  CAST(length(text) BETWEEN 100 AND 20000 AS BIGINT)
  + CAST(len(tok) > 0 AND
         len(regexp_extract_all(text, '\\b({STOP_RE})\\b')) * 100 >= len(tok) AS BIGINT)
  + CAST(len(tok) > 0 AND
         len(regexp_extract_all(text, '[.,;:!?]')) * 10 <= len(tok) AS BIGINT) AS quality
  FROM w),
e AS (SELECT doc_id, unnest(list_transform(range(1, len(tok)), i -> tok[i] || ' ' || tok[i+1])) AS g
      FROM w WHERE len(tok) >= 2),
c AS (SELECT doc_id, g, count(*) AS c FROM e GROUP BY 1, 2),
r AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, CAST(sum(c) - count(*) AS BIGINT) AS dup,
             CAST(max(c) AS BIGINT) AS top FROM c GROUP BY 1),
rep AS (SELECT w.doc_id,
               CAST(coalesce(r.dup * 100 > 20 * r.nb OR r.top * 100 > 8 * r.nb, FALSE) AS BIGINT) AS repetitive
        FROM w LEFT JOIN r ON r.doc_id = w.doc_id),
g4 AS (SELECT doc_id,
              unnest(list_transform(range(1, len(tok) - 2),
                     i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] || ' ' || tok[i+3])) AS g
       FROM w WHERE len(tok) >= 4),
bg AS (SELECT DISTINCT g FROM g4 WHERE doc_id % 97 = 0 AND doc_id < 970000),
contam AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN bg USING (g)
           WHERE NOT (g4.doc_id % 97 = 0 AND g4.doc_id < 970000)),
kept AS (
  SELECT w.doc_id, md5(lower(trim(text, ' \t\n\r'))) AS fingerprint
  FROM w JOIN q USING (doc_id) JOIN rep ON rep.doc_id = w.doc_id
  WHERE NOT (w.doc_id % 97 = 0 AND w.doc_id < 970000)
    AND q.quality >= 2 AND rep.repetitive = 0
    AND w.doc_id NOT IN (SELECT doc_id FROM contam))
SELECT doc_id, fingerprint FROM kept
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1""",
    "lang_id": """
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\\b(the|and|of)\\b'))  AS s_en,
    len(regexp_extract_all(lower(text), '\\b(der|und|die)\\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\\b(le|et|les)\\b'))   AS s_fr,
    len(regexp_extract_all(lower(text), '\\b(el|y|los)\\b'))    AS s_es
  FROM documents),
g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS mx FROM s)
SELECT doc_id,
  CASE WHEN mx <= 0 THEN 'unknown'
       WHEN CAST(s_en = mx AS INT) + CAST(s_de = mx AS INT)
            + CAST(s_fr = mx AS INT) + CAST(s_es = mx AS INT) > 1 THEN 'unknown'
       WHEN s_en = mx THEN 'en' WHEN s_de = mx THEN 'de'
       WHEN s_fr = mx THEN 'fr' ELSE 'es' END AS lang_pred
FROM g""",
    "dedup_jaccard": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
expanded AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i
  FROM toks WHERE len(t) > 0),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
  FROM expanded),
freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN freq f ON f.shingle = a.shingle
  WHERE f.df BETWEEN 2 AND 50
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
SELECT p.a, p.b, p.inter, sa.sz + sb.sz - p.inter AS union_size
FROM pairs p JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
WHERE p.inter * 100 >= 80 * (sa.sz + sb.sz - p.inter)""",
    "ann_bruteforce": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 3),
scored AS (
  SELECT q.query_id, e.vec_id,
    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) AS sim
  FROM embeddings e CROSS JOIN q)
SELECT query_id, vec_id FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= 10""",
    "rel_rank_parts_by_brand": """
SELECT p_brand, CAST(rnk AS BIGINT) AS rnk, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
    row_number() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part)
WHERE rnk <= 3""",
    "rel_customers_no_urgent": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')""",
    "rel_suppliers_with_returns": """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')""",
    "rel_brand_revenue": """
SELECT p.p_brand, count(*) AS n_items,
  SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1""",
    "rel_segment_quantiles": """
WITH c AS (
  SELECT c_mktsegment, round(c_acctbal * 100) / 100.0 AS bal FROM customer)
SELECT c_mktsegment, 0.50 AS q, quantile_disc(bal, 0.50) AS acctbal
FROM c GROUP BY 1
UNION ALL
SELECT c_mktsegment, 0.95, quantile_disc(bal, 0.95) FROM c GROUP BY 1""",
    "rel_rollup_lineitem": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "rel_cube_lineitem": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "events_window_funcs": """
SELECT user_id, event_id,
  CAST(row_number() OVER w AS BIGINT) AS row_num,
  CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS BIGINT) AS gap_us,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_c
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "rel_pivot_orders": """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY 1""",
    "sample_stratified": """
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '\\b(the|and|of)\\b'))  AS s_en,
    len(regexp_extract_all(lower(text), '\\b(der|und|die)\\b')) AS s_de,
    len(regexp_extract_all(lower(text), '\\b(le|et|les)\\b'))   AS s_fr,
    len(regexp_extract_all(lower(text), '\\b(el|y|los)\\b'))    AS s_es
  FROM documents),
g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS mx FROM s),
pred AS (
  SELECT doc_id,
    CASE WHEN mx <= 0 THEN 'unknown'
         WHEN CAST(s_en = mx AS INT) + CAST(s_de = mx AS INT)
              + CAST(s_fr = mx AS INT) + CAST(s_es = mx AS INT) > 1 THEN 'unknown'
         WHEN s_en = mx THEN 'en' WHEN s_de = mx THEN 'de'
         WHEN s_fr = mx THEN 'fr' ELSE 'es' END AS lang_pred
  FROM g)
SELECT d.doc_id, p.lang_pred
FROM documents d JOIN pred p USING (doc_id)
WHERE CAST(concat('0x', substr(md5(coalesce(d.text, '')), 1, 1)) AS BIGINT)
      < CASE p.lang_pred WHEN 'en' THEN 1 ELSE 4 END""",
    "text_tokens_bpe": """
SELECT doc_id,
  len(regexp_extract_all(text,
    '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+'
  )) AS n_bpe_tokens
FROM documents""",
    "text_winnow": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
sh AS (  -- 3-token shingles, position-ordered
  SELECT doc_id, i,
    CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + 2), ' ')), 1, 13))
         AS BIGINT) AS h
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3)),
wins AS (
  SELECT doc_id,
    min(h) OVER win AS fp,
    count(*) OVER win AS cnt
  FROM sh
  WINDOW win AS (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
SELECT DISTINCT doc_id, fp FROM wins WHERE cnt = 4""",
    "text_lm_coverage": """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
big AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS bg
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM toks WHERE len(t) >= 2)),
top AS (
  SELECT bg FROM (
    SELECT bg, count(*) AS n FROM big GROUP BY 1
    ORDER BY n DESC, bg LIMIT 1000)),
scored AS (
  SELECT b.doc_id,
    count(*) AS n_bigrams,
    count(*) FILTER (WHERE EXISTS (SELECT 1 FROM top tp WHERE tp.bg = b.bg))
      AS n_in_top
  FROM big b GROUP BY 1)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_in_top AS BIGINT) AS n_in_top FROM scored""",
    "text_top_terms_sketch": """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS term FROM documents)
SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
FROM toks GROUP BY term
ORDER BY n_occurrences DESC, term LIMIT 20""",
    "text_top_terms": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM toks GROUP BY term
ORDER BY n_docs DESC, term LIMIT 20""",
}


def _minhash_perm_values(num_perm: int = 64, seed: int = 42) -> str:
    """VALUES literal of the MinHash permutation coefficients.  The a/b
    draws replay ``MinHasher.__init__`` (same numpy RandomState seed) --
    the coefficients are shared CONFIGURATION; the signature/banding/
    verify/cluster logic below is an independent SQL restatement."""
    import numpy as np

    mersenne = (1 << 61) - 1
    rng = np.random.RandomState(seed)
    a = rng.randint(1, mersenne, size=num_perm, dtype=np.int64)
    b = rng.randint(0, mersenne, size=num_perm, dtype=np.int64)
    return ",\n    ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(num_perm)
    )


def _minhash_sql() -> str:
    """Full restatement of ``minhash_clusters`` defaults (threshold 0.8,
    64 perms, 16 bands of 4):  md5-derived shingle hash -> affine
    permutation minima (numpy int64 wraparound emulated exactly in
    HUGEINT: fold mod 2**64, reinterpret signed, floor-mod the Mersenne
    prime) -> band buckets keyed on the 4-signature tuple (the engine
    folds the tuple to one 64-bit hash; equal tuples <=> equal hashes
    absent astronomically-unlikely collisions) -> 200-doc bucket cap ->
    signature-agreement verify at >= 45/64 (= ceil of the 2-sigma-relaxed
    0.7 threshold -- 0.8 - 2*sqrt(0.8*0.2/64) -- on the 1/64 agreement
    grid) -> connected components
    (VARCHAR min root, matching the engine's representative) -> every doc
    labeled with its component root or itself."""
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
expanded AS (
  SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i
  FROM toks WHERE len(t) > 0),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
  FROM expanded),
hx AS (
  SELECT doc_id,
    CAST(CAST(concat('0x', substr(md5(shingle), 1, 16)) AS UBIGINT) >> 3 AS BIGINT) AS x
  FROM sh),
perm(p, a, b) AS (VALUES
    {_minhash_perm_values()}),
sig AS (
  SELECT doc_id, p, min(CAST(
      ((CASE WHEN w >= 9223372036854775808::HUGEINT
             THEN w - 18446744073709551616::HUGEINT ELSE w END
        % 2305843009213693951) + 2305843009213693951) % 2305843009213693951
      AS BIGINT)) AS v
  FROM (SELECT h.doc_id, perm.p,
               (perm.a::HUGEINT * h.x + perm.b) % 18446744073709551616::HUGEINT AS w
        FROM hx h CROSS JOIN perm)
  GROUP BY 1, 2),
sigs AS (  -- shingle-less docs carry the all-Mersenne sentinel signature
  SELECT * FROM sig
  UNION ALL
  SELECT d.doc_id, perm.p, 2305843009213693951 AS v
  FROM documents d CROSS JOIN perm
  WHERE d.doc_id NOT IN (SELECT doc_id FROM sh)),
bandkey AS (
  SELECT doc_id, p // 4 AS band,
         string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS bkey
  FROM sigs GROUP BY 1, 2),
bsize AS (SELECT band, bkey, count(*) AS n FROM bandkey GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
  FROM bandkey x
  JOIN bandkey y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
  JOIN bsize s ON s.band = x.band AND s.bkey = x.bkey
  WHERE s.n <= 200),
agree AS (
  SELECT c.da, c.db, count(*) FILTER (WHERE sa.v = sb.v) AS n_eq
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.da
  JOIN sigs sb ON sb.doc_id = c.db AND sb.p = sa.p
  GROUP BY 1, 2),
edges AS MATERIALIZED (
  SELECT CAST(da AS VARCHAR) AS u, CAST(db AS VARCHAR) AS v
  FROM agree WHERE n_eq >= 45),
nodes AS (SELECT u AS nn FROM edges UNION SELECT v FROM edges),
sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
reach(x, y) AS (
  SELECT nn, nn FROM nodes
  UNION
  SELECT r.x, s.v FROM reach r JOIN sym s ON s.u = r.y),
comp AS (SELECT x AS node, min(y) AS root FROM reach GROUP BY x)
SELECT d.doc_id, coalesce(c.root, CAST(d.doc_id AS VARCHAR)) AS cluster
FROM documents d
LEFT JOIN comp c ON c.node = CAST(d.doc_id AS VARCHAR)"""


#: ``simhash_pairs`` restatement: per-doc 64-bit SimHash as explicit
#: (doc, bit) majority votes over md5-derived distinct-token hashes,
#: 4x16-bit segment blocking with the 200-doc bucket cap, hamming as a
#: bit-level disagreement count.  Token-less docs keep the all-zero
#: bitset (no votes -> no set bits), exactly like the engine.
_SIMHASH_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, tk
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tk
        FROM documents)),
ntok AS (
  SELECT d.doc_id, coalesce(c.n, 0) AS n
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1) c
    ON c.doc_id = d.doc_id),
th AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tk), 1, 16)) AS UBIGINT) AS h
  FROM tok),
idx AS (SELECT unnest(range(0, 64)) AS i),
votes AS (
  SELECT doc_id, i.i, count(*) FILTER (WHERE (h >> CAST(i.i AS UBIGINT)) & 1 = 1) AS ones
  FROM th CROSS JOIN idx i
  GROUP BY 1, 2),
bitset AS (
  SELECT n.doc_id, i.i,
    CASE WHEN 2 * coalesce(v.ones, 0) > n.n THEN 1 ELSE 0 END AS bit
  FROM ntok n
  CROSS JOIN idx i
  LEFT JOIN votes v ON v.doc_id = n.doc_id AND v.i = i.i),
seg AS (
  SELECT doc_id, i // 16 AS s, sum(bit * (1::BIGINT << (i % 16))) AS seg_val
  FROM bitset GROUP BY 1, 2),
segsize AS (SELECT s, seg_val, count(*) AS n FROM seg GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM seg x
  JOIN seg y ON x.s = y.s AND x.seg_val = y.seg_val AND x.doc_id < y.doc_id
  JOIN segsize z ON z.s = x.s AND z.seg_val = x.seg_val
  WHERE z.n <= 200),
ham AS (
  SELECT c.a, c.b, count(*) FILTER (WHERE ba.bit <> bb.bit) AS hamming
  FROM cand c
  JOIN bitset ba ON ba.doc_id = c.a
  JOIN bitset bb ON bb.doc_id = c.b AND bb.i = ba.i
  GROUP BY 1, 2)
SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM ham WHERE hamming <= 3"""

def _classifier_sql(buckets: int = 4096, weight_mod: int = 2001) -> str:
    """``classifier_filter`` restatement: the same hashed-feature linear
    model -- bucket = 13-hex-char md5 prefix of the lowercased token mod
    ``buckets``; weight = md5-derived integer in [-1000, 1000] per bucket
    (the 4096-row weight CTE IS the model); document score = plain
    integer sum over token occurrences; keep = score >= 0."""
    half = weight_mod // 2
    return f"""
WITH w AS (
  SELECT b, CAST(concat('0x', substr(md5(concat('clfw:', CAST(b AS VARCHAR))), 1, 13))
                 AS BIGINT) % {weight_mod} - {half} AS wt
  FROM range({buckets}) t(b)),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tk
  FROM documents),
tb AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tk), 1, 13)) AS BIGINT) % {buckets} AS b
  FROM tok),
s AS (
  SELECT doc_id, CAST(sum(w.wt) AS BIGINT) AS clf_score
  FROM tb JOIN w USING (b) GROUP BY 1)
SELECT d.doc_id,
       coalesce(s.clf_score, 0) AS clf_score,
       CAST(coalesce(s.clf_score, 0) >= 0 AS BIGINT) AS keep
FROM documents d LEFT JOIN s USING (doc_id)"""


#: ``rel_cheapest_part`` restatement: row_number argmin per group.
TESTDATA_SQL["rel_cheapest_part"] = """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
       p_partkey, p_name
FROM part
QUALIFY row_number() OVER (
  PARTITION BY p_brand, p_size
  ORDER BY CAST(round(p_retailprice * 100) AS BIGINT), p_partkey) = 1"""

#: ``events_late_arrivals`` restatement: per-user arrival-order running
#: max as a window function, the same integer lateness test, hour rollup.
TESTDATA_SQL["events_late_arrivals"] = """
WITH e AS (
  -- floor, not CAST: epoch() is a fractional DOUBLE here and CAST
  -- rounds, while the engine's ns // 1e9 floors
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
w AS (
  SELECT t, max(t) OVER (
    PARTITION BY user_id
    ORDER BY event_id + CASE WHEN event_id % 11 = 0 THEN 50 ELSE 0 END, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM e),
f AS (SELECT t // 3600 AS hour,
             CAST(wm IS NOT NULL AND t + 300 < wm AS BIGINT) AS late
      FROM w)
SELECT hour, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(late) AS BIGINT) AS n_late
FROM f GROUP BY 1"""

#: ``rel_q18_large_orders`` restatement: plain HAVING + joins + LIMIT.
TESTDATA_SQL["rel_q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 180)
SELECT c.c_name, o.o_orderkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c, b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY price_c DESC, o.o_orderkey LIMIT 20"""

#: ``events_outliers`` restatement: the integer-squared z-score test --
#: (n*v - sum)^2 > k^2 * (n*sumsq - sum^2), no sqrt and no division.
TESTDATA_SQL["events_outliers"] = """
WITH e AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS v FROM events),
st AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS sq
  FROM e GROUP BY 1)
SELECT e.event_id, e.user_id, e.v AS value_c
FROM e JOIN st USING (user_id)
WHERE (st.n * e.v - st.s) * (st.n * e.v - st.s)
      > 9 * (st.n * st.sq - st.s * st.s)"""

#: ``sample_per_group`` restatement: same md5 rank, same tiebreak.
TESTDATA_SQL["sample_per_group"] = """
SELECT lang, doc_id, md5(concat('spg:', CAST(doc_id AS VARCHAR))) AS h
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= 5"""

#: ``profile_lineitem`` restatement: same canonical VARCHAR encodings
#: (plain strings; zero-padded integer cents / epoch seconds, so the
#: lexicographic min/max is the numeric one and no float formatting is
#: compared), plain SQL aggregates per column.
TESTDATA_SQL["rel_profile"] = """
WITH p AS (
  SELECT 'l_returnflag' AS col_name, l_returnflag AS v FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', l_linestatus FROM lineitem
  UNION ALL
  SELECT 'l_quantity',
         lpad(CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR), 12, '0')
  FROM lineitem
  UNION ALL
  SELECT 'l_shipdate',
         lpad(CAST(CAST(epoch(l_shipdate) AS BIGINT) AS VARCHAR), 12, '0')
  FROM lineitem)
SELECT col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(v) AS BIGINT) AS n_null,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       min(v) AS min_v, max(v) AS max_v
FROM p GROUP BY 1"""

TESTDATA_SQL["text_classify"] = _classifier_sql()
TESTDATA_SQL["dedup_minhash"] = _minhash_sql()
TESTDATA_SQL["dedup_simhash"] = _SIMHASH_SQL


def ann_lsh_sql(
    dim: int, k: int = 10, n_queries: int = 3, n_planes: int = 6, seed: int = 7
) -> str:
    """Full restatement of ``ann_lsh`` defaults: the hyperplanes are
    emitted as exact float64 literals (``repr`` round-trips the doubles),
    bucket = sign-bit fold of the plane dot products, each query scored
    only against its own bucket, cosine top-k with the (sim DESC, vec_id)
    tie-break.  Sign agreement between numpy's BLAS dot and DuckDB's
    sequential ``list_dot_product`` holds unless a true dot product sits
    within ~1e-15 of zero -- the same float64 determinism contract the
    ann_bruteforce oracle already relies on for its top-k boundary."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            p, ", ".join(repr(float(v)) for v in planes[p])
        )
        for p in range(n_planes)
    )
    return f"""
WITH planes(p, pv) AS (VALUES
    {rows}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
buck AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.emb, p.pv) > 0
                  THEN (1::BIGINT << p.p) ELSE 0 END) AS bucket
  FROM e CROSS JOIN planes p GROUP BY 1),
q AS (
  SELECT e.vec_id AS query_id, e.emb AS qe, b.bucket AS qb
  FROM e JOIN buck b ON b.vec_id = e.vec_id
  ORDER BY e.vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.emb, q.qe) AS sim
  FROM e JOIN buck b ON b.vec_id = e.vec_id
  JOIN q ON q.qb = b.bucket)
SELECT query_id, vec_id FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) <= {k}"""


#: recognized CLI tokens for the auth-config parse (config.py:141-337).
_AUTH_VALUE_OPTS = {
    "ontoFormat": ("turtle", "ntriples", "rdfxml", "htmldocu"),
    "ontoPrecedence": ("default", "enforcedPriority", "always"),
    "ontoVersion": (
        "original", "originalFailoverLiveLatest", "latestArchived", "timestampArchived",
    ),
    "httpsInterception": ("none", "all", "block", "archivo"),
}
_AUTH_DEFAULTS = {
    "ontoFormat": "ntriples",
    "ontoPrecedence": "enforcedPriority",
    "ontoVersion": "latestArchived",
    "httpsInterception": "all",
}
_AUTH_FLAGS = ("patchAcceptUpstream", "restrictedAccess", "disableRemovingRedirects")
_AUTH_KNOWN = (
    list(_AUTH_VALUE_OPTS)
    + list(_AUTH_FLAGS)
    + ["clientConfigViaProxyAuth", "logLevelTimeMachine", "logLevelBase", "host", "port"]
)


def client_config_sql(fixture_root: str) -> str:
    """Independent SQL restatement of the per-client auth-config parse
    (M10/M11): base64 decode, exactly-one-':' credential split, www-form
    decode of the username, token-list validation (unknown args, stray
    positionals, missing/invalid enum values), enum case-insensitive
    canonicalization with reference defaults."""

    def enum_case(name: str) -> str:
        low = {v.lower(): v for v in _AUTH_VALUE_OPTS[name]}
        whens = "\n         ".join(f"WHEN '{k}' THEN '{v}'" for k, v in low.items())
        return (
            f"CASE WHEN NOT list_contains(toks, '--{name}') THEN '{_AUTH_DEFAULTS[name]}'\n"
            f"    ELSE (CASE lower(regexp_extract(dec, '--{name} ([^ ]+)', 1))\n"
            f"         {whens} ELSE NULL END) END"
        )

    known_list = ", ".join(f"'--{n}'" for n in _AUTH_KNOWN)
    # an option is "broken" if present but its next token is missing or
    # itself a flag (regexp_extract then yields '' or '--...', which the
    # enum CASE maps to NULL -> parse error)
    enum_checks = " AND ".join(f"cfg_{n} IS NOT NULL" for n in _AUTH_VALUE_OPTS)
    enum_cols = ",\n    ".join(f"{enum_case(n)} AS cfg_{n}" for n in _AUTH_VALUE_OPTS)
    flag_cols = ",\n    ".join(
        f"CAST(list_contains(toks, '--{n}') AS VARCHAR) AS cfg_{n}" for n in _AUTH_FLAGS
    )
    return f"""
WITH a AS (
  SELECT client_id, auth_header
  FROM read_parquet('{fixture_root}/client_auth.parquet')),
b AS (  -- "Basic <b64>" with a decodable payload; anything else -> NULL
  SELECT *, CASE
    WHEN auth_header IS NULL THEN NULL
    WHEN NOT regexp_matches(auth_header, '^[Bb]asic [A-Za-z0-9+/]+=*$') THEN NULL
    ELSE decode(from_base64(regexp_extract(auth_header, '^[Bb]asic (.*)$', 1)))
  END AS creds FROM a),
c AS (
  SELECT *, CASE WHEN creds IS NULL OR len(string_split(creds, ':')) != 2 THEN NULL
                 ELSE string_split(creds, ':')[1] END AS uenc FROM b),
d AS (  -- www-form decode ('+' and '%20' are the fixture's only escapes)
  SELECT *, replace(replace(uenc, '+', ' '), '%20', ' ') AS dec FROM c),
e AS (SELECT *, string_split(dec, ' ') AS toks FROM d),
f AS (
  SELECT *,
    {enum_cols},
    {flag_cols},
    (dec IS NOT NULL
     AND dec LIKE '--%'  -- catches empty usernames and leading positionals
     AND len(list_filter(toks, t -> t = '')) = 0  -- argparse('') errors
     AND len(list_filter(toks, t -> t LIKE '--%'
                                AND t NOT IN ({known_list}))) = 0
    ) AS args_shape_ok
  FROM e),
g AS (
  SELECT *, (args_shape_ok AND {enum_checks}) AS ok FROM f)
SELECT client_id,
  CAST(ok AS BIGINT) AS parse_ok,
  CASE WHEN ok THEN cfg_ontoFormat END AS onto_format,
  CASE WHEN ok THEN cfg_ontoPrecedence END AS onto_precedence,
  CASE WHEN ok THEN cfg_ontoVersion END AS onto_version,
  CASE WHEN ok THEN cfg_httpsInterception END AS https_interception,
  CASE WHEN ok THEN cfg_patchAcceptUpstream END AS patch_accept_upstream,
  CASE WHEN ok THEN cfg_restrictedAccess END AS restricted_access
FROM g"""


def dedup_embed_sql(fixture_root: str) -> str:
    """Exact all-pairs restatement of ``dedup_embed`` over the augmented
    embeddings fixture (the Ray side uses banded-LSH blocking whose miss
    probability at cosine>=0.99 is ~1e-7 per pair -- see
    stages/similarity.py -- so the exact SQL answer is the expected set)."""
    return f"""
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM read_parquet('{fixture_root}/embeddings_aug.parquet'))
SELECT a.vec_id AS a, b.vec_id AS b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE CAST(round(list_cosine_similarity(a.e, b.e) * 1e6) AS BIGINT) >= 990000"""


def embed_dedup_keep_sql(fixture_root: str) -> str:
    """Recursive-CTE restatement of ``embedding_dedup_keep``: exact
    all-pairs near-dup edges -> connected components (VARCHAR min root,
    matching the engine's string representative) -> ids minus non-root
    members."""
    return f"""
WITH RECURSIVE n AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM read_parquet('{fixture_root}/embeddings_aug.parquet')),
p AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE CAST(round(list_cosine_similarity(a.e, b.e) * 1e6) AS BIGINT) >= 990000),
edges AS MATERIALIZED (SELECT CAST(a AS VARCHAR) AS u, CAST(b AS VARCHAR) AS v FROM p),
nodes AS (SELECT u AS nn FROM edges UNION SELECT v FROM edges),
sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
reach(x, y) AS (
  SELECT nn, nn FROM nodes
  UNION
  SELECT r.x, s.v FROM reach r JOIN sym s ON s.u = r.y),
comp AS (SELECT x AS node, min(y) AS root FROM reach GROUP BY x)
SELECT vec_id FROM n
WHERE CAST(vec_id AS VARCHAR) NOT IN (SELECT node FROM comp WHERE root <> node)"""


def inverted_index_sql(min_df: int, max_df: int) -> str:
    """``inverted_index`` restatement: same lowercase whitespace tokens,
    (doc_id, term) term frequencies, doc_id-ordered posting-list string,
    df bounds via HAVING."""
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS term FROM w),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term)
SELECT term,
  CAST(COUNT(*) AS BIGINT) AS df,
  CAST(SUM(tf) AS BIGINT) AS total_tf,
  array_to_string(
    list(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
         ORDER BY doc_id), ',') AS postings
FROM tf
GROUP BY term
HAVING COUNT(*) >= {min_df} AND COUNT(*) <= {max_df}"""


def dup_ngrams_sql(n: int) -> str:
    """``dup_ngrams`` restatement: same distinct (doc_id, 52-bit md5-prefix
    gram hash) grain, gram document frequencies, per-doc dup counts."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents),
g AS (
  SELECT DISTINCT doc_id,
    CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + {n - 1}), ' ')), 1, 13))
         AS BIGINT) AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {n - 2})) AS i
        FROM toks WHERE len(t) >= {n})),
d AS (SELECT gram, COUNT(*) AS gdf FROM g GROUP BY gram)
SELECT g.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(COUNT(*) FILTER (WHERE d.gdf >= 2) AS BIGINT) AS n_dup_grams
FROM g JOIN d USING (gram)
GROUP BY g.doc_id"""


def dup_run_stats_sql(n: int) -> str:
    """``dup_run_stats`` restatement: cross-document (>= 2 distinct
    docs) gram occurrences cover [pos, pos+n); gaps-and-islands run
    merge; per-doc run count / longest / covered totals."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
    CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + {n - 1}), ' ')), 1, 13))
         AS BIGINT) AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {n - 2})) AS i
        FROM toks WHERE len(t) >= {n})),
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM occ GROUP BY gram),
cov AS (
  SELECT DISTINCT o.doc_id, o.pos + u.o AS cpos
  FROM occ o JOIN gd USING (gram),
       (SELECT unnest(range(0, {n})) AS o) u
  WHERE gd.nd >= 2),
isl AS (
  SELECT doc_id, cpos,
    cpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cpos) AS grp
  FROM cov),
runs AS (SELECT doc_id, grp, COUNT(*) AS rl FROM isl GROUP BY doc_id, grp),
agg AS (
  SELECT doc_id, COUNT(*) AS n_runs, MAX(rl) AS longest_run,
         SUM(rl) AS covered_tokens
  FROM runs GROUP BY doc_id)
SELECT d.doc_id,
  CAST(COALESCE(len(tk.t), 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(a.n_runs, 0) AS BIGINT) AS n_runs,
  CAST(COALESCE(a.longest_run, 0) AS BIGINT) AS longest_run,
  CAST(COALESCE(a.covered_tokens, 0) AS BIGINT) AS covered_tokens
FROM documents d
LEFT JOIN toks tk ON tk.doc_id = d.doc_id
LEFT JOIN agg a ON a.doc_id = d.doc_id"""


def dedup_substrings_sql(n: int, min_len: int | None = None) -> str:
    """``dedup_substrings`` restatement: same raw ``\\S+`` tokens and
    52-bit md5-prefix gram hashes as ``dup_ngrams``; every gram
    occurrence beyond the corpus-wide first (ROW_NUMBER over
    ``(doc_id, pos)``) covers positions ``[pos, pos+n)``; covered
    positions merge into maximal runs via gaps-and-islands
    (``cpos - ROW_NUMBER``) and only runs of >= ``min_len`` tokens are
    removed; surviving tokens re-join position-ordered."""
    run_filter = ""
    if min_len is not None and min_len > n:
        run_filter = f""",
isl AS (
  SELECT doc_id, cpos,
    cpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cpos) AS grp
  FROM cov),
cov2 AS (
  SELECT doc_id, cpos FROM (
    SELECT doc_id, cpos,
      COUNT(*) OVER (PARTITION BY doc_id, grp) AS rl
    FROM isl)
  WHERE rl >= {min_len})"""
    cov_final = "cov2" if run_filter else "cov"
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents),
occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
    CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + {n - 1}), ' ')), 1, 13))
         AS BIGINT) AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - {n - 2})) AS i
        FROM toks WHERE len(t) >= {n})),
r AS (
  SELECT doc_id, pos,
    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM occ),
cov AS (
  SELECT DISTINCT r.doc_id, r.pos + u.o AS cpos
  FROM r, (SELECT unnest(range(0, {n})) AS o) u WHERE r.rn > 1){run_filter},
tk AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS tok
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
kept AS (
  SELECT tk.doc_id, tk.pos, tk.tok FROM tk
  LEFT JOIN {cov_final} cv ON tk.doc_id = cv.doc_id AND tk.pos = cv.cpos
  WHERE cv.doc_id IS NULL)
SELECT d.doc_id,
  COALESCE(s.clean_text, '') AS clean_text,
  CAST(COALESCE(nt.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(nt.n_tokens, 0) - COALESCE(s.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d
LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                  COUNT(*) AS n_kept
           FROM kept GROUP BY doc_id) s ON d.doc_id = s.doc_id
LEFT JOIN (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks) nt
  ON d.doc_id = nt.doc_id"""


#: the BPE pretokenizer regex as a DuckDB literal (single quote doubled).
_BPE_RE_SQL = (
    "''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"
)


def bpe_encode_sql(fixture_root: str) -> str:
    """``text_bpe_encode`` restatement: DuckDB re-extracts the GPT-2
    pretokens and joins the SCALAR-REFERENCE encode of every distinct
    corpus pretoken (``fixtures.build_bpe_vocab`` -- an independent
    row-at-a-time trainer + encoder).  An inner join makes a pretoken
    the two tokenizers disagree on surface as a row/value mismatch
    instead of silently zeroing."""
    return f"""
WITH pt AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS word
  FROM documents),
v AS (SELECT * FROM read_parquet('{fixture_root}/bpe_vocab.parquet')),
j AS (SELECT pt.doc_id, v.n_tokens, v.sum_ids FROM pt JOIN v USING (word))
SELECT d.doc_id,
  CAST(COALESCE(p.n_pre, 0) AS BIGINT) AS n_pretokens,
  CAST(COALESCE(a.nt, 0) AS BIGINT) AS n_tokens,
  CAST(COALESCE(a.si, 0) AS BIGINT) AS sum_ids
FROM documents d
LEFT JOIN (SELECT doc_id, COUNT(*) AS n_pre FROM pt GROUP BY 1) p
  ON d.doc_id = p.doc_id
LEFT JOIN (SELECT doc_id, SUM(n_tokens) AS nt, SUM(sum_ids) AS si
           FROM j GROUP BY 1) a
  ON d.doc_id = a.doc_id"""


def chunk_bpe_counts_sql(fixture_root: str, window: int, stride: int) -> str:
    """``chunk_bpe_counts``: the chunk_documents window reconstruction,
    GPT-2 pretokens of each chunk text, scalar-reference vocab join."""
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
c AS (SELECT doc_id, w, len(w) AS n,
             CASE WHEN len(w) = 0 THEN 0
                  WHEN len(w) <= {window} THEN 1
                  ELSE 1 + (len(w) - {window} + {stride - 1}) // {stride} END AS n_chunks
      FROM w),
e AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c),
ch AS (
  SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         CAST(least(n - chunk_idx * {stride}, {window}) AS BIGINT) AS n_tokens_ws,
         array_to_string(w[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}], ' ') AS chunk_text
  FROM e),
pt AS (
  SELECT doc_id, chunk_idx,
         unnest(regexp_extract_all(chunk_text, '{_BPE_RE_SQL}')) AS word
  FROM ch),
v AS (SELECT * FROM read_parquet('{fixture_root}/bpe_vocab.parquet')),
a AS (
  SELECT pt.doc_id, pt.chunk_idx,
         SUM(v.n_tokens) AS nt, SUM(v.sum_ids) AS si
  FROM pt JOIN v USING (word) GROUP BY 1, 2)
SELECT ch.doc_id, ch.chunk_idx, ch.n_tokens_ws,
  CAST(COALESCE(a.nt, 0) AS BIGINT) AS n_bpe_tokens,
  CAST(COALESCE(a.si, 0) AS BIGINT) AS sum_ids
FROM ch LEFT JOIN a ON a.doc_id = ch.doc_id AND a.chunk_idx = ch.chunk_idx"""


def pack_sequences_bpe_sql(fixture_root: str, budget: int) -> str:
    """``pack_sequences_bpe`` restatement: per-doc REAL BPE token counts
    (the scalar-reference vocab join above) fed through the same
    doc_id-ordered window cumsum as ``pack_sequences``."""
    return f"""
WITH pt AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS word
  FROM documents),
v AS (SELECT * FROM read_parquet('{fixture_root}/bpe_vocab.parquet')),
c AS (
  SELECT d.doc_id,
    CAST(COALESCE(SUM(v.n_tokens), 0) AS BIGINT) AS n_tokens
  FROM documents d
  LEFT JOIN pt ON d.doc_id = pt.doc_id
  LEFT JOIN v ON pt.word = v.word
  GROUP BY d.doc_id)
SELECT doc_id, n_tokens,
  (SUM(n_tokens) OVER (ORDER BY doc_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
    // {budget} AS shard
FROM c"""


def distinct_hll_sql(p: int, alpha_e6: int) -> str:
    """``rel_distinct_hll``: the HLL registers and raw estimator replayed
    exactly -- engine-standard 64-bit md5 hash, top-``p``-bit register,
    rho via ``bin()`` length (string bit-length: exact, unlike a float
    log2), the dyadic harmonic sum as HUGEINT, the frozen e6 alpha, two
    floor divisions."""
    m = 1 << p
    width = 64 - p
    scale = width + 1
    return f"""
WITH h AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 16))
         AS UBIGINT) AS h
  FROM orders),
r AS (
  SELECT CAST(h >> {width} AS BIGINT) AS reg,
    CASE WHEN (h & CAST((1::BIGINT << {width}) - 1 AS UBIGINT)) = 0
         THEN {scale}
         ELSE {width}
              - length(bin(CAST(h & CAST((1::BIGINT << {width}) - 1 AS UBIGINT)
                                AS BIGINT))) + 1
    END AS rho
  FROM h),
rm AS (SELECT reg, MAX(rho) AS rho FROM r GROUP BY reg),
agg AS (
  SELECT COUNT(*) AS n_regs, MAX(rho) AS max_rho,
         SUM(CAST(1::BIGINT << ({scale} - rho) AS HUGEINT)) AS s_present
  FROM rm)
SELECT CAST({m} AS BIGINT) AS m,
  CAST({m} - n_regs AS BIGINT) AS zeros,
  CAST(max_rho AS BIGINT) AS max_rho,
  CAST(CAST({alpha_e6} AS HUGEINT) * {m} * {m}
         * CAST(1::BIGINT << {scale} AS HUGEINT)
       // (s_present + CAST({m} - n_regs AS HUGEINT)
                        * CAST(1::BIGINT << {scale} AS HUGEINT))
       // 1000000 AS BIGINT) AS estimate
FROM agg"""


def alt_format_stats_sql(reader_expr: str) -> str:
    """``docs_jsonl_stats`` / ``docs_csv_stats``: per-doc character and
    whitespace-token counts over DuckDB's own reader for the alternate
    serialization -- a reader-vs-reader comparison with Ray Data."""
    return f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, COALESCE(text, '') AS text FROM {reader_expr})"""


def dedup_segments_sql(seg_w: int) -> str:
    """``dedup_segments`` restatement: same lowercase ``\\S+`` tokens, the
    same non-overlapping ``seg_w``-token segments keyed by the 52-bit md5
    prefix of the joined segment text, global first occurrence (min
    ``(doc_id, seg_idx)``) kept via ROW_NUMBER, per-doc survival counts."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
  WHERE len(regexp_extract_all(lower(text), '\\S+')) >= 1),
segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
    CAST(concat('0x', substr(md5(array_to_string(
      list_slice(t, i * {seg_w} + 1, i * {seg_w} + {seg_w}), ' ')), 1, 13))
      AS BIGINT) AS seg,
    CAST(least({seg_w}, len(t) - i * {seg_w}) AS BIGINT) AS n_tok
  FROM (SELECT doc_id, t,
          unnest(range(0, (len(t) + {seg_w - 1}) // {seg_w})) AS i
        FROM toks)),
r AS (
  SELECT doc_id, n_tok,
    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_segs,
  CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
  CAST(COALESCE(SUM(n_tok) FILTER (WHERE rn = 1), 0) AS BIGINT) AS n_tokens_kept
FROM r GROUP BY doc_id"""


def sample_weighted_sql(k: int) -> str:
    """``sample_weighted`` restatement: same md5-prefix uniform, same
    IEEE-only priority formula, plain ORDER BY LIMIT."""
    return f"""
SELECT doc_id, n_chars,
       (n_chars * 4503599627370496.0)
       / (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
          + 1.0) AS priority
FROM documents
ORDER BY priority DESC, doc_id ASC
LIMIT {k}"""


FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""


#: ``rel_q13_custdist`` (TPC-H Q13 shape): orders-per-customer histogram
#: including zero-order customers, plain LEFT JOIN double aggregation.
Q13_CUSTDIST_SQL = """
WITH c AS (
  SELECT cu.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer cu LEFT JOIN orders o ON o.o_custkey = cu.c_custkey
  GROUP BY cu.c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""


def q19_discounted_sql(terms) -> str:
    """``rel_q19_discounted`` restatement (TPC-H Q19 shape): the same
    OR-of-conjunctions over brand/size/quantity, exact integer revenue."""
    ors = "\n   OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in terms
    )
    return f"""
SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
       AS BIGINT) AS revenue_e4,
       CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
       AS BIGINT) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {ors}"""


def q14_promo_sql(start: str, end: str) -> str:
    """``rel_q14_promo`` restatement (TPC-H Q14 shape): exact integer
    promo/total revenue for the ship-month and the integer-ppm share."""
    return f"""
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
         CAST(p.p_type = 'PROMO' AS BIGINT) AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{start}'
    AND l.l_shipdate <  TIMESTAMP '{end}')
SELECT CAST(COALESCE(SUM(rev_e4 * is_promo), 0) AS BIGINT) AS promo_rev_e4,
       CAST(COALESCE(SUM(rev_e4), 0) AS BIGINT) AS total_rev_e4,
       CAST(CASE WHEN COALESCE(SUM(rev_e4), 0) = 0 THEN 0
                 ELSE SUM(rev_e4 * is_promo) * 1000000 // SUM(rev_e4)
            END AS BIGINT) AS promo_ppm
FROM j"""


def q7_nation_volume_sql(na: str, nb: str, start: str, end: str) -> str:
    """``rel_q7_nation_volume`` restatement (TPC-H Q7 shape): the 5-way
    join with the two cross directions, exact cent x basis-point
    revenue, grouped by direction and ship year."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{start}' AND l.l_shipdate < TIMESTAMP '{end}'
  AND ((n1.n_name = '{na}' AND n2.n_name = '{nb}')
    OR (n1.n_name = '{nb}' AND n2.n_name = '{na}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def q3_shipping_sql(segment: str, cutoff: str) -> str:
    """``rel_q3_shipping`` restatement (TPC-H Q3 shape): plain 3-way join
    + group + ORDER BY LIMIT 10, exact cent x basis-point revenue."""
    return f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = '{segment}'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{cutoff}'
  AND l_shipdate  > TIMESTAMP '{cutoff}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10"""


def q5_local_volume_sql(region: str, start: str, end: str) -> str:
    """``rel_q5_local_volume`` restatement (TPC-H Q5 shape): the plain
    6-table star join with the same exact cent x basis-point revenue."""
    return f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate <  TIMESTAMP '{end}'
GROUP BY n_name
ORDER BY revenue DESC"""


def range_layout_sql(lo_c: int, hi_c: int) -> str:
    """``rel_range_layout`` restatement: the pruned-directory read must
    equal the plain full-scan filter (pruning completeness IS the
    claim).  Exact cent arithmetic on both sides."""
    return f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM lineitem
WHERE CAST(round(l_extendedprice * 100) AS BIGINT) BETWEEN {lo_c} AND {hi_c}
GROUP BY l_returnflag"""


RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch(ts) AS BIGINT) // (7 * 86400) AS week
  FROM events),
r AS (
  SELECT a.week,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(count(b.user_id) AS BIGINT) AS n_retained
  FROM uw a
  LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week + 1
  GROUP BY a.week)
SELECT week, n_active, n_retained FROM r"""


QUANTILES_CONT_SQL = """
WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS rn FROM s),
n AS (SELECT count(*) AS n FROM s),
qs(q) AS (VALUES (0.25), (0.50), (0.75), (0.90)),
pos AS (SELECT q, q * (n - 1) AS p,
               CAST(floor(q * (n - 1)) AS BIGINT) AS lo,
               CAST(ceil(q * (n - 1)) AS BIGINT) AS hi
        FROM qs, n)
SELECT pos.q AS q, (a.v + (b.v - a.v) * (pos.p - pos.lo)) / 100.0 AS price
FROM pos JOIN o a ON a.rn = pos.lo JOIN o b ON b.rn = pos.hi"""


def entity_resolution_sql(max_dist: int) -> str:
    """``rel_entity_resolution`` restatement: fuzzy pair edges -> reach
    closure -> min-name component -> rewrite, all in one recursive CTE
    (the kg canonicalization oracle's shape over levenshtein edges)."""
    return f"""
WITH RECURSIVE
nm AS (SELECT DISTINCT p_name FROM part),
e AS MATERIALIZED (
  SELECT a.p_name AS u, b.p_name AS v
  FROM nm a JOIN nm b ON a.p_name < b.p_name
  WHERE abs(length(a.p_name) - length(b.p_name)) <= {max_dist}
    AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {max_dist}),
nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
reach(a, b) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON s.u = r.b),
comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a)
SELECT p.p_partkey, p.p_name,
       coalesce(c.component, p.p_name) AS canonical_name
FROM part p LEFT JOIN comp c ON c.node = p.p_name"""


def grid_layout_sql(lo_c: int, hi_c: int, lo_day: int, hi_day: int) -> str:
    """``rel_grid_layout`` restatement: the 2-D-pruned cell read must
    equal the plain full-scan rectangle filter."""
    return f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM lineitem
WHERE CAST(round(l_extendedprice * 100) AS BIGINT) BETWEEN {lo_c} AND {hi_c}
  AND CAST(epoch(l_shipdate) AS BIGINT) // 86400 BETWEEN {lo_day} AND {hi_day}
GROUP BY l_returnflag"""


def fuzzy_join_sql(max_dist: int) -> str:
    """``rel_fuzzy_join`` restatement: the blocked+verified plan must
    equal the plain O(n^2) distinct-name cross join with DuckDB's
    levenshtein -- completeness of the deletion-neighborhood blocking IS
    the claim."""
    return f"""
WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS cnt FROM part GROUP BY 1)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS d,
       a.cnt AS n_a, b.cnt AS n_b
FROM n a JOIN n b ON a.p_name < b.p_name
WHERE abs(length(a.p_name) - length(b.p_name)) <= {max_dist}
  AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {max_dist}"""


def quality_top_pct_sql(pct: int) -> str:
    """``quality_top_pct`` restatement: the engine's histogram-refinement
    selection must equal a plain ``(quality DESC, doc_id ASC)`` rank
    cutoff at ``ceil(total * pct / 100)`` over the text_quality scores."""
    return f"""
WITH q AS ({TESTDATA_SQL['text_quality']}),
r AS (SELECT doc_id, quality,
        ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id ASC) AS rk,
        COUNT(*) OVER () AS total
      FROM q)
SELECT doc_id, quality FROM r WHERE rk <= (total * {pct} + 99) // 100"""


def corpus_report_sql() -> str:
    """``corpus_report``: the three per-doc signal statements composed as
    CTEs, grouped on (source, predicted language)."""
    return f"""
WITH q AS ({TESTDATA_SQL['text_quality']}),
l AS ({TESTDATA_SQL['lang_id']}),
k AS ({TESTDATA_SQL['text_classify']}),
st AS (SELECT doc_id, source,
              CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
       FROM documents)
SELECT st.source, l.lang_pred,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(q.quality) AS BIGINT) AS sum_quality,
  CAST(SUM(k.keep) AS BIGINT) AS n_keep,
  CAST(SUM(st.n_tokens) AS BIGINT) AS sum_tokens
FROM st
JOIN q ON q.doc_id = st.doc_id
JOIN l ON l.doc_id = st.doc_id
JOIN k ON k.doc_id = st.doc_id
GROUP BY 1, 2"""


def quality_top_pct_by_source_sql(pct: int) -> str:
    """``quality_top_pct_by_source``: the same ceil-rank cutoff applied
    PER source partition."""
    return f"""
WITH q AS ({TESTDATA_SQL['text_quality']}),
r AS (SELECT q.doc_id, d.source, q.quality,
        ROW_NUMBER() OVER (PARTITION BY d.source
                           ORDER BY q.quality DESC, q.doc_id ASC) AS rk,
        COUNT(*) OVER (PARTITION BY d.source) AS total
      FROM q JOIN documents d ON d.doc_id = q.doc_id)
SELECT doc_id, source, quality FROM r
WHERE rk <= (total * {pct} + 99) // 100"""


def winnow_dup_pairs_sql(min_shared: int, max_fp_df: int) -> str:
    """``winnow_dup_pairs`` restatement on top of the text_winnow CTE
    chain: fp groups bounded by the same df cap, pair counts via
    self-join, HAVING the shared-fingerprint threshold."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
sh AS (
  SELECT doc_id, i,
    CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + 2), ' ')), 1, 13))
         AS BIGINT) AS h
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3)),
wins AS (
  SELECT doc_id,
    min(h) OVER win AS fp,
    count(*) OVER win AS cnt
  FROM sh
  WINDOW win AS (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE cnt = 4),
eligible AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING COUNT(*) BETWEEN 2 AND {max_fp_df})
SELECT f1.doc_id AS a, f2.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps f1 JOIN fps f2 USING (fp) JOIN eligible USING (fp)
WHERE f1.doc_id < f2.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}"""


def tfidf_topk_sql(k: int, scale: int) -> str:
    """``tfidf_topk`` restatement: same fixed-point tf/df score via BIGINT
    floor division (``//``), rank by (score DESC, term ASC)."""
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS term FROM w),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id, tf.term, tf.tf, d.df,
             tf.tf * {scale} // d.df AS score
      FROM tf JOIN d USING (term)),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}"""


def pii_scrub_sql(fixture_root: str) -> str:
    """``pii_scrub`` restatement: counts on the original text, then
    nested global regexp_replace in the engine's email -> ip -> phone
    order.  The patterns are shared VERBATIM from stages/textops.py --
    both engines (Python re, DuckDB RE2) implement leftmost-first
    matching for these alternation-free patterns."""
    from ontology_time_machine_ray.stages.textops import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )

    return f"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t
  FROM read_parquet('{fixture_root}/documents_pii.parquet'))
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
      '{PII_IP_RE}', '<IP>', 'g'),
      '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(t, '{PII_IP_RE}')) AS BIGINT) AS n_ips
FROM d"""


def config_grid_sql(fixture_root: str) -> str:
    """Independent SQL restatement of the full configuration-grid sweep
    (reference tests/test_integration.py:140-172): the 4x3x2x4 config grid
    crossed with a per-Accept-header corpus histogram, the patch policy
    (utils.py:60-100) as an explicit CASE over hand-derived facts about
    the 8 corpus Accept headers (mime count, sole-*/*, configured-mime
    membership, unpatched resolution per utils.py:103-157)."""
    body = f"""WITH acc AS (
    SELECT coalesce(accept, '<null>') AS accept, COUNT(*) AS n
    FROM read_parquet('__ROOT__/documents_interleaved.parquet')
    GROUP BY 1
  ),
  traits AS (
    SELECT accept, n,
      CASE WHEN accept = '<null>' THEN 0
           WHEN accept IN ('text/turtle', '*/*', 'application/json') THEN 1
           WHEN accept IN ('{A_NT}', '{A_OWL2}') THEN 2
           WHEN accept = '{A_OWL1}' THEN 3
           WHEN accept = '{A_HTML}' THEN 5 END AS n_mimes,
      (accept = '*/*') AS sole_star,
      CASE WHEN accept = 'text/turtle' THEN 'ttl'
           WHEN accept = '{A_OWL1}' THEN 'owl'
           WHEN accept = '{A_NT}' THEN 'nt'
           WHEN accept = '{A_OWL2}' THEN 'owl'
           ELSE NULL END AS orig_fmt,
      (accept IN ('text/turtle', '{A_OWL1}')) AS has_ttl_mime,
      (accept IN ('{A_NT}', '{A_OWL2}')) AS has_nt_mime,
      (accept = '{A_OWL1}') AS has_owl_mime,
      (accept = '{A_HTML}') AS has_html_mime
    FROM acc
  ),
  grid AS (
    SELECT f.onto_format, f.cfg_fmt, p.onto_precedence,
           u.patch_accept_upstream, v.onto_version
    FROM (VALUES ('turtle', 'ttl'), ('ntriples', 'nt'),
                 ('rdfxml', 'owl'), ('htmldocu', NULL))
         AS f(onto_format, cfg_fmt)
    CROSS JOIN (VALUES ('default'), ('enforcedPriority'), ('always'))
         AS p(onto_precedence)
    CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))
         AS u(patch_accept_upstream)
    CROSS JOIN (VALUES ('original'), ('originalFailoverLiveLatest'),
                       ('latestArchived'), ('timestampArchived'))
         AS v(onto_version)
  ),
  decided AS (
    SELECT g.*, t.n, t.orig_fmt,
      CASE
        WHEN g.onto_version = 'original' AND g.patch_accept_upstream = 0
          THEN 0
        WHEN (t.n_mimes = 0 OR (t.n_mimes = 1 AND t.sole_star))
             AND g.onto_precedence IN ('default', 'enforcedPriority')
          THEN 1
        WHEN t.n_mimes > 1 AND g.onto_precedence = 'enforcedPriority' AND
             ((g.onto_format = 'turtle' AND t.has_ttl_mime) OR
              (g.onto_format = 'ntriples' AND t.has_nt_mime) OR
              (g.onto_format = 'rdfxml' AND t.has_owl_mime) OR
              (g.onto_format = 'htmldocu' AND t.has_html_mime))
          THEN 1
        WHEN g.onto_precedence = 'always' THEN 1
        ELSE 0 END AS patched
    FROM grid g CROSS JOIN traits t
  )
SELECT onto_format, onto_precedence, patch_accept_upstream, onto_version,
  CASE WHEN patched = 1 THEN cfg_fmt ELSE orig_fmt END AS resolved_format,
  CAST(SUM(n) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN patched = 1 THEN n ELSE 0 END) AS BIGINT) AS n_patched
FROM decided
GROUP BY 1, 2, 3, 4, 5"""
    return body.replace("__ROOT__", fixture_root)


def client_intercept_sql(fixture_root: str) -> str:
    """Composition oracle: the parsed per-client config (client_config_sql)
    cross-joined with the corpus's distinct hosts, interception decided by
    host-level index membership per the client's httpsInterception mode."""
    body = f"""WITH {_MENTIONS_CTES},
  hosts AS (SELECT DISTINCT host FROM hp),
  clients AS ({client_config_sql(fixture_root)})
SELECT c.client_id, h.host,
  CAST(CASE WHEN c.https_interception = 'all' THEN 1
            WHEN c.https_interception = 'archivo' THEN
              CASE WHEN EXISTS (SELECT 1 FROM idx i WHERE i.host = h.host)
                   THEN 1 ELSE 0 END
            ELSE 0 END AS BIGINT) AS intercept
FROM clients c CROSS JOIN hosts h
WHERE c.parse_ok = 1"""
    return body.replace("__ROOT__", fixture_root)


def semantic_dedup_sql(
    fixture_root: str,
    n_clusters: int = 16,
    iters: int = 3,
    tau_e6: int = 950_000,
) -> str:
    """Exact restatement of ``stages/similarity.semantic_dedup``: the same
    unrolled-Lloyd cluster assignment (over the augmented embeddings
    fixture), then a within-cluster self-join dropping every vector with a
    lower-id same-cluster neighbour at round(cos * 1e6) >= tau."""
    src = f"read_parquet('{fixture_root}/embeddings_aug.parquet')"
    return (
        "WITH "
        + _kmeans_ctes(n_clusters, iters, source=src)
        + ",\n"
        + _final_assign_cte(iters)
        + f""",
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {src}),
drops AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
  WHERE CAST(round(list_cosine_similarity(va.e, vb.e) * 1e6) AS BIGINT)
        >= {tau_e6})
SELECT vec_id FROM v WHERE vec_id NOT IN (SELECT vec_id FROM drops)"""
    )


def bm25_topk_sql(query_terms: tuple[str, ...], k: int, scale: int) -> str:
    """``bm25_topk`` restatement: the same log-free rational BM25
    (k1=6/5, b=3/4, idf surrogate (N-df+1)/(df+1)) as ONE BIGINT floor
    division per (doc, term), summed per doc, ranked (score DESC, doc_id
    ASC).  N / TOT / dl are BIGINT counts, so avgdl never rounds."""
    terms = ", ".join("'" + t + "'" for t in query_terms)
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\S+') AS t
  FROM documents),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM w),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS tot FROM dl),
tok AS (SELECT doc_id, unnest(t) AS term FROM w),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term),
d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
s AS (SELECT tf.doc_id,
             CAST(SUM(({scale} * (g.n - d.df + 1) * 22 * tf.tf * g.tot)
                  // ((d.df + 1) * (10 * g.tot * tf.tf + 3 * g.tot
                                    + 9 * dl.dl * g.n))) AS BIGINT) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM tf JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN g
      GROUP BY tf.doc_id),
r AS (SELECT doc_id, score, n_hits,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM s)
SELECT doc_id, score, n_hits, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}"""


def kg_communities_sql(fixture_root: str, rounds: int = 2) -> str:
    """``kg_communities`` restatement: the same fixed-round synchronous
    majority-vote label propagation unrolled one CTE level per round --
    per round, per-endpoint neighbour-label counts and a (n DESC, label
    ASC) row_number argmax.  Nodes exist only as edge endpoints, so every
    node has a neighbour vote."""
    ctes = [
        f"""mo AS (SELECT DISTINCT doc_id, ontology_id FROM mentions
       WHERE ontology_id IS NOT NULL),
e AS (SELECT DISTINCT a.ontology_id AS a, b.ontology_id AS b
      FROM mo a JOIN mo b ON a.doc_id = b.doc_id
       AND a.ontology_id < b.ontology_id),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""c{r} AS (SELECT u.a, l.label, COUNT(*) AS n
       FROM und u JOIN l{r - 1} l ON l.node = u.b GROUP BY u.a, l.label),
l{r} AS (SELECT a AS node, label FROM (
         SELECT a, label,
                row_number() OVER (PARTITION BY a ORDER BY n DESC, label) AS rk
         FROM c{r}) WHERE rk = 1)"""
        )
    return (
        f"WITH {_MENTIONS_CTES},\n"
        + ",\n".join(ctes)
        + f"\nSELECT node AS ontology_id, label AS community FROM l{rounds}"
    ).replace("__ROOT__", fixture_root)


def quality_dedup_keep_sql() -> str:
    """``dedup_quality_keep`` restatement: the dedup_minhash and
    text_quality statements joined on doc_id, one row_number argmax per
    cluster (quality DESC, doc_id ASC)."""
    return f"""
WITH mh AS ({_minhash_sql()}),
q AS ({TESTDATA_SQL['text_quality']}),
j AS (SELECT mh.doc_id, mh.cluster, q.quality
      FROM mh JOIN q USING (doc_id)),
r AS (SELECT doc_id, cluster, quality,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY quality DESC, doc_id) AS rk
      FROM j)
SELECT doc_id, cluster, quality FROM r WHERE rk = 1"""


def kg_timeline_sql(fixture_root: str, timestamps: tuple) -> str:
    """``kg_timeline`` restatement: the kg_triples statement instantiated
    once per sweep coordinate, distinct logical (subj, pred, obj) sets,
    per-coordinate count plus EXCEPT-counts vs the previous coordinate
    (the first coordinate diffs against the empty store)."""
    ctes = []
    for i, ts in enumerate(timestamps):
        stmt = kg_sql("kg_triples", fixture_root, ts)
        ctes.append(f"t{i} AS (SELECT DISTINCT subj, pred, obj FROM ({stmt}))")
    selects = []
    for i, ts in enumerate(timestamps):
        if i == 0:
            added = f"(SELECT COUNT(*) FROM t0)"
            removed = "0"
        else:
            added = (
                f"(SELECT COUNT(*) FROM (SELECT * FROM t{i} EXCEPT "
                f"SELECT * FROM t{i - 1}))"
            )
            removed = (
                f"(SELECT COUNT(*) FROM (SELECT * FROM t{i - 1} EXCEPT "
                f"SELECT * FROM t{i}))"
            )
        selects.append(
            f"SELECT '{ts}' AS ts, CAST((SELECT COUNT(*) FROM t{i}) AS BIGINT) AS n_triples, "
            f"CAST({added} AS BIGINT) AS n_added, CAST({removed} AS BIGINT) AS n_removed"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def kg_kcore_sql(fixture_root: str, k: int, rounds: int) -> str:
    """``kg_kcore`` restatement: the iterative peel unrolled one level
    per round (the label-propagation precedent).  The engine may stop
    early at a fixpoint; peeling is monotone, so the fixpoint equals the
    fully-unrolled result -- the equality IS that claim."""
    ctes = [
        "mo AS (SELECT DISTINCT doc_id, ontology_id FROM mentions "
        "WHERE ontology_id IS NOT NULL)",
        "e AS (SELECT DISTINCT a.ontology_id AS a, b.ontology_id AS b\n"
        "      FROM mo a JOIN mo b ON a.doc_id = b.doc_id "
        "AND a.ontology_id < b.ontology_id)",
        "e0 AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"d{i} AS (SELECT a AS node, count(*) AS deg FROM e{i - 1} GROUP BY 1)"
        )
        ctes.append(f"s{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT p.a, p.b FROM e{i - 1} p\n"
            f"      JOIN s{i} x ON x.node = p.a JOIN s{i} y ON y.node = p.b)"
        )
    body = ",\n".join(ctes)
    return (
        f"WITH {_MENTIONS_CTES},\n{body}\n"
        f"SELECT a AS ontology_id, CAST(count(*) AS BIGINT) AS degree\n"
        f"FROM e{rounds} GROUP BY 1 HAVING count(*) >= {k}"
    ).replace("__ROOT__", fixture_root)


def media_phash_sql(fixture_root: str) -> str:
    """``media_phash`` oracle: replay the asset generator's pixel
    formulas (ppm byte p = (i+p)%256) through the SAME integer aHash
    math -- 8x8 nearest-neighbor thumbnail, integer grayscale, strict
    mean threshold, 64 bits packed as two uint32 halves -- then window
    the cluster representative / size per hash."""
    return f"""
WITH a AS (
  SELECT media_ref, CAST(regexp_extract(media_ref, '([0-9]+)', 1) AS BIGINT) AS i
  FROM read_parquet('{fixture_root}/media_assets.parquet')),
p AS (
  SELECT media_ref, i, 4 + (i % 13) AS w, 3 + ((i * 7) % 11) AS h
  FROM a WHERE i % 2 = 0 AND i % 17 <> 0),
cells AS (
  SELECT media_ref, i, ty, tx,
         (((ty * h) // 8) * w + ((tx * w) // 8)) * 3 AS o
  FROM p
  CROSS JOIN (SELECT unnest(range(8)) AS ty)
  CROSS JOIN (SELECT unnest(range(8)) AS tx)),
g AS (
  SELECT media_ref, ty, tx,
         (((i + o) % 256) + ((i + o + 1) % 256) + ((i + o + 2) % 256)) // 3 AS gray
  FROM cells),
m AS (SELECT media_ref, SUM(gray) // 64 AS mean FROM g GROUP BY 1),
hs AS (
  SELECT g.media_ref,
    CAST(SUM(CASE WHEN gray > mean AND ty * 8 + tx >= 32
             THEN 1::BIGINT << (ty * 8 + tx - 32) ELSE 0 END) AS BIGINT) AS ahash_hi,
    CAST(SUM(CASE WHEN gray > mean AND ty * 8 + tx < 32
             THEN 1::BIGINT << (ty * 8 + tx) ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM g JOIN m USING (media_ref) GROUP BY 1)
SELECT media_ref, ahash_hi, ahash_lo,
       min(media_ref) OVER (PARTITION BY ahash_hi, ahash_lo) AS cluster_rep,
       CAST(count(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT) AS cluster_size
FROM hs"""


def pca_power_sql(
    dim: int, iters: int = 3, scale: int = 1_000_000, target: int = 1000
) -> str:
    """``embed_pca_power`` restatement: quantize floor(x*scale + 0.5),
    second-moment matrix as an exploded self-join, then one CTE pair per
    power iteration (matvec + truncating renormalize -- DuckDB's ``//``
    truncates toward zero, which the engine's _trunc_div mirrors)."""
    parts = [
        f"""x AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS j,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale} + 0.5) AS BIGINT) AS q
  FROM embeddings),
c AS MATERIALIZED (
  SELECT a.j, b.j AS k, CAST(SUM(a.q * b.q) AS BIGINT) AS c
  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
v0 AS (SELECT j, 1::BIGINT AS v FROM range({dim}) t(j))"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS (SELECT c.j, CAST(SUM(c.c * v.v) AS BIGINT) AS w
  FROM c JOIN v{t - 1} v ON v.j = c.k GROUP BY 1),
d{t} AS (SELECT greatest(max(abs(w)) // {target}, 1) AS dv FROM w{t}),
v{t} AS (SELECT j, w // dv AS v FROM w{t}, d{t})"""
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT j, CAST(v AS BIGINT) AS v FROM v{iters}"


def corpus_curate_sql() -> str:
    """``corpus_curate`` restatement: the quality_dedup_keep statement
    inner-joined to the classifier's accepted docs, quality floor
    applied last."""
    return f"""
WITH keepers AS ({quality_dedup_keep_sql()}),
clf AS ({_classifier_sql()})
SELECT k.doc_id, k.cluster, k.quality, clf.clf_score
FROM keepers k
JOIN clf ON clf.doc_id = k.doc_id AND clf.keep = 1
WHERE k.quality >= 2"""


def embed_outliers_sql(
    n_clusters: int = 16, iters: int = 3, tau_e6: int = 250_000
) -> str:
    """``embed_outliers`` restatement: the unrolled-Lloyd CTEs, each
    vector's best (cos DESC, cluster ASC) centroid WITH its score, the
    same round(cos*1e6) threshold."""
    return (
        "WITH "
        + _kmeans_ctes(n_clusters, iters)
        + f""",
sc AS (
  SELECT v.vec_id, c.cluster, sum(v.x * c.x) AS cos
  FROM vn v JOIN c{iters} c ON c.j = v.j GROUP BY 1, 2),
best AS (
  SELECT vec_id, cluster, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cluster ASC) AS rn
  FROM sc)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       CAST(round(cos * 1e6) AS BIGINT) AS cos_e6
FROM best WHERE rn = 1 AND CAST(round(cos * 1e6) AS BIGINT) < {tau_e6}"""
    )
