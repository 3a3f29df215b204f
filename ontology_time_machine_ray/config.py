"""Run configuration: policy enums + pipeline config.

Reproduces the semantics of the reference's config plane
(``ontologytimemachine/utils/config.py:47-101``): the four-way version
policy, the format/precedence pair driving Accept-header patching, and the
time-machine ``timestamp`` coordinate.  Unlike the reference (module-global
config mutated per client connection, ``custom_proxy.py:30,88-89``), the
config here is an immutable value passed explicitly to every stage; per-row
overrides travel as ordinary columns (``policy``, ``accept``) on the input
table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class OntoFormat(str, Enum):
    """RDF serialization requested by the pipeline (config.py:47-52)."""

    TURTLE = "turtle"
    NTRIPLES = "ntriples"
    RDFXML = "rdfxml"
    HTMLDOCU = "htmldocu"


class OntoPrecedence(str, Enum):
    """How strongly the configured format overrides the row's Accept
    header (config.py:54-58)."""

    DEFAULT = "default"
    ENFORCED_PRIORITY = "enforcedPriority"
    ALWAYS = "always"


class OntoVersion(str, Enum):
    """Version-resolution policy (config.py:60-65)."""

    ORIGINAL = "original"
    ORIGINAL_FAILOVER_LIVE_LATEST = "originalFailoverLiveLatest"
    LATEST_ARCHIVED = "latestArchived"
    TIMESTAMP_ARCHIVED = "timestampArchived"


#: Canonical string values, used for the per-row ``policy`` column.
ALL_POLICIES = tuple(v.value for v in OntoVersion)


class HttpsInterception(str, Enum):
    """Kept for config parity (config.py:68-73); in a batch engine the only
    observable effect is the BLOCK policy dropping CONNECT-kind rows."""

    NONE = "none"
    ALL = "all"
    BLOCK = "block"
    ARCHIVO = "archivo"


@dataclass(frozen=True)
class OntoFormatConfig:
    """Mirror of the reference's ontoFormat sub-config (config.py:81-86)."""

    format: OntoFormat = OntoFormat.TURTLE
    precedence: OntoPrecedence = OntoPrecedence.DEFAULT
    patch_accept_upstream: bool = False


@dataclass(frozen=True)
class PipelineConfig:
    """Immutable run config handed to every stage.

    ``timestamp`` is the time-machine coordinate: the snapshot store
    resolves each ontology to the latest ``version_ts <= timestamp``
    (reference delegates this to the Archivo API via ``&v=``,
    proxy_logic.py:271; we own the resolution).  It must be an explicit
    input -- transforms never consult the wall clock (determinism).
    """

    onto_format: OntoFormatConfig = field(default_factory=OntoFormatConfig)
    onto_version: OntoVersion = OntoVersion.ORIGINAL_FAILOVER_LIVE_LATEST
    restricted_access: bool = False
    https_interception: HttpsInterception = HttpsInterception.ALL
    timestamp: str = "2021-06-01"
    #: honour a per-row ``policy`` column when present (the batch analog of
    #: per-client config via proxy auth, proxy_logic.py:65-86).
    per_row_policy: bool = True
    #: number of output partitions for the materialized triple store.
    output_partitions: int = 16
    #: salt fan-out used for skew-prone aggregations (hub entities).
    skew_salt: int = 8


DEFAULT_CONFIG = PipelineConfig()
