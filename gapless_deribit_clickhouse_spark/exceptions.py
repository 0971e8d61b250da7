"""Exception hierarchy.

Mirrors the reference's public error surface
(``/root/reference/src/gapless_deribit_clickhouse/exceptions.py:10-43``):
a base error with configuration / query / schema / parse specializations.
Network- and credential-specific errors from the reference (API,
RateLimit, Connection) collapse into ``SourceError`` because the Spark
engine reads files / streams rather than HTTPS endpoints.
"""

from __future__ import annotations


class GaplessSparkError(Exception):
    """Base class for all engine errors."""


class ConfigurationError(GaplessSparkError):
    """Invalid engine or feature configuration."""


class SourceError(GaplessSparkError):
    """Ingestion-source failure (pagination, continuity, checkpoint)."""


class QueryError(GaplessSparkError):
    """Query construction or execution failure."""


class SchemaError(GaplessSparkError):
    """Schema contract violation or drift."""


class InstrumentParseError(GaplessSparkError):
    """Unparseable option instrument name."""


class InsufficientDataError(GaplessSparkError):
    """Not enough observations for a model fit (e.g. EGARCH < 100 obs)."""
