"""Driver-facing query definitions, grouped by operator family.

Importing this package registers every query into ``registry.REGISTRY``.
"""

from . import anomalies, percentiles, relational, stats, temporal, trends  # noqa: F401
