"""Driver-facing query definitions, grouped by operator family.

Importing this package registers every query into ``registry.REGISTRY``.
"""

from . import temporal  # noqa: F401
