"""Named-query surface: importing this package populates REGISTRY.

Each submodule registers its queries on import; ``__spark_entry__.py``
exposes the registry to the driver.
"""

from .registry import REGISTRY, Query, oracle_dict, queries_dict  # noqa: F401

from . import analytic  # noqa: E402,F401
from . import cleaning  # noqa: E402,F401
from . import dedup_plans  # noqa: E402,F401
from . import ml_plans  # noqa: E402,F401
from . import pipeline_plans  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import similarity_plans  # noqa: E402,F401
from . import streaming_plans  # noqa: E402,F401
from . import text_plans  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "queries_dict", "oracle_dict"]
