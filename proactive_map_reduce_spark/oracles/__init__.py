"""DuckDB oracle registry, grouped by the same domains as the query package.

_base holds the shared SQL helpers and CTE fragments; each domain module
fills ORACLES (the single shared dict) for its queries. Importing this
package populates the full registry exactly as the former single module
did — `from proactive_map_reduce_spark.oracles import ORACLES` is
unchanged.
"""

from ._base import *  # noqa: F401,F403
from ._base import ORACLES  # noqa: F401

# import order: reference/relational/similarity/streaming entries have no
# cross-module fragment deps; curation's _LSH_PAIRS_SQL reads its own
# module's earlier entries only.
from . import reference_ops as _m1  # noqa: F401,E402
from . import relational as _m2  # noqa: F401,E402
from . import curation as _m3  # noqa: F401,E402
from . import similarity as _m4  # noqa: F401,E402
from . import streaming_queries as _m5  # noqa: F401,E402
