"""Beyond-reference operators for large-scale training-data pipelines.

Not present in the reference system, but first-class components of a
100 TB deployment of this engine: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), approximate similarity
search, text analysis, and multimodal-column plumbing.

Importing this package registers the operators' graded queries.
"""

from . import (  # noqa: F401
    clusters,
    dedup,
    multimodal,
    sampling,
    similarity,
    textops,
    timeseries,
)
from ..streaming import interval_join, windows  # noqa: F401  (registers etl_* stream twins)
