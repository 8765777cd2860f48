"""Beyond-reference operators for large-scale training-data pipelines
(SURVEY.md §8 M7): deduplication, similarity search, text analysis,
multimodal plumbing.  All pure DataFrame ops (JVM-side, whole-stage
codegen) except where vectorized Arrow UDFs are genuinely required
(multimodal decode).
"""

from . import (  # noqa: F401
    analytics,
    dedup,
    imaging,
    joins,
    layout,
    multimodal,
    olap,
    pipeline,
    similarity,
    sketches,
    skew,
    textstats,
)
