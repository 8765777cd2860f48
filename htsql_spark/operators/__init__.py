"""Beyond-reference operators for large-scale training-data pipelines
(SURVEY.md §8 M7): deduplication, similarity search, text analysis,
multimodal plumbing.  All pure DataFrame ops (JVM-side, whole-stage
codegen) except where vectorized Arrow UDFs are genuinely required
(multimodal decode).
"""

from . import dedup, joins, layout, multimodal, olap, similarity, sketches, skew, textstats  # noqa: F401
