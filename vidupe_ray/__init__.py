"""vidupe_ray — a Ray-Data-native near-duplicate detection & clustering engine.

A from-scratch recast of `kristiankoskimaki/vidupe`'s dedup semantics
(frame fingerprints + two-stage thresholded matching) as document
fingerprinting (MinHash-128 + head/tail SimHash-64 + LSH banding +
containment/substring pass + distributed union-find) over Parquet corpora
of source-code files.  See SURVEY.md for the full blueprint.
"""

from .config import DEFAULT_CONFIG, PipelineConfig

__all__ = ["PipelineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
