"""Matching engine: tiled deep matching + geometric verification.

Public surface mirrors the reference (matching/__init__.py:1-3):
matchers, enums, tiler and geometric verification.
"""

from icepy4d_tpu.matching.enums import (  # noqa: F401
    GeometricVerification,
    Quality,
    TileSelection,
)
from icepy4d_tpu.matching.geometric_verification import (  # noqa: F401
    geometric_verification,
)
from icepy4d_tpu.matching.matchers import (  # noqa: F401
    FeaturesBase,
    ImageMatcherBase,
    LightGlueMatcher,
    LoFTRMatcher,
    LOFTRMatcher,
    NearestNeighborMatcher,
    SIFTMatcher,
    SemiDenseMatcher,
    SuperGlueMatcher,
)
from icepy4d_tpu.matching.templatematch import (  # noqa: F401
    MatchResult,
    TemplateMatch,
)
from icepy4d_tpu.matching.tiling import Tiler  # noqa: F401
from icepy4d_tpu.matching.tracking import (  # noqa: F401
    track_features,
    track_matches,
)
