"""Column-level helper functions — all JVM-side ``pyspark.sql.functions``
compositions (no Python UDFs in any hot path; SURVEY §4 scale posture).
"""

from .vectors import cosine_similarity, dot, l2_norm, l2_normalize
from .textfns import (
    BPE_ISH_TOKEN_RE,
    bpe_ish_tokens,
    normalize_ws,
    whitespace_tokens,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "BPE_ISH_TOKEN_RE",
    "bpe_ish_tokens",
    "normalize_ws",
    "whitespace_tokens",
]
