"""anomalyzer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lytics/anomalyzer, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Built from scratch for Spark's execution model: declarative DataFrame plans
(Catalyst-optimized), a single hash exchange per detection query, Arrow
pandas-UDF kernels only where SQL genuinely can't express the semantics
(Monte-Carlo permutation tests), and Structured Streaming for the
``Push``-style incremental path.
"""

from .config import AnomalyzerConf, REFERENCE_TEST_CONF
from .operators.detect import detect, detect_by_test, tail_window

__all__ = [
    "AnomalyzerConf",
    "REFERENCE_TEST_CONF",
    "detect",
    "detect_by_test",
    "tail_window",
]
__version__ = "0.1.0"
