"""iresearch_spark — a PySpark-native full-text inverted-index + BM25 engine.

Brand-new Spark-first engine with the query/data capabilities of the
IResearch C++ library (reference at /root/reference; see SURVEY.md): segmented
inverted index build over web-page tables, VByte/128-block posting codecs with
block-max (WAND) metadata, a filter algebra (term/terms/prefix/range/wildcard/
fuzzy/phrase/boolean) and BM25/TF-IDF top-k retrieval — all expressed as
DataFrame plans + vectorized Arrow/pandas kernels (no per-row Python).
"""

from .index import consolidate as consolidation
from .index.builder import IndexBuilder
from .index.consolidate import consolidate
from .index.reader import IndexReader
from .search import filters
from .search.executor import Searcher

__all__ = ["IndexBuilder", "IndexReader", "Searcher", "consolidate", "consolidation", "filters"]
__version__ = "0.1.0"
