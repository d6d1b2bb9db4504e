"""synspark — a PySpark-native full-text engine.

From-scratch reimplementation of the capabilities around
codelibs/elasticsearch-analysis-synonym: NGram-synonym tokenization
(LUCENE-5252 semantics), inverted-index construction (delta+varint
block-compressed postings with block-max metadata), and BM25 top-k
query answering (block-max WAND), expressed Spark-first over
DataFrames with vectorized pandas/Arrow UDFs.
"""

from .synonyms import SynonymDict
from .tokenizer import TokenizerConfig, tokenize, tokenize_to_string

__all__ = ["SynonymDict", "TokenizerConfig", "tokenize", "tokenize_to_string"]
__version__ = "0.1.0"
