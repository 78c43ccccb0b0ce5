"""crawlkit — a PySpark-native batch crawl & extraction engine.

A brand-new rebuild (not a port) of the query/data-processing
capabilities of ``yiwen-ai/webscraper`` (reference, read-only at
/root/reference): a URL frontier over Common-Crawl-style page tables,
with a partitioned bloom URL-seen filter, per-host politeness
scheduling, priority ranking, and readable-text extraction whose
``text`` output is byte-identical per url to the pinned kernel.

Everything is DataFrame-API Spark; all per-row Python runs inside
Arrow-vectorized pandas UDFs (``mapInPandas`` / ``applyInPandas``).
"""

__version__ = "0.1.0"
