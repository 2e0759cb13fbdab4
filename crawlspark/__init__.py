"""crawlspark — a from-scratch PySpark-native URL-frontier + fetch scheduler
with the crawl semantics of MohibShaikh/Github-Crawler (reference at
/root/reference, studied for behavior only), over image+caption tables.

Layout:
  codecs.py     pure-numpy image codecs / phash / PSNR (shared with oracle)
  config.py     crawl semantics constants (shared with oracle)
  datagen.py    deterministic synthetic fixtures (FIXTURES.md)
  session.py    SparkSession factory
  tables.py     atomic snapshot table store (Iceberg-style commit log)
  functions/    scalar/url/text/similarity column functions + pandas UDFs
  operators/    dedup, politeness, bloom filter, validation, merge
  plans/        the epoch crawl job and the multi-epoch driver loop
  oracle/       pure-Python reference-semantics simulator (parity golden)
"""

__version__ = "0.1.0"
