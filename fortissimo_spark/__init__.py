"""fortissimo-spark: PySpark-native web-text extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
kshetline/fortissimo-html (forgiving, losslessly round-tripping HTML
parsing + text extraction) as a distributed pipeline over Common-Crawl
style page tables.
"""

__version__ = "0.1.0"
