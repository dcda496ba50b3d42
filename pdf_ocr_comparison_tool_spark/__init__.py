"""PySpark-native main-content extraction engine.

A from-scratch, Spark-first rebuild of the query/data-processing
capabilities of kevin1000x/PDF-OCR-Comparison-Tool (reference studied
read-only at /root/reference; see SURVEY.md for the operator map).

The engine operates over an Iceberg-style table of interleaved
text+media documents::

    doc_id : string|bigint
    spans  : array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>

and emits, per document, an ordered span sequence
``(kind, text, media_ref, order)`` plus downstream features,
classification, similarity matching, merge and report stages — all
expressed as DataFrame operations / vectorized Arrow UDFs, never
per-row Python.
"""

__version__ = "0.1.0"
