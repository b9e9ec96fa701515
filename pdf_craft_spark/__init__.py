"""pdf_craft_spark — a from-scratch PySpark-native reimplementation of the
query/data-processing capabilities of oomol-lab/pdf-craft (scanned-book
extraction pipeline), re-expressed as vectorized DataFrame / Arrow-UDF
dataflow over tables of interleaved text+media documents.

Layout
------
- ``session``    SparkSession builder tuned for local[N] and cluster runs
- ``schemas``    StructTypes for the interleaved span data model
- ``corpus``     deterministic synthetic raw-span corpus generator
- ``sources``    readers for the driver test tables and the span tables
- ``operators``  the extraction dataflow stages (SURVEY.md §2 mapping)
- ``functions``  scalar/text/dedup/similarity function library
- ``plans``      end-to-end pipeline assembly + checkpoint/lineage
- ``streaming``  structured-streaming wrappers (incremental ingest)

Nothing in here is ported from the reference's implementation; the
reference (MIT, /root/reference) is cited in docstrings per-operator as
behavioral spec only (file:line).
"""

__version__ = "0.1.0"
