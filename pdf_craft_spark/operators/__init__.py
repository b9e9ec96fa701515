"""Extraction-dataflow operator kernels (SURVEY.md §2).

Pure-Python/numpy functions, deliberately free of any Spark import: each is
unit-testable against the reference's golden cases and is invoked from the
Arrow-batched kernels in ``pdf_craft_spark.plans.pipeline``.
"""
