from pdf_craft_spark.streaming.incremental import (  # noqa: F401
    start_incremental_extraction,
)
