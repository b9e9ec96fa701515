from pdf_craft_spark.plans.pipeline import (  # noqa: F401
    corpus_df,
    extract_spans_df,
    prepare_stage1,
    to_nested_output,
)
