from jaccard_mapreduce_spark.operators.jaccard import (  # noqa: F401
    doc_tokens,
    doc_sizes,
    pair_intersections,
    jaccard_pairs,
    jaccard_threshold,
    jaccard_topk,
    format_output,
    run_reference_pipeline,
)
