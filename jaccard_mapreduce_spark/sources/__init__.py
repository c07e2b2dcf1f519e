from jaccard_mapreduce_spark.sources.corpus import (  # noqa: F401
    read_corpus_text,
    read_documents,
    write_formatted_text,
)
from jaccard_mapreduce_spark.sources.tables import load_tables, TABLE_NAMES  # noqa: F401
