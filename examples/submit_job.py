"""spark-submit entry point: build an index over a parquet corpus and run a
query batch — the north-rule delivery shape
(``spark-submit --py-files iresearch_spark.zip examples/submit_job.py
<corpus.parquet> <index_path> [query ...]``).

When shipped via ``--py-files`` the package is already on every executor's
PYTHONPATH, so the job uses the plain active SparkSession (no addPyFile).
Prints one JSON line per query with its top-10 (doc_key, score) rows.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    corpus, index_path = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or ["scan"]
    spark = SparkSession.builder.appName("iresearch-spark-job").getOrCreate()

    from iresearch_spark import IndexBuilder, IndexReader, Searcher, filters as flt

    df = spark.read.parquet(corpus)
    key = "doc_key" if "doc_key" in df.columns else df.columns[0]
    if key != "doc_key":
        df = df.withColumn("doc_key", df[key].cast("string"))
    IndexBuilder(
        spark, index_path, num_segments=spark.sparkContext.defaultParallelism
    ).build(df, key_col="doc_key", text_col="text")

    s = Searcher(IndexReader(spark, index_path))
    batch = s.prepare({q: flt.Term(q) for q in queries})
    rows = batch.execute(k=10).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append(
            [int(r["doc_id"]), round(float(r["score"]), 4)]
        )
    for q in queries:
        print(json.dumps({"query": q, "top": by_q.get(q, [])}))
    spark.stop()


if __name__ == "__main__":
    main()
