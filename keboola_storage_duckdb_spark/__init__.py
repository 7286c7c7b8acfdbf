"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Keboola Storage service (padak/keboola-storage-duckdb).

The reference delegates SQL execution to embedded DuckDB (one ``.duckdb`` file
per table); this package re-expresses the same semantics — catalog/lifecycle,
import/dedup/merge pipeline, typed filter grammar, export, preview, profiler,
schema evolution, snapshots, branches, workspaces — on idiomatic PySpark
(DataFrame / Spark SQL / Catalyst), designed for multi-executor clusters at
100 TB scale even though tests run on ``local[*]``.

Layout:
    session      SparkSession factory with scale-oriented defaults
    catalog/     projects → buckets → tables metadata, type mapping
    sources/     CSV/Parquet readers & writers, remote-FS URL mapping
    operators/   filters, dedup/merge, delete, profile, ddl, snapshots,
                 branches, workspaces, preview/export
    functions/   training-data-pipeline ops: dedup (minhash/simhash/ngram),
                 similarity search, text analysis, multimodal plumbing
"""

__version__ = "0.1.0"
