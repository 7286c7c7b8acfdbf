"""End-to-end quickstart: the storage engine's public surface in one
runnable script — create a project/bucket/table, import data, profile
it, query it, then attach vector + dedup indexes to it and serve
searches and ingestion-time near-dup checks.

Run:  python examples/quickstart.py [warehouse_dir]

Everything here goes through the same engine methods the REST app
(service/app.py), the CLI (cli.py) and the driver bridge expose; swap
`eng.<method>` for the corresponding route to run it over HTTP.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # runnable from any cwd


def main(warehouse: str | None = None) -> None:
    from keboola_storage_duckdb_spark.engine import StorageEngine
    from keboola_storage_duckdb_spark.session import get_spark

    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    warehouse = warehouse or tempfile.mkdtemp(prefix="quickstart_wh_")
    eng = StorageEngine(spark, warehouse)
    print(f"warehouse: {warehouse}")

    # ---- catalog + import -------------------------------------------
    eng.create_project("demo")
    eng.create_bucket("demo", "in_c_docs")
    eng.create_table("demo", "in_c_docs", "corpus", [
        {"name": "doc_id", "type": "BIGINT", "nullable": False},
        {"name": "text", "type": "VARCHAR", "nullable": True},
        {"name": "embedding", "type": "FLOAT[]", "nullable": True},
        {"name": "label", "type": "INTEGER", "nullable": True},
    ])
    docs = [
        (i,
         f"document {i} talks about {'spark' if i % 2 else 'duckdb'} "
         f"storage engines and topic {i % 3} in some detail",
         [float((i * 37 + d * 11) % 97) / 97.0 for d in range(64)],
         i % 4)
        for i in range(200)
    ]
    src = tempfile.mkdtemp(prefix="quickstart_src_") + "/corpus.parquet"
    spark.createDataFrame(
        docs, "doc_id bigint, text string, embedding array<float>, "
              "label int").write.parquet(src)
    res = eng.import_file("demo", "in_c_docs", "corpus", src,
                          file_format="parquet")
    print(f"imported rows: {res['rows_after']}")

    # ---- profile + query --------------------------------------------
    prof = eng.profile("demo", "in_c_docs", "corpus")
    print(f"profile: {prof['row_count']} rows, "
          f"{len(prof['columns'])} columns profiled")
    rows = eng.execute_query(
        "demo", "SELECT label, COUNT(*) AS n FROM in_c_docs_corpus "
                "GROUP BY label ORDER BY label")
    print("group-by over the SQL surface:", rows)

    # ---- vector index: build once, serve searches -------------------
    eng.create_index("demo", "in_c_docs", "corpus", "vec",
                     id_column="doc_id", vector_column="embedding",
                     kind="pq", label_column="label")
    info = eng.index_info("demo", "in_c_docs", "corpus", "vec")
    print(f"vector index: {info['n_vectors']} vectors in "
          f"{info['n_lists']} lists, imbalance {info['imbalance']:.2f}")
    hits = eng.search_index(
        "demo", "in_c_docs", "corpus", "vec",
        queries=[{"id": -1, "vector": docs[0][2]}],
        k=3, nprobe=2)
    print("nearest neighbors of doc 0's vector:",
          [(h["neighbor_id"], h["adist"]) for h in hits])

    # ---- dedup index: ingestion-time near-dup checks -----------------
    eng.create_index("demo", "in_c_docs", "corpus", "dd",
                     id_column="doc_id", text_column="text",
                     kind="minhash")
    dup = eng.dedup_check(
        "demo", "in_c_docs", "corpus", "dd",
        documents=[{"id": -1, "text": docs[5][1]},
                   {"id": -2, "text": "entirely novel text about "
                                      "nothing indexed before"}])
    print("near-dup hits for an exact copy of doc 5:",
          [(h["id"], h["duplicate_of"], round(h["jaccard"], 3))
           for h in dup])

    # ---- lifecycle: mutate the table, refresh the indexes ------------
    eng.delete_rows("demo", "in_c_docs", "corpus", where="doc_id = 7")
    print("after delete, vector index stale:",
          eng.index_info("demo", "in_c_docs", "corpus", "vec")["stale"])
    print("refresh:", eng.refresh_index("demo", "in_c_docs", "corpus",
                                        "vec"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
