"""Interleaved text+media documents source (BASELINE.json input_hint).

Production input is an Iceberg table
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``; the
sandbox has no such table, so this module synthesizes it **deterministically**
from the driver-provided ``documents.parquet`` (TESTDATA.md) — a pure
function of the input rows, no randomness.

The synthesis is written once as ANSI SQL (:data:`INTERLEAVED_SPANS_SQL`)
that runs *unchanged* in both Spark SQL and DuckDB.  That single text is the
contract that makes every downstream SQL-expressible pipeline stage
oracle-checkable: Spark queries build on the Spark execution of it, the
DuckDB oracles build on the DuckDB execution of it, and any divergence
shows up as a value-hash mismatch in CORRECTNESS_r{N}.json.

Span mix per document (HTML grammar mix per FIXTURES.md §1):
  offset 0  text   heading + nav boilerplate (extractor must strip the nav)
  offset 1  text   main body paragraph
  offset 2  media  img:// reference
  offset 3  text   nested div + footer boilerplate
  offset 4  media  vid:// reference            (every 3rd doc)
  offset 5  text   mega span: body repeated 20x (every 97th doc — the
                   skew exerciser from FIXTURES.md §1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One SQL text, two engines.  Only portable constructs: ||, CAST AS STRING,
# substr, repeat, %, UNION ALL, literal NULLs with explicit CASTs.
INTERLEAVED_SPANS_SQL = """
SELECT CAST(doc_id AS STRING) AS doc_id,
       0 AS offset,
       'text' AS kind,
       '<h1>Doc ' || CAST(doc_id AS STRING) || '</h1><nav><a href="/">Home</a> <a href="/lang">' || lang || '</a></nav>' AS text,
       CAST(NULL AS STRING) AS media_ref
FROM documents
UNION ALL
SELECT CAST(doc_id AS STRING) AS doc_id,
       1 AS offset,
       'text' AS kind,
       '<p>' || text || '</p>' AS text,
       CAST(NULL AS STRING) AS media_ref
FROM documents
UNION ALL
SELECT CAST(doc_id AS STRING) AS doc_id,
       2 AS offset,
       'media' AS kind,
       CAST(NULL AS STRING) AS text,
       'img://' || source || '/' || CAST(doc_id AS STRING) AS media_ref
FROM documents
UNION ALL
SELECT CAST(doc_id AS STRING) AS doc_id,
       3 AS offset,
       'text' AS kind,
       '<div><p>' || substr(text, 1, 120) || '</p><footer><a href="/about">about</a> <a href="/contact">contact</a></footer></div>' AS text,
       CAST(NULL AS STRING) AS media_ref
FROM documents
UNION ALL
SELECT CAST(doc_id AS STRING) AS doc_id,
       4 AS offset,
       'media' AS kind,
       CAST(NULL AS STRING) AS text,
       'vid://' || CAST(doc_id AS STRING) AS media_ref
FROM documents
WHERE doc_id % 3 = 0
UNION ALL
SELECT CAST(doc_id AS STRING) AS doc_id,
       5 AS offset,
       'text' AS kind,
       '<p>' || repeat(text, 20) || '</p>' AS text,
       CAST(NULL AS STRING) AS media_ref
FROM documents
WHERE doc_id % 97 = 0
"""


def register_documents(spark: SparkSession, sf_dir: str,
                       replication: int = 1) -> DataFrame:
    """Register the driver-provided parquet tables needed by the SQL.

    ``replication > 1`` replicates every document deterministically with
    distinct doc_ids (bench-only: the sandbox sf dirs are a few MB, far too
    small to saturate 32 cores — replication scales the workload while
    keeping it a pure function of the input).  Correctness queries and
    oracles always run at replication=1.
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replication > 1:
        rep = spark.range(replication).withColumnRenamed("id", "_r")
        df = (df.crossJoin(rep)
              .withColumn("doc_id",
                          F.col("doc_id") + F.col("_r") * F.lit(10_000_000))
              .drop("_r"))
    df.createOrReplaceTempView("documents")
    return df


def interleaved_exploded(spark: SparkSession, sf_dir: str,
                         replication: int = 1) -> DataFrame:
    """Synthesized interleaved table, one row per span (exploded form)."""
    register_documents(spark, sf_dir, replication)
    return spark.sql(INTERLEAVED_SPANS_SQL)


def interleaved_nested(spark: SparkSession, sf_dir: str,
                       replication: int = 1) -> DataFrame:
    """Input-shape table per input_hint:
    (doc_id string, spans array<struct<kind,text,media_ref,offset>>).

    Built from the exploded form with one hash-aggregate;
    ``sort_array`` on (offset-first structs) restores document order
    without a window (cheaper at scale: no per-doc sort shuffle beyond
    the groupBy itself).
    """
    ex = interleaved_exploded(spark, sf_dir, replication)
    return (
        ex.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("offset"),
                        F.col("kind"),
                        F.col("text"),
                        F.col("media_ref"),
                    )
                )
            ).alias("_sorted")
        )
        .select(
            "doc_id",
            F.transform(
                "_sorted",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def oracle_cte(body_sql: str) -> str:
    """Wrap a DuckDB oracle query with the shared synthesis CTE."""
    return f"WITH interleaved_spans AS ({INTERLEAVED_SPANS_SQL}) {body_sql}"
