"""MongoDB source via the Spark MongoDB connector.

The reference hand-rolls cursor paging, adaptive batch sizing, and
asyncio pipelining (/root/reference/mongo2pq/extract_load.py:28-74,
mongo.py:6-18). On Spark all of that is subsumed by the connector's
partitioner (parallel cursors per partition) plus Catalyst filter and
projection pushdown — strictly better: the reference fetches FULL
documents and prunes in Python (schema.py:113-117), the connector
pushes ``$project``/``$match`` to the server.

The connector jar is not baked into this environment, so everything is
gated: ``is_mongo_available`` probes the classpath and callers fall
back to the parquet/JSON test path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: connector package for spark-submit --packages (public Maven coords)
MONGO_CONNECTOR_COORDS = "org.mongodb.spark:mongo-spark-connector_2.13:10.3.0"


def is_mongo_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001 — classpath probe
        jvm.java.lang.Class.forName("com.mongodb.spark.sql.connector.MongoTableProvider")
        return True
    except Exception:
        return False


def reader_options(
    uri: str,
    database: str,
    collection: str,
    pipeline: list[dict[str, Any]] | None = None,
    sample_size: int | None = None,
) -> dict[str, str]:
    """Connector option map for one collection read — factored out of
    ``read_collection`` so the contract (option names, pipeline JSON
    encoding) is testable without a live server or the connector jar.

    Parity: the reference's read path is a raw cursor per collection
    plus a server-side ``$sample`` for inference
    (/root/reference/mongo2pq/extract_load.py:59-74, schema.py:219);
    here both ride the connector's ``aggregation.pipeline`` /
    ``sampleSize`` options, with ``$match``/``$project`` stages pushed
    to the server by Catalyst."""
    import json

    options = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }
    if pipeline is not None:
        options["aggregation.pipeline"] = json.dumps(pipeline)
    if sample_size is not None:
        options["sampleSize"] = str(sample_size)
    return options


def read_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    pipeline: list[dict[str, Any]] | None = None,
    sample_size: int | None = None,
) -> DataFrame:
    """DataFrame over one collection. Optional server-side aggregation
    ``pipeline`` (e.g. ``[{"$sample": {"size": n}}]``) preserves the
    reference's pushed-down sampling where needed."""
    if not is_mongo_available(spark):
        raise RuntimeError(
            "MongoDB Spark connector not on the classpath; add "
            f"--packages {MONGO_CONNECTOR_COORDS} (test path uses parquet/JSON)"
        )
    return (
        spark.read.format("mongodb")
        .options(**reader_options(uri, database, collection, pipeline, sample_size))
        .load()
    )


def list_collections(uri: str, database: str | None = None) -> tuple[str, list[str]]:
    """Driver-side db/collection enumeration with a 1 s health check
    (parity: reference mongo.py:15-18, main.py:33-37). Requires pymongo,
    gated since it is not baked into the test image."""
    try:
        from pymongo import MongoClient
    except ImportError as exc:
        raise RuntimeError("pymongo is required for collection enumeration") from exc

    client = MongoClient(uri, serverSelectionTimeoutMS=1000)
    client.admin.command("ping")
    db_name = database or client.list_database_names()[0]
    return db_name, client[db_name].list_collection_names()
