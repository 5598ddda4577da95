"""Contract tests for the MongoDB connector read path — the reference's
primary source (/root/reference/mongo2pq/extract_load.py:59-74,
mongo.py:15-18). No live server or connector jar in this environment,
so the executable spec covers option construction: connector option
names, pipeline JSON encoding, and sampling pushdown."""

import json

import pytest

from mongo2pq_spark.sources.mongo import MONGO_CONNECTOR_COORDS, reader_options


def test_basic_options():
    opts = reader_options("mongodb://host:27017", "shop", "orders")
    assert opts == {
        "connection.uri": "mongodb://host:27017",
        "database": "shop",
        "collection": "orders",
    }


def test_aggregation_pipeline_is_json_encoded():
    pipeline = [{"$match": {"status": "A"}}, {"$project": {"_id": 0}}]
    opts = reader_options("mongodb://h", "db", "c", pipeline=pipeline)
    assert json.loads(opts["aggregation.pipeline"]) == pipeline


def test_sample_pushdown_options():
    """The reference's server-side inference sampling ($sample via a raw
    cursor, schema.py:219) maps to the connector's pipeline/sampleSize."""
    opts = reader_options(
        "mongodb://h", "db", "c",
        pipeline=[{"$sample": {"size": 500}}], sample_size=500,
    )
    assert json.loads(opts["aggregation.pipeline"]) == [{"$sample": {"size": 500}}]
    assert opts["sampleSize"] == "500"


def test_connector_coords_are_public_maven():
    group, artifact, version = MONGO_CONNECTOR_COORDS.split(":")
    assert group == "org.mongodb.spark"
    assert artifact.startswith("mongo-spark-connector")
    assert version


def test_live_mongo_roundtrip_smoke(spark):
    """End-to-end read against a REAL mongod (the only §2 path the
    offline contract tests cannot cover, O-23): seed a collection with
    pymongo, read it back through the connector, assert row parity.

    Gated three ways so it skips cleanly in the sandbox and activates
    wherever the environment allows (e.g. `docker run -p 27017:27017
    mongo` plus `--packages` on the session):
      1. pymongo importable (seeding client)
      2. a mongod answering on MONGO_SMOKE_URI (default localhost:27017)
      3. the Spark MongoDB connector on the session classpath
    """
    import os

    pymongo = pytest.importorskip("pymongo", reason="pymongo not installed")

    from mongo2pq_spark.sources.mongo import is_mongo_available, read_collection

    uri = os.environ.get("MONGO_SMOKE_URI", "mongodb://localhost:27017")
    client = pymongo.MongoClient(uri, serverSelectionTimeoutMS=1000)
    try:
        client.admin.command("ping")
    except Exception:
        pytest.skip(f"no live mongod at {uri}")
    if not is_mongo_available(spark):
        pytest.skip("MongoDB Spark connector not on the classpath")

    coll = client["m2p_smoke"]["events"]
    coll.drop()
    docs = [{"k": i, "v": f"row-{i}"} for i in range(25)]
    coll.insert_many(docs)
    try:
        df = read_collection(spark, uri, "m2p_smoke", "events")
        got = sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())
        assert got == [(d["k"], d["v"]) for d in docs]
    finally:
        coll.drop()
        client.close()
