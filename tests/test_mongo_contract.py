"""Contract tests for the MongoDB connector read path — the reference's
primary source (/root/reference/mongo2pq/extract_load.py:59-74,
mongo.py:15-18). No live server or connector jar in this environment,
so the executable spec covers option construction: connector option
names, pipeline JSON encoding, and sampling pushdown."""

import json

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
