"""Live-MongoDB smoke: one real ``format("mongodb")`` read.

The only SURVEY §2 path never executed in the sandbox is a live
connector read (O-1/O-23); this test runs it whenever an environment
can provide a server, and skips cleanly everywhere else.

Activation paths, tried in order:

1. ``$MONGO_SMOKE_URI`` points at a reachable mongod (any deployment).
2. Docker is available: a throwaway ``mongo`` container is started for
   the duration of the test (gated on the daemon AND the image).

Either way the connector jar must be on the Spark classpath
(``--packages org.mongodb.spark:mongo-spark-connector_2.13:10.3.0``)
and pymongo importable for seeding — each missing piece is its own
skip reason so a future environment upgrade flips exactly the checks
it unblocks.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

from mongo2pq_spark.sources.mongo import is_mongo_available, read_collection

DOCKER = shutil.which("docker")


def _docker_daemon_up() -> bool:
    if not DOCKER:
        return False
    try:
        return (
            subprocess.run(
                [DOCKER, "info"], capture_output=True, timeout=10
            ).returncode
            == 0
        )
    except Exception:
        return False


@pytest.fixture(scope="module")
def mongo_uri():
    uri = os.environ.get("MONGO_SMOKE_URI")
    if uri:
        yield uri
        return
    if not _docker_daemon_up():
        pytest.skip("no $MONGO_SMOKE_URI and no Docker daemon")
    name = f"mongo-smoke-{uuid.uuid4().hex[:8]}"
    run = subprocess.run(
        [DOCKER, "run", "-d", "--rm", "--name", name, "-p", "27017:27017", "mongo:7"],
        capture_output=True,
        timeout=120,
    )
    if run.returncode != 0:
        pytest.skip(f"docker run mongo failed: {run.stderr.decode()[:200]}")
    try:
        yield "mongodb://localhost:27017"
    finally:
        subprocess.run([DOCKER, "stop", name], capture_output=True, timeout=60)


def test_live_mongodb_read(spark, mongo_uri):
    if not is_mongo_available(spark):
        pytest.skip("mongo-spark-connector not on the classpath")
    pymongo = pytest.importorskip("pymongo", reason="pymongo needed to seed")

    client = pymongo.MongoClient(mongo_uri, serverSelectionTimeoutMS=5000)
    try:
        client.admin.command("ping")
    except Exception as exc:
        pytest.skip(f"mongod not reachable at {mongo_uri}: {exc}")

    coll = client["smoke_db"]["events"]
    coll.drop()
    coll.insert_many(
        [
            {"event_id": i, "event_type": "click" if i % 2 else "view", "value": i * 1.5}
            for i in range(100)
        ]
    )

    df = read_collection(spark, mongo_uri, "smoke_db", "events")
    # pushdown surface: projection + equality filter reach the server
    clicks = df.filter(df.event_type == "click").select("event_id", "value")
    assert clicks.count() == 50
    assert df.count() == 100
    assert {r["event_type"] for r in df.select("event_type").distinct().collect()} == {
        "click",
        "view",
    }
