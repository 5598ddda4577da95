"""WebDataset-style tar-shard SINK (Spark 4 Python DataSource).

The standard interchange for multimodal training corpora (WebDataset /
wds): a dataset is a directory of ``shard-NNNNN.tar`` files, each a
plain POSIX tar whose member names are sample keys (``doc123.txt``,
``img456.jpg``) — training loaders stream whole shards sequentially,
so the tar framing IS the batching. This sink writes exactly that
layout from any DataFrame with columns ``(name string, payload
binary)``:

    df.write.format("tarshards").mode("overwrite").save(out_dir)

One tar per task partition, so shard sizing is the caller's
``repartition(n)`` / ``repartitionByRange`` decision — the same knob
every other sink uses. Tar members carry a fixed mtime and 0644 mode
so byte output depends only on (order, names, payloads); member order
is the partition's row order.

Write-mode contract (the mongodump writer's, shared rationale):
tasks write ``_tmp-`` then atomically rename, so retried tasks are
idempotent; overwrite's ``commit`` prunes shard files no task of the
current write produced; append is a loud ``NotImplementedError``
(tar shards are an immutable-snapshot interchange — appending would
interleave generations in one directory and break shard-sequential
loaders).

Read path: the shards re-ingest through the existing real-codec
chain — ``operators/multimodal.py::ingest_binary_dir`` (binaryFile
scan) into ``operators/archives.py::archive_manifest`` (real tar
parse + per-member content digests) — so the round trip is proven by
independent machinery, not by this module reading its own writes.

Reference: the EL sink family in ``plans/pipeline.py`` (cites
reference main.py:45-95); this adds the multimodal-training
interchange the reference's parquet-only sink lacks.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class TarShardsWriter(DataSourceWriter):
    def __init__(self, schema, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tarshards write requires a path")
        names = [f.name for f in schema.fields]
        if names[:2] != ["name", "payload"]:
            raise ValueError(
                "tarshards sink requires columns (name string, "
                f"payload binary) first, got {names!r}"
            )
        if not overwrite:
            raise NotImplementedError(
                "tarshards supports mode('overwrite') only: shards "
                "are an immutable-snapshot interchange — write the "
                "next generation to a fresh directory"
            )

    def write(self, rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        fname = f"shard-{pid:05d}.tar"
        tmp = os.path.join(self.path, f"_tmp-{fname}")
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for row in rows:
                name, payload = row[0], row[1]
                if name is None or payload is None:
                    raise ValueError(
                        "tarshards: NULL name or payload — a silent "
                        "skip would drop samples from the shard"
                    )
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                info.mtime = 0
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(bytes(payload)))
        with open(tmp, "wb") as fh:
            fh.write(buf.getvalue())
        os.replace(tmp, os.path.join(self.path, fname))
        return _ShardCommit(fname)

    def commit(self, messages):
        expected = {m.filename for m in messages}
        for f in os.listdir(self.path):
            if f.startswith("shard-") and f not in expected:
                os.remove(os.path.join(self.path, f))
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages):
        # partial _tmp- files may remain; _SUCCESS is the
        # completeness signal (the Hadoop committer contract)
        pass


class TarShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tarshards"

    def schema(self) -> str:
        return "name STRING, payload BINARY"

    def writer(self, schema, overwrite: bool) -> TarShardsWriter:
        return TarShardsWriter(schema, self.options, overwrite)


def register_tarshards_sink(spark) -> None:
    """Idempotently register the tarshards Python data source."""
    spark.dataSource.register(TarShardsDataSource)
