"""Spark 4 Python Data Source WRITER: a JSON-lines sink with real
two-phase commit.

Completes the Python Data Source surface started in ``pyds.py`` (batch
reader + streaming reader): the reference exports link/stat JSON with
driver-side ``json.dump`` (crawl/crawl.py:120-141, out-of-engine, single
process); this sink is the in-engine spelling — each PARTITION writes its
own ``part-NNNNN.jsonl`` through a task-scoped temp name, and the driver
finalizes atomically in ``commit`` (rename + manifest) or cleans up in
``abort``. That temp→rename→manifest dance is the core idempotency
contract every distributed sink (FileOutputCommitter, Iceberg/Delta
commits) is built on: a task that runs twice (speculation, retry) leaves
at most one committed file, and readers only trust the manifest.

Usage::

    df.write.format("jsonl_sink").option("path", dest).mode("append").save()

Restrictions kept honest: values must be JSON-serializable Python
scalars/lists/dicts (the test covers strings/ints/arrays); no Arrow fast
path (fine for link/stat exports — bulk data belongs in parquet).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

MANIFEST = "_MANIFEST.json"


@dataclass
class _FileCommit(WriterCommitMessage):
    temp_name: str
    final_name: str
    n_rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")

    def write(self, iterator: Iterator) -> _FileCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        # task-scoped temp name: a speculative twin of this task writes a
        # DIFFERENT temp file; only the one whose message reaches commit()
        # is renamed into place
        temp = f"_tmp-{uuid.uuid4().hex}-part-{pid:05d}.jsonl"
        final = f"part-{pid:05d}.jsonl"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, temp), "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), ensure_ascii=False, sort_keys=True))
                f.write("\n")
                n += 1
        return _FileCommit(temp_name=temp, final_name=final, n_rows=n)

    def commit(self, messages) -> None:
        total = 0
        files = []
        for m in messages:
            os.replace(
                os.path.join(self.path, m.temp_name),
                os.path.join(self.path, m.final_name),
            )
            files.append({"file": m.final_name, "rows": m.n_rows})
            total += m.n_rows
        files.sort(key=lambda d: d["file"])
        with open(os.path.join(self.path, MANIFEST), "w", encoding="utf-8") as f:
            json.dump({"files": files, "total_rows": total}, f, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.temp_name))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", d).save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
