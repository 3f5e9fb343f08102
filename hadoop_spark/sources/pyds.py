"""User-pluggable formats via Spark 4's Python DataSource API — the modern
form of the reference's custom-InputFormat/OutputFormat contract:

- ``DataSource.name()``        <->  the format id jobs select
- ``DataSourceReader.partitions()``  <->  ``InputFormat.getSplits``
  (`MR-CORE/mapreduce/InputFormat.java:53`)
- ``DataSourceReader.read(split)``   <->  ``RecordReader.nextKeyValue``
  (`MR-CORE/mapreduce/RecordReader.java`)
- ``DataSourceWriter.write/commit``  <->  ``RecordWriter`` +
  ``OutputCommitter`` (`MR-CORE/mapreduce/OutputCommitter.java:66`)

The demo codec is fixed-width records (`FixedLengthInputFormat.java:47`
lineage, like `sources/formats.read_fixed_width` but as a REAL pluggable
source: splits planned driver-side, records decoded on executors in the
Arrow-batched Python worker). Spark parallelizes reads across the planned
partitions exactly as it would over file splits — at scale the partition
list is one entry per file (or byte range), not per record.

Registration is per-session: ``spark.dataSource.register(FixedWidthDataSource)``.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType


def _parse_fields(spec: str) -> list[tuple[str, int]]:
    """``"name:4,other:16"`` -> [("name", 4), ("other", 16)]."""
    out = []
    for part in spec.split(","):
        name, width = part.strip().split(":")
        out.append((name, int(width)))
    return out


class _FileSplit(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _decode_file(path: str, fields: list):
    """RecordReader body: decode one fixed-width file, yield typed rows."""
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            out, off = [], 0
            for _, width in fields:
                out.append(line[off : off + width].rstrip())
                off += width
            yield tuple(out)


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.fields = _parse_fields(options["fields"])

    def partitions(self):
        # getSplits: one split per data file (Spark schedules one task per
        # split; a byte-range splitter would slot in here unchanged).
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [_FileSplit(f) for f in files]

    def read(self, partition: _FileSplit):
        # RecordReader: decode one split, yield typed records.
        yield from _decode_file(partition.path, self.fields)


class _FixedWidthCommit(WriterCommitMessage):
    """Task attempt's pending (temp name, final name) pair."""

    def __init__(self, tmp_name: str, final_name: str):
        self.tmp_name = tmp_name
        self.final_name = final_name


class FixedWidthWriter(DataSourceWriter):
    """RecordWriter + FileOutputCommitter parity
    (`MR-CORE/.../FileOutputCommitter.java:51`): each task attempt writes a
    dot-prefixed PENDING file (readers skip '_'/'.' prefixes, so a failed,
    speculative, or in-flight attempt is never ingested); the job-level
    ``commit()`` promotes exactly the committed attempts' files to their
    final names and removes strays — and the ``overwrite`` delete of prior
    output is deferred to commit time, so a failed job leaves existing data
    intact. Single-filesystem rename, as with FileOutputCommitter (a real
    cluster points ``path`` at a shared filesystem)."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.fields = _parse_fields(options["fields"])
        self.schema = schema
        self.overwrite = overwrite
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        # RecordWriter: one pending file per task attempt, unique dot-name
        # so a retried attempt cannot clobber another, and readers cannot
        # see it before commit.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        final_name = f"part-{pid:05d}-{uuid.uuid4().hex}.txt"
        tmp_name = "." + final_name + ".pending"
        widths = dict(self.fields)
        names = [f.name for f in self.schema.fields]
        with open(os.path.join(self.path, tmp_name), "w", encoding="utf-8") as fh:
            for row in iterator:
                vals = [
                    ("" if v is None else str(v)).ljust(widths[n])[: widths[n]]
                    for n, v in zip(names, row)
                ]
                fh.write("".join(vals) + "\n")
        return _FixedWidthCommit(tmp_name, final_name)

    def commit(self, messages):
        # OutputCommitter.commitJob: delete prior output now (not at plan
        # time), promote committed attempts' pending files, sweep strays
        # left by failed/speculative attempts.
        keep = {m.tmp_name: m.final_name for m in messages if m is not None}
        if self.overwrite:
            for f in os.listdir(self.path):
                if not f.startswith(("_", ".")):
                    os.remove(os.path.join(self.path, f))
        for tmp_name, final_name in keep.items():
            os.replace(
                os.path.join(self.path, tmp_name),
                os.path.join(self.path, final_name),
            )
        self._sweep_pending()
        return None

    def abort(self, messages):
        # OutputCommitter.abortJob: drop every pending file; committed
        # (non-dot) output from prior jobs is untouched.
        self._sweep_pending()
        return None

    def _sweep_pending(self) -> None:
        for f in os.listdir(self.path):
            if f.startswith(".") and f.endswith(".pending"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass


class FixedWidthStreamReader(DataSourceStreamReader):
    """Streaming half of the pluggable format — the file-arrival tail that
    Hadoop deployments script as "scan the landing dir, process new files,
    move them on" (the FileStreamSource/Flume pattern). The offset is the
    count of files consumed from the SORTED landing-dir listing, so the
    source contract is append-only arrival with lexically increasing names
    (the same contract Spark's built-in FileStreamSource tracks with its
    seen-files log; a production variant would swap the offset for a
    (name, mtime) watermark without touching the split/read path).

    MicroBatchStream parity: ``initialOffset``/``latestOffset`` bound each
    micro-batch, ``partitions(start, end)`` plans one split per NEW file
    (``InputFormat.getSplits`` again, now per batch), ``read`` reuses the
    batch RecordReader body, and exactly-once across restarts comes from
    the engine replaying the checkpointed offset range against
    deterministic file->offset mapping."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.fields = _parse_fields(options["fields"])

    def _files(self) -> list:
        return sorted(
            f for f in os.listdir(self.path) if not f.startswith(("_", "."))
        )

    def initialOffset(self):
        return {"files_done": 0}

    def latestOffset(self):
        return {"files_done": len(self._files())}

    def partitions(self, start, end):
        files = self._files()[start["files_done"] : end["files_done"]]
        return [_FileSplit(os.path.join(self.path, f)) for f in files]

    def read(self, partition: _FileSplit):
        yield from _decode_file(partition.path, self.fields)

    def commit(self, end):
        # Offsets are positions in a stable listing; nothing to clean up.
        # (A move-files-on-commit variant would archive consumed files here.)
        pass


class FixedWidthDataSource(DataSource):
    """`spark.read.format("fixedwidth").option("fields", "k:4,v:16")`."""

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self):
        return StructType(
            [
                StructField(name, StringType())
                for name, _ in _parse_fields(self.options["fields"])
            ]
        )

    def reader(self, schema):
        return FixedWidthReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FixedWidthWriter(self.options, schema, overwrite)

    def streamReader(self, schema):
        return FixedWidthStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FixedWidthDataSource)
