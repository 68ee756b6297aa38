"""Streaming CDC tail over the snapshot store's manifest log.

``spark.readStream.format("crocus_snapshot_tail").option("path", root)``
turns the manifest log (operators/maintenance.py) into a structured
stream — the Delta-as-a-streaming-source shape: the offset is the
manifest VERSION, each micro-batch emits the changes one or more
commits introduced, and a checkpointed restart resumes at the exact
version it died on (manifests are immutable, so replays are
byte-deterministic).

Per commit kind the feed emits:

- initial snapshot / append commit → the NEW files' rows, one input
  partition per data file (file-parallel, O(delta) — history is never
  re-read because appended directories are new by construction),
  ``_op = 'insert'``.
- positional-delete commit → the deleted rows' full PRE-IMAGES,
  ``_op = 'delete'``: the (file, position) tombstones name exactly
  which rows died, so the reader re-reads only the touched files and
  takes those positions — something an equality tombstone can't do.
- equality-delete commit → key-only tombstones, ``_op = 'delete_key'``
  (key columns set, all others NULL). Pre-images for an equality
  delete would require scanning the whole table per commit; a key
  tombstone keeps the feed O(delta), and a consumer that needs
  pre-images should delete positionally.
- rewrite commit (compaction / full-state re-commit, i.e. the primary
  ``data_dir`` changed) → the tail REFUSES by default, exactly like
  Delta's streaming source on a data-changing commit: silently
  re-emitting a rewritten table would duplicate every row downstream.
  ``option("skip_rewrites", "true")`` skips them explicitly
  (Delta's skipChangeCommits), which is correct when rewrites are
  known to be layout-only (compaction preserves logical content).

Scale contract: planning reads manifests (tiny JSON) plus delete sets
(delta-sized parquet, read driver-side to diff consecutive cumulative
sets — the same class of driver work as Delta reading its log);
row data always moves through executor partitions.

Reference lineage: the reference re-scrapes and re-reads whole
snapshot files per run (``base_scraper.py:72-83``); this source is the
incremental answer — consumers see only what each commit changed.
"""

from __future__ import annotations

import json as _json
import os as _os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SnapshotTailSource", "register_snapshot_tail_source"]

_OP_FIELDS = [
    T.StructField("_op", T.StringType(), False),
    T.StructField("_version", T.LongType(), False),
]


def _read_manifest(root: str, version: int) -> dict:
    # same layout as operators/maintenance._manifest_file — kept inline
    # so the pickled reader doesn't drag the operator module (and its
    # pyspark.sql imports) into every planner worker
    with open(
        _os.path.join(root, "_manifests", f"m{version:08d}.json")
    ) as f:
        return _json.load(f)


def _committed_versions(root: str) -> list[int]:
    mdir = _os.path.join(root, "_manifests")
    if not _os.path.isdir(mdir):
        return []
    out = []
    for f in _os.listdir(mdir):
        if f.startswith("m") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


@dataclass
class _FilePartition(InputPartition):
    """All rows of one immutable data file, as inserts."""

    path: str
    version: int


@dataclass
class _PosDeletePartition(InputPartition):
    """Pre-images: the rows of one data file at the newly-deleted
    positions."""

    path: str
    positions: list[int]
    version: int


@dataclass
class _EqDeletePartition(InputPartition):
    """Key-only tombstones for one equality-delete commit (the new keys
    only — the diff of the consecutive cumulative sets)."""

    keys: list[tuple]
    key_columns: list[str]
    version: int


class _SnapshotTailReader(DataSourceStreamReader):
    def __init__(self, options, schema: T.StructType):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("crocus_snapshot_tail requires option 'path'")
        self.skip_rewrites = (
            str(options.get("skip_rewrites", "false")).lower() == "true"
        )
        # Rate limit: at most N commits per micro-batch (Delta's
        # maxFilesPerTrigger, by version) — bounds a steady-state
        # consumer's per-batch work. 0/absent = unbounded. The anchor
        # is this READER INSTANCE's progress: the engine never tells a
        # fresh reader the checkpointed offset before its first
        # latestOffset call, so the first batch after a (re)start is
        # deliberately unbounded — an offset lower than the checkpoint
        # would move the stream backwards and re-emit versions, which
        # is strictly worse than one big catch-up batch. From the
        # second batch on, every batch advances ≤ N versions.
        self.versions_per_batch = int(options.get("versions_per_batch", 0))
        # data fields = committed schema; the feed appends _op/_version
        self.data_fields = [f.name for f in schema.fields[:-2]]
        self._anchor = None  # highest end offset this instance has seen

    def initialOffset(self) -> dict:
        return {"v": 0}

    def latestOffset(self) -> dict:
        versions = _committed_versions(self.root)
        latest_end = (versions[-1] + 1) if versions else 0
        if self.versions_per_batch <= 0 or self._anchor is None:
            self._anchor = max(latest_end, self._anchor or 0)
            return {"v": self._anchor}
        end = max(
            self._anchor,
            min(latest_end, self._anchor + self.versions_per_batch),
        )
        self._anchor = end
        return {"v": end}

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; manifests are immutable

    # -- planning ---------------------------------------------------------
    def _delete_key_diff(
        self, prev: dict | None, cur: dict
    ) -> tuple[list[tuple], list[str]]:
        """New equality-delete keys of this commit: cumulative(cur)
        minus cumulative(prev). Delete sets are delta-sized by the
        store's contract, so reading both driver-side is bounded."""
        import pyarrow.parquet as pq

        def keys_of(d):
            if d is None:
                return set()
            tbl = pq.read_table(_os.path.join(self.root, d["data_dir"]))
            cols = [tbl[c].to_pylist() for c in d["key_columns"]]
            return set(zip(*cols)) if cols else set()

        cur_d = cur["deletes"]
        new = keys_of(cur_d) - keys_of(prev.get("deletes") if prev else None)
        return sorted(new), list(cur_d["key_columns"])

    def _pos_delete_diff(
        self, prev: dict | None, cur: dict
    ) -> dict[str, list[int]]:
        """Newly-deleted (file → positions) of this commit."""
        import pyarrow.parquet as pq

        def pos_of(d):
            if d is None:
                return set()
            tbl = pq.read_table(_os.path.join(self.root, d["data_dir"]))
            return set(
                zip(tbl["file_name"].to_pylist(), tbl["row_index"].to_pylist())
            )

        new = pos_of(cur["pos_deletes"]) - pos_of(
            prev.get("pos_deletes") if prev else None
        )
        by_file: dict[str, list[int]] = {}
        for fname, pos in new:
            by_file.setdefault(fname, []).append(pos)
        return {f: sorted(ps) for f, ps in by_file.items()}

    def _find_file(self, m: dict, fname: str) -> str:
        """Absolute path of a data file by its (job-UUID-unique) name,
        searching the manifest's primary dir then appends."""
        for d in [m["data_dir"]] + [
            a["data_dir"] for a in m.get("append_dirs", [])
        ]:
            p = _os.path.join(self.root, d, fname)
            if _os.path.exists(p):
                return p
        raise FileNotFoundError(
            f"data file {fname!r} not in any dir of the pinned manifest"
        )

    def partitions(self, start: dict, end: dict):
        parts: list[InputPartition] = []
        committed = _committed_versions(self.root)  # one listing per batch
        versions = [v for v in committed if start["v"] <= v < end["v"]]
        for v in versions:
            cur = _read_manifest(self.root, v)
            prev_versions = [p for p in committed if p < v]
            prev = (
                _read_manifest(self.root, prev_versions[-1])
                if prev_versions
                else None
            )
            if prev is None:
                # initial snapshot: everything is an insert
                groups = [(cur["data_dir"], cur["files"])] + [
                    (a["data_dir"], a["files"])
                    for a in cur.get("append_dirs", [])
                ]
                for d, files in groups:
                    base = _os.path.join(self.root, d)
                    for rel, _sz in files:
                        parts.append(
                            _FilePartition(_os.path.join(base, rel), v)
                        )
                continue
            if cur["data_dir"] != prev["data_dir"]:
                if self.skip_rewrites:
                    continue
                raise RuntimeError(
                    f"version {v} rewrote the table (data_dir changed): "
                    "a CDC tail cannot represent a rewrite as a delta — "
                    "set option skip_rewrites=true to skip layout-only "
                    "rewrites (compaction), as with Delta skipChangeCommits"
                )
            prev_appends = {
                a["data_dir"] for a in prev.get("append_dirs", [])
            }
            for a in cur.get("append_dirs", []):
                if a["data_dir"] in prev_appends:
                    continue
                base = _os.path.join(self.root, a["data_dir"])
                for rel, _sz in a["files"]:
                    parts.append(
                        _FilePartition(_os.path.join(base, rel), v)
                    )
            if (cur.get("deletes") or {}) != (prev.get("deletes") or {}):
                keys, key_cols = self._delete_key_diff(prev, cur)
                if keys:
                    parts.append(_EqDeletePartition(keys, key_cols, v))
            if (cur.get("pos_deletes") or {}) != (
                prev.get("pos_deletes") or {}
            ):
                for fname, positions in self._pos_delete_diff(
                    prev, cur
                ).items():
                    parts.append(
                        _PosDeletePartition(
                            self._find_file(cur, fname), positions, v
                        )
                    )
        return parts

    # -- execution --------------------------------------------------------
    def _rows_of(self, path: str, positions: list[int] | None = None):
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        if positions is not None:
            tbl = tbl.take(positions)
        cols = set(tbl.column_names)
        pylists = {
            f: (tbl[f].to_pylist() if f in cols else [None] * len(tbl))
            for f in self.data_fields
        }
        for i in range(len(tbl)):
            yield tuple(pylists[f][i] for f in self.data_fields)

    def read(self, partition):
        if isinstance(partition, _FilePartition):
            for row in self._rows_of(partition.path):
                yield row + ("insert", partition.version)
        elif isinstance(partition, _PosDeletePartition):
            for row in self._rows_of(partition.path, partition.positions):
                yield row + ("delete", partition.version)
        elif isinstance(partition, _EqDeletePartition):
            idx = {c: i for i, c in enumerate(partition.key_columns)}
            for key in partition.keys:
                yield tuple(
                    key[idx[f]] if f in idx else None
                    for f in self.data_fields
                ) + ("delete_key", partition.version)
        else:  # pragma: no cover - planning only emits the three above
            raise TypeError(f"unknown partition {type(partition)}")


class SnapshotTailSource(DataSource):
    """``spark.readStream.format("crocus_snapshot_tail")
    .option("path", state_root)`` — CDC tail of the manifest log."""

    @classmethod
    def name(cls) -> str:
        return "crocus_snapshot_tail"

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError("crocus_snapshot_tail requires option 'path'")
        versions = _committed_versions(root)
        if not versions:
            raise ValueError(f"no committed snapshot versions under {root}")
        s = _read_manifest(root, versions[-1]).get("schema")
        if s is None:
            raise ValueError(
                "CDC tail needs manifests with committed writer schemas "
                "(commit via commit_snapshot/commit_append)"
            )
        data = T.StructType.fromJson(s)
        # every data field is NULLABLE in the feed regardless of the
        # table schema: key-only tombstones ('delete_key') carry NULL
        # for all non-key columns by design
        fields = [
            T.StructField(f.name, f.dataType, True) for f in data.fields
        ]
        return T.StructType(fields + _OP_FIELDS)

    def streamReader(self, schema: T.StructType):
        return _SnapshotTailReader(self.options, schema)


def register_snapshot_tail_source(spark) -> None:
    try:
        spark.dataSource.register(SnapshotTailSource)
    except Exception:
        pass  # already registered on this session
