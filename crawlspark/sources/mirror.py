"""Physical disk-mirror sink (O2 + O25/O26): one file per document
under ``data_dir/<host>/<path>``, the reference's SaveToDiskAsync layout
(src/CatalogCrawler/Logic/Downloader.cs:281-296).

The write is distributed — each partition writes its own rows, no
driver collect — and idempotent: content lands in a same-directory temp
file and ``os.replace``s into place, so a re-run (or a task retry)
atomically overwrites the identical destination instead of corrupting
it. Duplicate destinations across partitions are last-writer-wins, same
as the reference re-downloading a URL.

On a real cluster this sink targets a shared filesystem (the reference
mirrors to local disk; a 1000-executor run points ``data_dir`` at NFS /
FUSE-mounted object storage). The parquet ``EpochTable`` remains the
scale-preferred mirror — this sink exists for the reference's
file-tree-per-document contract, where ``--format-paths`` bounds every
directory's fanout (500 pages per bucket dir, one hour per leaf dir).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_mirror(df: DataFrame, data_dir: str, *, path_col: str = "dest",
                 content_col: str = "content") -> None:
    """Write each row's ``content_col`` (str or bytes) to
    ``data_dir/<path_col>``, creating parent directories on demand."""
    root = os.path.abspath(data_dir)
    os.makedirs(root, exist_ok=True)

    def _write_partition(rows):
        import os as _os
        import uuid as _uuid

        for row in rows:
            rel, content = row[0], row[1]
            if rel is None:
                continue
            dest = _os.path.abspath(_os.path.join(root, rel))
            if not dest.startswith(root + _os.sep):
                # a hostile URL path (e.g. "..%2f" decoded upstream) must
                # never escape the mirror root; the reference gets the
                # same guarantee from Path.GetFullPath + dot-segment
                # rejection (Downloader.cs:275-277, PathFormatter.cs:17-20)
                raise ValueError(f"mirror path escapes data dir: {rel!r}")
            _os.makedirs(_os.path.dirname(dest), exist_ok=True)
            data = content if isinstance(content, (bytes, bytearray)) else str(content).encode("utf-8")
            tmp = dest + f".__tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(data)
            _os.replace(tmp, dest)

    df.select(path_col, content_col).foreachPartition(_write_partition)
