"""ORC data source (reference loader parity: loader.py accepts ORC paths).

Ray Data ships no ``read_orc``, so this integrates ``pyarrow.orc`` through
``FileBasedDatasource``: files stream stripe by stripe (one Arrow table per
stripe — the natural block boundary), with optional column projection pushed
into the stripe reader like Parquet column pruning.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.datasource import FileBasedDatasource


class ORCDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["orc"]

    def __init__(self, paths, columns: list[str] | None = None, **kwargs):
        super().__init__(paths, **kwargs)
        self._columns = columns

    def _read_stream(self, f: "pa.NativeFile", path: str):
        import pyarrow.orc as orc

        # ORC footers need random access; the handed-in stream may not be
        # seekable, so reopen the path through the datasource's filesystem
        try:
            f.seek(0)
            reader = orc.ORCFile(f)
        except (OSError, pa.lib.ArrowInvalid, pa.lib.ArrowNotImplementedError):
            reader = orc.ORCFile(self._filesystem.open_input_file(path))
        for i in range(reader.nstripes):
            batch = reader.read_stripe(i, columns=self._columns)
            if isinstance(batch, pa.Table):
                yield batch
            else:
                yield pa.Table.from_batches([batch])


def read_orc_source(
    paths, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """Read ORC file(s) as a Dataset; ``columns`` prunes at the stripe read."""
    return ray.data.read_datasource(ORCDatasource(paths, columns=columns), **kwargs)


def write_orc(table: pa.Table, path: str) -> str:
    import pyarrow.orc as orc

    orc.write_table(table, path)
    return path
