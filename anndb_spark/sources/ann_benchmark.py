"""ann-benchmarks HDF5 source — the reference's benchmark input format.

Parity target: `/root/reference/cmd/benchmark/ann-benchmark/main.go:23-99`
(`loadHdf5Dataset` reads the `train`, `test` and `neighbors` matrices
from an ann-benchmarks file; dims 100/128/784).

Spark-first shape: HDF5 is not splittable and the h5 libraries are
driver-only, so the scalable pattern is *convert once, scan forever*:

    hdf5 --(driver, chunked)--> parquet --> spark.read.parquet

`ann_benchmark_to_parquet` streams the matrices in bounded row chunks
(driver memory is O(chunk), never O(file)) into parquet; every later
read is a parallel, column-pruned, predicate-pushed scan.  The vectors
are stored as ARRAY<FLOAT> — float32 like the source data, halving
vector I/O vs double on the scan path; operators up-cast per use.

h5py is not installed in this container; the decode step therefore
falls back to the vendored pure-Python reader (`sources/hdf5lite.py`,
written against the public HDF5 File Format Specification) which
covers the exact corner ann-benchmarks files occupy: v0 superblock,
root-level contiguous/chunked numeric datasets, deflate/shuffle
filters.  h5py is preferred when present (same API, broader format
coverage).  Chunked conversion stays O(chunk) driver memory on both
paths: hdf5lite row-slices contiguous data through mmap and, for
chunked layouts, decodes only the HDF5 chunks overlapping the
requested row range.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "matrix_to_df",
    "neighbors_to_df",
    "ann_benchmark_to_parquet",
    "read_ann_benchmark",
]

TRAIN_SCHEMA = "id BIGINT, vector ARRAY<FLOAT>"
TEST_SCHEMA = "query_id BIGINT, query_vector ARRAY<FLOAT>"
NEIGHBORS_SCHEMA = "query_id BIGINT, rank INT, id BIGINT"


class _Hdf5File:
    """h5py.File-compatible shim over the vendored pure-Python reader
    (indexable datasets with .shape, row-slice reads)."""

    class _DS:
        def __init__(self, path: str, name: str, shape: tuple[int, ...]):
            self._path, self._name, self.shape = path, name, shape

        def __getitem__(self, key):
            from anndb_spark.sources import hdf5lite

            if isinstance(key, slice):
                if key.step not in (None, 1):
                    # h5py would stride; silently returning unstrided
                    # rows is a wrong-data trap (ADVICE r8)
                    raise TypeError(
                        f"strided slices unsupported (step={key.step})"
                    )
                return hdf5lite.read_dataset(
                    self._path, self._name, key.start, key.stop
                )
            if key == ():
                return hdf5lite.read_dataset(self._path, self._name)
            raise TypeError(f"unsupported index {key!r}")

    def __init__(self, path: str, mode: str = "r"):
        from anndb_spark.sources import hdf5lite

        if mode != "r":
            raise ValueError("hdf5lite shim is read-only")
        self._path = path
        self._meta = hdf5lite.list_datasets(path)

    def __getitem__(self, name: str) -> "_Hdf5File._DS":
        return self._DS(self._path, name, self._meta[name][0])

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _h5py():
    """h5py when installed, else the vendored hdf5lite shim (exposes
    the one sliver of the h5py API this module uses: File(path, 'r'),
    f[name].shape, f[name][a:b], f[name][()])."""
    try:
        import h5py  # noqa: PLC0415

        return h5py
    except ImportError:

        class _Shim:
            File = _Hdf5File

        return _Shim()


def matrix_to_df(
    spark: SparkSession,
    mat: np.ndarray,
    kind: str = "train",
    id_offset: int = 0,
) -> DataFrame:
    """(rows × dim) float matrix → (id, vector) rows; ids are the row
    index (+offset for chunked conversion), matching the reference's
    implicit row-index ids (`main.go:83-99` indexes results by row)."""
    schema = TRAIN_SCHEMA if kind == "train" else TEST_SCHEMA
    mat = np.asarray(mat, dtype=np.float32)
    rows = [(id_offset + i, mat[i].tolist()) for i in range(mat.shape[0])]
    return spark.createDataFrame(rows, schema)


def neighbors_to_df(
    spark: SparkSession, neigh: np.ndarray, id_offset: int = 0
) -> DataFrame:
    """(queries × k) int matrix of ground-truth ids → long-form
    (query_id, rank, id), rank 1-based ascending — joinable against our
    kNN result contract for recall (`operators/recall.py`)."""
    neigh = np.asarray(neigh, dtype=np.int64)
    rows = [
        (id_offset + q, r + 1, int(neigh[q, r]))
        for q in range(neigh.shape[0])
        for r in range(neigh.shape[1])
    ]
    return spark.createDataFrame(rows, NEIGHBORS_SCHEMA)


def ann_benchmark_to_parquet(
    spark: SparkSession,
    h5_path: str,
    out_dir: str,
    chunk_rows: int = 50_000,
) -> dict[str, int]:
    """One-time HDF5 → parquet conversion, chunked so driver memory is
    bounded by ``chunk_rows·dim`` floats regardless of file size.

    Writes ``{out_dir}/{train,test,neighbors}.parquet``; returns row
    counts per part.  Requires h5py (import-gated).
    """
    h5py = _h5py()
    counts: dict[str, int] = {}
    with h5py.File(h5_path, "r") as f:
        for part in ("train", "test", "neighbors"):
            ds = f[part]
            n = ds.shape[0]
            counts[part] = n
            for start in range(0, n, chunk_rows):
                chunk = ds[start : start + chunk_rows]
                if part == "neighbors":
                    df = neighbors_to_df(spark, chunk, id_offset=start)
                else:
                    df = matrix_to_df(spark, chunk, part, id_offset=start)
                mode = "overwrite" if start == 0 else "append"
                df.write.mode(mode).parquet(f"{out_dir}/{part}.parquet")
    return counts


def read_ann_benchmark(spark: SparkSession, path: str, part: str = "train") -> DataFrame:
    """Read one part of an ann-benchmarks dataset.

    ``path`` may be a converted parquet directory (the scale path) or a
    raw ``.hdf5`` file (driver-side decode via h5py, small data only).
    """
    if part not in ("train", "test", "neighbors"):
        raise ValueError(f"unknown part {part!r}")
    if path.endswith((".hdf5", ".h5")):
        h5py = _h5py()
        with h5py.File(path, "r") as f:
            mat = f[part][()]
        if part == "neighbors":
            return neighbors_to_df(spark, mat)
        return matrix_to_df(spark, mat, part)
    return spark.read.parquet(f"{path}/{part}.parquet")
