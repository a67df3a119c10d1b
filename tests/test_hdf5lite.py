"""Vendored pure-Python HDF5 reader vs the byte-exact spec writer
(tests/hdf5_writer.py): round-trips, slicing, dtype coverage, and the
explicit unsupported-feature gates."""

import numpy as np
import pytest

from anndb_spark.sources import hdf5lite
from tests.hdf5_writer import write_hdf5


@pytest.fixture()
def sample(tmp_path):
    rng = np.random.default_rng(3)
    data = {
        "train": rng.normal(0, 1, (40, 16)).astype(np.float32),
        "test": rng.normal(0, 1, (9, 16)).astype(np.float64),
        "neighbors": rng.integers(0, 40, (9, 10)).astype(np.int32),
        "counts": rng.integers(0, 1000, (13,)).astype(np.int64),
    }
    p = str(tmp_path / "s.hdf5")
    write_hdf5(p, data)
    return p, data


def test_list_datasets(sample):
    p, data = sample
    meta = hdf5lite.list_datasets(p)
    assert meta["train"] == ((40, 16), "float32")
    assert meta["test"] == ((9, 16), "float64")
    assert meta["neighbors"] == ((9, 10), "int32")
    assert meta["counts"] == ((13,), "int64")


def test_read_round_trip(sample):
    p, data = sample
    for name, arr in data.items():
        got = hdf5lite.read_dataset(p, name)
        assert got.dtype == arr.dtype and got.shape == arr.shape
        np.testing.assert_array_equal(got, arr)


def test_row_slice_contiguous(sample):
    p, data = sample
    got = hdf5lite.read_dataset(p, "train", 5, 12)
    np.testing.assert_array_equal(got, data["train"][5:12])
    # out-of-range clamps like numpy
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(p, "train", 35, 99), data["train"][35:]
    )
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(p, "counts", 2, 5), data["counts"][2:5]
    )


def test_missing_dataset_and_bad_file(sample, tmp_path):
    p, _ = sample
    with pytest.raises(KeyError, match="nope"):
        hdf5lite.read_dataset(p, "nope")
    bad = tmp_path / "bad.hdf5"
    bad.write_bytes(b"not an hdf5 file, padded to superblock scan length" * 40)
    with pytest.raises(ValueError):
        hdf5lite.list_datasets(str(bad))


def test_unsupported_feature_is_loud(sample):
    """A file advertising an unknown superblock version must raise the
    typed gate, not misread."""
    p, _ = sample
    raw = bytearray(open(p, "rb").read())
    raw[8] = 9  # superblock version
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".hdf5", delete=False) as f:
        f.write(raw)
    with pytest.raises(hdf5lite.UnsupportedHdf5Feature, match="superblock"):
        hdf5lite.list_datasets(f.name)


def test_chunked_deflate_round_trip(tmp_path):
    """The chunked + deflate path (real ann-benchmarks downloads are
    sometimes compressed): v1 chunk B-tree walk, zlib inflate, partial
    final chunk clamped."""
    rng = np.random.default_rng(8)
    data = {
        "train": rng.normal(0, 1, (37, 12)).astype(np.float32),  # 4 chunks of 10
        "neighbors": rng.integers(0, 37, (11, 5)).astype(np.int32),
    }
    p = str(tmp_path / "chunked.hdf5")
    write_hdf5(p, data, chunk_rows={"train": 10, "neighbors": 4}, deflate=True)
    meta = hdf5lite.list_datasets(p)
    assert meta["train"] == ((37, 12), "float32")
    for name, arr in data.items():
        np.testing.assert_array_equal(hdf5lite.read_dataset(p, name), arr)
    # row slice across a chunk boundary (chunked path decodes then slices)
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(p, "train", 8, 23), data["train"][8:23]
    )


def test_chunked_uncompressed_round_trip(tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 1000, (25, 3)).astype(np.int64)
    p = str(tmp_path / "chunked_plain.hdf5")
    write_hdf5(p, {"counts": arr}, chunk_rows={"counts": 7}, deflate=False)
    np.testing.assert_array_equal(hdf5lite.read_dataset(p, "counts"), arr)
