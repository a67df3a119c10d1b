"""An HDF5 v0 fixture assembled field-by-field from the published file
format spec, in this module, sharing NO code or layout decisions with
tests/hdf5_writer.py — the committed binary is pinned byte-for-byte.

PROVENANCE (honest): this container has no external HDF5 toolchain (no
h5py, no libhdf5, no network), so a truly third-party-produced file is
not obtainable here; FIXTURES.md records that residual.  What this
fixture DOES close: every layout freedom where hdf5_writer.py happens
to mirror libhdf5 is exercised with a DIFFERENT legal choice, so a
reader that only round-trips the writer's shapes fails here:

  * two SNOD leaf nodes under a 2-entry group B-tree (writer: one)
  * heap data segment detached from its header, names at nonzero
    offsets behind a real free block (writer: adjacent, offset 0)
  * root object header LAST in the file (writer: first)
  * metadata/data interleaved; one dataset's raw data at an ODD offset
  * NIL and unknown (attribute, 0x000C) messages the reader must skip
  * dataspace v1 with the maxdims flag set
  * datatype messages carrying full IEEE property fields
  * filter pipeline v1 with NAMED filters (nlen > 0) and odd-ncd pads
  * chunk B-tree entries whose blobs sit in REVERSE file order, one
    chunk with a nonzero filter mask (deflate skipped), and a partial
    final chunk stored full-size per the spec
"""

import os
import struct
import zlib

import numpy as np
import pytest

from anndb_spark.sources import hdf5lite

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "hdf5", "independent_v0.hdf5"
)

UNDEF = 0xFFFFFFFFFFFFFFFF

DISTANCES = np.array(
    [0.5, -1.25, 3.0, 7.75, -0.125, 2.5, 9.0], dtype="<f8"
)
NEIGHBORS = (np.arange(12, dtype="<i4") * 7 - 20).reshape(4, 3)
TRAIN = (np.arange(40, dtype="<f4") * 0.25 - 3.0).reshape(10, 4)


def _msg_v1(mtype: int, body: bytes) -> bytes:
    if len(body) % 8:
        body += b"\x00" * (8 - len(body) % 8)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header_v1(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    # prefix: version, reserved, nmsgs, refcount, header size, 4-pad
    return struct.pack("<BBHII4x", 1, 0, len(messages), 1, len(blob)) + blob


def _dataspace_v1(shape, maxdims: bool) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 1 if maxdims else 0)
    body += b"".join(struct.pack("<Q", d) for d in shape)
    if maxdims:
        body += b"".join(struct.pack("<Q", d) for d in shape)
    return body


def _dt_float(size: int) -> bytes:
    # class 1 (float) v1, LE; full IEEE property fields like libhdf5
    exp_loc, exp_sz, man_sz, bias = (
        (52, 11, 52, 1023) if size == 8 else (23, 8, 23, 127)
    )
    return struct.pack(
        "<BBBBIHHBBBBI",
        0x11, 0x20, 8 * size - 1, 0, size,
        0, 8 * size, exp_loc, exp_sz, 0, man_sz, bias,
    )


def _dt_int32_signed() -> bytes:
    return struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 4, 0, 32)


def _shuffle(raw: bytes, width: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, width)
    return a.T.tobytes()


def assemble() -> bytes:
    names = {"distances": 16, "neighbors": 26, "train": 36}

    # chunked 'train': 4-row × 4-col chunks; final chunk stored FULL
    # (spec: edge chunks keep the chunk size, fill past the edge)
    full = np.zeros((12, 4), dtype="<f4")
    full[:10] = TRAIN
    blobs, masks = [], [0, 0b10, 0]  # chunk 1: deflate skipped
    for ci in range(3):
        raw = _shuffle(full[4 * ci : 4 * ci + 4].tobytes(), 4)
        blobs.append(raw if masks[ci] & 0b10 else zlib.compress(raw, 6))

    # ---- sizes-first layout (sections in a deliberately odd order) ----
    snod1 = struct.pack("<4sBBH", b"SNOD", 1, 0, 2) + b"".join(
        struct.pack("<QQII16x", names[n], 0, 0, 0)
        for n in ("distances", "neighbors")
    )
    snod2 = struct.pack("<4sBBH", b"SNOD", 1, 0, 1) + struct.pack(
        "<QQII16x", names["train"], 0, 0, 0
    )

    pos = 96
    snod1_at = pos
    pos += len(snod1)
    snod2_at = pos
    pos += len(snod2)
    pos += 1  # force an ODD raw-data offset
    dist_data_at = pos
    pos += DISTANCES.nbytes

    def ds_hdr_distances() -> bytes:
        return _object_header_v1([
            _msg_v1(0x0001, _dataspace_v1(DISTANCES.shape, False)),
            _msg_v1(0x0003, _dt_float(8)),
            _msg_v1(0x0008, struct.pack(
                "<BBQQ", 3, 1, dist_data_at, DISTANCES.nbytes)),
        ])

    dist_hdr_at = pos
    pos += len(ds_hdr_distances())
    nbr_data_at = pos
    pos += NEIGHBORS.nbytes

    def ds_hdr_neighbors() -> bytes:
        return _object_header_v1([
            _msg_v1(0x0000, b"\x00" * 8),  # NIL: must be skipped
            _msg_v1(0x0001, _dataspace_v1(NEIGHBORS.shape, True)),
            _msg_v1(0x0003, _dt_int32_signed()),
            _msg_v1(0x000C, b"\x07" * 24),  # attribute-ish: skipped
            _msg_v1(0x0008, struct.pack(
                "<BBQQ", 3, 1, nbr_data_at, NEIGHBORS.nbytes)),
        ])

    nbr_hdr_at = pos
    pos += len(ds_hdr_neighbors())

    chunk_at = []
    for blob in reversed(blobs):  # blobs land in REVERSE file order
        chunk_at.append(pos)
        pos += len(blob)
    chunk_at = list(reversed(chunk_at))

    def chunk_btree() -> bytes:
        node = struct.pack("<4sBBHQQ", b"TREE", 1, 0, 3, UNDEF, UNDEF)
        for ci in range(3):
            node += struct.pack("<II", len(blobs[ci]), masks[ci])
            node += struct.pack("<QQQ", 4 * ci, 0, 0)
            node += struct.pack("<Q", chunk_at[ci])
        node += struct.pack("<II", 0, 0) + struct.pack("<QQQ", 12, 0, 0)
        return node

    cbtree_at = pos
    pos += len(chunk_btree())

    def filter_pipeline() -> bytes:
        body = struct.pack("<BB2x4x", 1, 2)
        for fid, flags, name, cd in (
            (2, 0, b"shuffle\x00", 4),   # applied first
            (1, 1, b"deflate\x00", 6),   # then deflate (optional)
        ):
            body += struct.pack("<HHHH", fid, len(name), flags, 1)
            body += name + struct.pack("<I", cd) + b"\x00" * 4  # odd-ncd pad
        return body

    def ds_hdr_train() -> bytes:
        return _object_header_v1([
            _msg_v1(0x0001, _dataspace_v1(TRAIN.shape, True)),
            _msg_v1(0x0003, _dt_float(4)),
            _msg_v1(0x000B, filter_pipeline()),
            _msg_v1(0x0008, struct.pack(
                "<BBBQIII", 3, 2, 3, cbtree_at, 4, 4, 4)),
        ])

    train_hdr_at = pos
    pos += len(ds_hdr_train())

    gbtree = struct.pack(
        "<4sBBHQQ", b"TREE", 0, 0, 2, UNDEF, UNDEF
    ) + struct.pack(
        "<QQQQQ",
        names["distances"], snod1_at, names["train"], snod2_at,
        names["train"],
    )
    gbtree_at = pos
    pos += len(gbtree)

    heap_data = (
        struct.pack("<QQ", 1, 16)          # free block: last, 16 bytes
        + b"distances\x00"
        + b"neighbors\x00"
        + b"train\x00"
        + b"\x00" * 6
    )
    assert heap_data[16:26] == b"distances\x00"
    assert heap_data[26:36] == b"neighbors\x00"
    assert heap_data[36:42] == b"train\x00"
    heap_hdr_at = pos
    pos += 32
    heap_data_at = pos
    pos += len(heap_data)
    heap_hdr = struct.pack(
        "<4sB3xQQQ", b"HEAP", 0, len(heap_data), 0, heap_data_at
    )

    root_hdr = _object_header_v1(
        [_msg_v1(0x0011, struct.pack("<QQ", gbtree_at, heap_hdr_at))]
    )
    root_hdr_at = pos
    pos += len(root_hdr)
    eof = pos

    superblock = (
        b"\x89HDF\r\n\x1a\n"
        + struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        + struct.pack("<QQII", 0, root_hdr_at, 1, 0)
        + struct.pack("<QQ", gbtree_at, heap_hdr_at)  # cached scratch
    )
    assert len(superblock) == 96

    out = bytearray(eof)
    out[0:96] = superblock
    out[snod1_at : snod1_at + len(snod1)] = snod1
    out[snod2_at : snod2_at + len(snod2)] = snod2
    out[dist_data_at : dist_data_at + DISTANCES.nbytes] = DISTANCES.tobytes()
    h = ds_hdr_distances()
    out[dist_hdr_at : dist_hdr_at + len(h)] = h
    out[nbr_data_at : nbr_data_at + NEIGHBORS.nbytes] = NEIGHBORS.tobytes()
    h = ds_hdr_neighbors()
    out[nbr_hdr_at : nbr_hdr_at + len(h)] = h
    for ci in range(3):
        out[chunk_at[ci] : chunk_at[ci] + len(blobs[ci])] = blobs[ci]
    b = chunk_btree()
    out[cbtree_at : cbtree_at + len(b)] = b
    h = ds_hdr_train()
    out[train_hdr_at : train_hdr_at + len(h)] = h
    out[gbtree_at : gbtree_at + len(gbtree)] = gbtree
    out[heap_hdr_at : heap_hdr_at + 32] = heap_hdr
    out[heap_data_at : heap_data_at + len(heap_data)] = heap_data
    out[root_hdr_at : root_hdr_at + len(root_hdr)] = root_hdr

    # fix up SNOD header addresses now that they are known
    def patch_snod(at: int, entries: list[tuple[int, int]]) -> None:
        p = at + 8
        for name_off, hdr in entries:
            out[p : p + 16] = struct.pack("<QQ", name_off, hdr)
            p += 40

    patch_snod(snod1_at, [(names["distances"], dist_hdr_at),
                          (names["neighbors"], nbr_hdr_at)])
    patch_snod(snod2_at, [(names["train"], train_hdr_at)])
    return bytes(out)


def test_committed_fixture_matches_assembly():
    """The checked-in binary IS the assembly output — provenance is
    auditable and any drift in either fails loudly."""
    assert open(FIXTURE, "rb").read() == assemble()


def test_lists_all_datasets_with_shapes_and_dtypes():
    got = hdf5lite.list_datasets(FIXTURE)
    assert got == {
        "distances": ((7,), "float64"),
        "neighbors": ((4, 3), "int32"),
        "train": ((10, 4), "float32"),
    }


def test_full_reads_are_exact():
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(FIXTURE, "distances"), DISTANCES
    )
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(FIXTURE, "neighbors"), NEIGHBORS
    )
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(FIXTURE, "train"), TRAIN
    )


@pytest.mark.parametrize("start,stop", [
    (0, 4), (3, 9), (8, 10), (9, None), (None, 5), (-3, None), (2, -2),
])
def test_chunked_and_contiguous_slices(start, stop):
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(FIXTURE, "train", start, stop),
        TRAIN[start:stop],
    )
    np.testing.assert_array_equal(
        hdf5lite.read_dataset(FIXTURE, "distances", start, stop),
        DISTANCES[start:stop],
    )


def test_ann_benchmark_shim_reads_it():
    from anndb_spark.sources.ann_benchmark import _Hdf5File

    with _Hdf5File(FIXTURE) as f:
        np.testing.assert_array_equal(f["train"][2:7], TRAIN[2:7])
        np.testing.assert_array_equal(f["neighbors"][()], NEIGHBORS)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "wb") as fh:
        fh.write(assemble())
    print(f"wrote {FIXTURE} ({os.path.getsize(FIXTURE)} bytes)")
