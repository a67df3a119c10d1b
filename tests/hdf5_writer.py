"""Tiny HDF5 v0 writer used ONLY by tests, assembled byte-by-byte from
the public HDF5 File Format Specification (the same document
sources/hdf5lite.py reads by).  Emits the exact shape h5py's defaults
produce for an ann-benchmarks file: superblock v0, root group with a
single-level v1 B-tree + local heap + one SNOD, v1 dataset object
headers, little-endian int/float datatypes, contiguous layout.

Kept separate from the library on purpose: the engine only ever READS
ann-benchmarks files; this exists so the reader can be exercised in a
container that has no h5py to create fixtures with.
"""

from __future__ import annotations

import struct

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _message(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _datatype_message(dtype: np.dtype) -> bytes:
    dt = np.dtype(dtype)
    if dt.kind == "f":
        cls_ver = (1 << 4) | 1
        sign_loc = dt.itemsize * 8 - 1
        bits = bytes([0x20, sign_loc, 0x00])
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    elif dt.kind in "iu":
        cls_ver = (1 << 4) | 0
        bits = bytes([0x08 if dt.kind == "i" else 0x00, 0x00, 0x00])
        props = struct.pack("<HH", 0, dt.itemsize * 8)
    else:
        raise ValueError(f"unsupported dtype {dt}")
    return bytes([cls_ver]) + bits + struct.pack("<I", dt.itemsize) + props


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    body = struct.pack("<BBB5x", 1, len(shape), 0)
    for d in shape:
        body += struct.pack("<Q", d)
    return body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def write_hdf5(path: str, datasets: dict[str, np.ndarray]) -> None:
    names = list(datasets)

    # ---- local heap data: names at 8-aligned offsets (offset 0 kept
    # for the traditional empty entry) ----
    heap_data = b"\x00" * 8
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode() + b"\x00")
    heap_data = _pad8(heap_data)

    # ---- dataset object headers (layout address patched later) ----
    def ds_header(arr: np.ndarray, data_addr: int) -> bytes:
        layout = struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes)
        return _object_header(
            [
                _message(0x0001, _dataspace_message(arr.shape)),
                _message(0x0003, _datatype_message(arr.dtype)),
                _message(0x0008, layout),
            ]
        )

    # ---- fixed-size pieces to compute the layout ----
    superblock_size = 96
    root_header = _object_header(
        [_message(0x0011, struct.pack("<QQ", 0, 0))]  # patched
    )
    heap_header_size = 32
    btree_size = 8 + 16 + 8 + 8 + 8  # sig+meta, siblings, key0, child0, key1
    snod_size = 8 + 40 * len(names)

    pos = superblock_size
    root_header_addr = pos
    pos += len(root_header)
    heap_addr = pos
    pos += heap_header_size
    heap_data_addr = pos
    pos += len(heap_data)
    btree_addr = pos
    pos += btree_size
    snod_addr = pos
    pos += snod_size

    ds_header_addr = {}
    probe = {n: ds_header(datasets[n], 0) for n in names}
    for n in names:
        ds_header_addr[n] = pos
        pos += len(probe[n])
    data_addr = {}
    for n in names:
        data_addr[n] = pos
        pos += datasets[n].nbytes
    eof = pos

    # ---- assemble ----
    out = bytearray()
    out += b"\x89HDF\r\n\x1a\n"
    out += bytes([0, 0, 0, 0, 0, 8, 8, 0])  # versions + offset/len sizes
    out += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
    out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
    # root symbol table entry: name offset 0, header addr, cache type 1,
    # scratch = (btree, heap)
    out += struct.pack("<QQI4xQQ", 0, root_header_addr, 1, btree_addr, heap_addr)
    assert len(out) == superblock_size

    out += _object_header(
        [_message(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
    )
    out += b"HEAP" + struct.pack(
        "<B3xQQQ", 0, len(heap_data), UNDEF, heap_data_addr
    )
    out += heap_data
    # group B-tree: one leaf pointing at the SNOD
    out += b"TREE" + struct.pack("<BBH", 0, 0, 1)
    out += struct.pack("<QQ", UNDEF, UNDEF)
    out += struct.pack("<Q", 0)  # key 0
    out += struct.pack("<Q", snod_addr)
    out += struct.pack("<Q", name_off[sorted(names)[-1]])  # key 1
    # SNOD: entries must be name-ordered (B-tree invariant)
    out += b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for n in sorted(names):
        out += struct.pack("<QQI4x16x", name_off[n], ds_header_addr[n], 0)
    for n in names:
        out += ds_header(datasets[n], data_addr[n])
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        out += arr.tobytes()
    assert len(out) == eof
    with open(path, "wb") as f:
        f.write(bytes(out))
