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


def _chunked_pieces(arr: np.ndarray, chunk_rows: int, deflate: bool):
    """(layout_msg_body_maker, filter_msg, [(key_offsets, blob)]) for a
    v1-chunk-B-tree chunked dataset, optionally deflate-compressed."""
    import zlib

    rank = arr.ndim
    chunk_dims = (min(chunk_rows, arr.shape[0]),) + arr.shape[1:]
    chunks = []
    for s in range(0, arr.shape[0], chunk_dims[0]):
        block = np.zeros(chunk_dims, dtype=arr.dtype)
        part = arr[s : s + chunk_dims[0]]
        block[: part.shape[0]] = part
        raw = block.tobytes()
        if deflate:
            raw = zlib.compress(raw, 6)
        offsets = (s,) + (0,) * (rank - 1)
        chunks.append((offsets, raw))
    filt = b""
    if deflate:
        # filter pipeline v1: deflate (id 1), one client value (level)
        name = _pad8(b"deflate\x00")
        filt = struct.pack("<BB6x", 1, 1) + struct.pack(
            "<HHHH", 1, len(name), 1, 1
        ) + name + struct.pack("<II", 6, 0)  # cd + even-pad
    def layout_body(btree_addr: int) -> bytes:
        body = struct.pack("<BBB", 3, 2, rank + 1)
        body += struct.pack("<Q", btree_addr)
        for d in chunk_dims:
            body += struct.pack("<I", d)
        body += struct.pack("<I", arr.dtype.itemsize)
        return body
    return layout_body, filt, chunk_dims, chunks


def write_hdf5(
    path: str,
    datasets: dict[str, np.ndarray],
    chunk_rows: dict[str, int] | None = None,
    deflate: bool = False,
) -> None:
    """``chunk_rows[name]`` switches that dataset to the chunked layout
    (v1 chunk B-tree, one leaf node), with optional deflate."""
    names = list(datasets)
    chunk_rows = chunk_rows or {}

    # ---- local heap data: names at 8-aligned offsets (offset 0 kept
    # for the traditional empty entry) ----
    heap_data = b"\x00" * 8
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += _pad8(n.encode() + b"\x00")
    heap_data = _pad8(heap_data)

    # per-dataset pieces: chunked datasets carry a layout-body maker,
    # filter message, chunk dims and compressed blobs
    pieces = {
        n: (
            _chunked_pieces(datasets[n], chunk_rows[n], deflate)
            if n in chunk_rows
            else None
        )
        for n in names
    }

    # ---- dataset object headers (layout address patched later) ----
    def ds_header(n: str, data_addr: int) -> bytes:
        arr = datasets[n]
        msgs = [
            _message(0x0001, _dataspace_message(arr.shape)),
            _message(0x0003, _datatype_message(arr.dtype)),
        ]
        if pieces[n] is not None:
            layout_body, filt, _, _ = pieces[n]
            if filt:
                msgs.append(_message(0x000B, filt))
            msgs.append(_message(0x0008, layout_body(data_addr)))
        else:
            msgs.append(
                _message(0x0008, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes))
            )
        return _object_header(msgs)

    def chunk_btree(n: str, chunk_addrs: list[int]) -> bytes:
        """One leaf node (type 1) of the raw-data chunk B-tree."""
        arr = datasets[n]
        _, _, _, chunks = pieces[n]
        key_rank = arr.ndim + 1
        node = b"TREE" + struct.pack("<BBH", 1, 0, len(chunks))
        node += struct.pack("<QQ", UNDEF, UNDEF)
        for (offsets, blob), addr in zip(chunks, chunk_addrs):
            node += struct.pack("<II", len(blob), 0)
            for o in offsets:
                node += struct.pack("<Q", o)
            node += struct.pack("<Q", 0)  # element-dim offset
            node += struct.pack("<Q", addr)
        # final key (one past the end)
        node += struct.pack("<II", 0, 0) + b"\x00" * (8 * key_rank)
        return node

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
    probe = {n: ds_header(n, 0) for n in names}
    for n in names:
        ds_header_addr[n] = pos
        pos += len(probe[n])
    data_addr = {}       # contiguous: raw addr; chunked: btree addr
    chunk_addrs = {}     # chunked: per-chunk blob addresses
    for n in names:
        if pieces[n] is None:
            data_addr[n] = pos
            pos += datasets[n].nbytes
        else:
            _, _, _, chunks = pieces[n]
            data_addr[n] = pos
            pos += len(chunk_btree(n, [0] * len(chunks)))
            chunk_addrs[n] = []
            for _, blob in chunks:
                chunk_addrs[n].append(pos)
                pos += len(blob)
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
        out += ds_header(n, data_addr[n])
    for n in names:
        if pieces[n] is None:
            arr = np.ascontiguousarray(datasets[n])
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("<"))
            out += arr.tobytes()
        else:
            out += chunk_btree(n, chunk_addrs[n])
            for _, blob in pieces[n][3]:
                out += blob
    assert len(out) == eof
    with open(path, "wb") as f:
        f.write(bytes(out))
