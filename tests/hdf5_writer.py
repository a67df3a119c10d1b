"""Tiny HDF5 writer used ONLY by tests, assembled byte-by-byte from
the public HDF5 File Format Specification (the same document
sources/hdf5lite.py reads by).  Two emission modes:

* ``superblock=0`` (default) — the shape h5py's ``libver='earliest'``
  defaults produce for an ann-benchmarks file: v0 superblock, root
  group with a single-level v1 B-tree + local heap + one SNOD, v1
  dataset object headers.
* ``superblock=2`` / ``3`` — the ``libver='latest'`` shape: v2/v3
  superblock pointing straight at a v2 ("OHDR") root object header
  whose hard-link messages name the datasets; dataset headers are v2
  too.

Layouts: contiguous (default) and chunked (``chunk_rows``, v1 chunk
B-tree) with optional ``deflate`` and/or ``shuffle`` filters (applied
in h5py's order: shuffle then deflate).  ``data_gap`` pushes the raw
data section to at least that file offset and writes the file
SPARSELY — a cheap mock of >2 GiB addresses without 2 GiB on disk.

Kept separate from the library on purpose: the engine only ever READS
ann-benchmarks files; this exists so the reader can be exercised in a
container that has no h5py to create fixtures with.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _message_v1(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _message_v2(mtype: int, body: bytes) -> bytes:
    return struct.pack("<BHB", mtype, len(body), 0) + body


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


def _object_header_v1(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def _object_header_v2(message_parts: list[tuple[int, bytes]]) -> bytes:
    """OHDR: flags=0x01 (2-byte chunk size, no times/attrs/creation
    order), messages, 4-byte checksum (unverified by the reader but
    present per spec)."""
    blob = b"".join(_message_v2(t, b) for t, b in message_parts)
    return (
        b"OHDR"
        + bytes([2, 0x01])
        + struct.pack("<H", len(blob))
        + blob
        + b"\x00\x00\x00\x00"
    )


def _link_message(name: str, hdr_addr: int) -> bytes:
    # version 1, flags 0: hard link, 1-byte name length
    nb = name.encode()
    return bytes([1, 0, len(nb)]) + nb + struct.pack("<Q", hdr_addr)


def _shuffle_bytes(raw: bytes, width: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8)
    return a.reshape(len(raw) // width, width).T.tobytes()


def _filter_pipeline(deflate: bool, shuffle: bool, itemsize: int) -> bytes:
    """Filter pipeline message v1, filters in APPLICATION order
    (shuffle first, deflate second — h5py's order)."""
    entries = []
    if shuffle:
        name = _pad8(b"shuffle\x00")
        entries.append(
            struct.pack("<HHHH", 2, len(name), 1, 1)
            + name
            + struct.pack("<II", itemsize, 0)  # cd + odd-count pad
        )
    if deflate:
        name = _pad8(b"deflate\x00")
        entries.append(
            struct.pack("<HHHH", 1, len(name), 1, 1)
            + name
            + struct.pack("<II", 6, 0)
        )
    if not entries:
        return b""
    return struct.pack("<BB6x", 1, len(entries)) + b"".join(entries)


def _chunked_pieces(
    arr: np.ndarray, chunk_rows: int, deflate: bool, shuffle: bool
):
    """(layout_msg_body_maker, filter_msg, chunk_dims, [(offsets, blob)])
    for a v1-chunk-B-tree chunked dataset."""
    rank = arr.ndim
    chunk_dims = (min(chunk_rows, arr.shape[0]),) + arr.shape[1:]
    chunks = []
    for s in range(0, arr.shape[0], chunk_dims[0]):
        block = np.zeros(chunk_dims, dtype=arr.dtype)
        part = arr[s : s + chunk_dims[0]]
        block[: part.shape[0]] = part
        raw = block.tobytes()
        if shuffle:
            raw = _shuffle_bytes(raw, arr.dtype.itemsize)
        if deflate:
            raw = zlib.compress(raw, 6)
        offsets = (s,) + (0,) * (rank - 1)
        chunks.append((offsets, raw))
    filt = _filter_pipeline(deflate, shuffle, arr.dtype.itemsize)

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
    shuffle: bool = False,
    superblock: int = 0,
    data_gap: int = 0,
) -> None:
    """``chunk_rows[name]`` switches that dataset to the chunked layout
    (v1 chunk B-tree, one leaf node) with optional deflate/shuffle.
    ``superblock`` picks the v0 (symbol-table) or v2/v3 (link-message)
    file shape.  ``data_gap`` forces the raw-data section to start at
    >= that offset, writing the hole sparsely."""
    if superblock not in (0, 2, 3):
        raise ValueError("superblock must be 0, 2 or 3")
    names = list(datasets)
    chunk_rows = chunk_rows or {}
    v2 = superblock >= 2

    pieces = {
        n: (
            _chunked_pieces(datasets[n], chunk_rows[n], deflate, shuffle)
            if n in chunk_rows
            else None
        )
        for n in names
    }

    # ---- dataset object headers (layout address patched later) ----
    def ds_header(n: str, data_addr: int) -> bytes:
        arr = datasets[n]
        parts = [
            (0x0001, _dataspace_message(arr.shape)),
            (0x0003, _datatype_message(arr.dtype)),
        ]
        if pieces[n] is not None:
            layout_body, filt, _, _ = pieces[n]
            if filt:
                parts.append((0x000B, filt))
            parts.append((0x0008, layout_body(data_addr)))
        else:
            parts.append(
                (0x0008, struct.pack("<BBQQ", 3, 1, data_addr, arr.nbytes))
            )
        if v2:
            return _object_header_v2(parts)
        return _object_header_v1([_message_v1(t, b) for t, b in parts])

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

    # ---- layout ----
    if v2:
        superblock_size = 48
        pos = superblock_size
        # root header size depends only on name lengths, not addresses
        probe_root = _object_header_v2(
            [(0x0006, _link_message(n, 0)) for n in names]
        )
        root_header_addr = pos
        pos += len(probe_root)
    else:
        superblock_size = 96
        heap_data = b"\x00" * 8
        name_off = {}
        for n in names:
            name_off[n] = len(heap_data)
            heap_data += _pad8(n.encode() + b"\x00")
        heap_data = _pad8(heap_data)
        heap_header_size = 32
        btree_size = 8 + 16 + 8 + 8 + 8
        snod_size = 8 + 40 * len(names)
        pos = superblock_size
        root_header_addr = pos
        pos += len(
            _object_header_v1([_message_v1(0x0011, struct.pack("<QQ", 0, 0))])
        )
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
    pos = max(pos, data_gap)  # sparse hole before the data section
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

    # ---- assemble the metadata segment ----
    out = bytearray()
    out += b"\x89HDF\r\n\x1a\n"
    if v2:
        out += bytes([superblock, 8, 8, 0])
        out += struct.pack("<QQQQ", 0, UNDEF, eof, root_header_addr)
        out += b"\x00\x00\x00\x00"  # checksum (unverified)
        assert len(out) == superblock_size
        out += _object_header_v2(
            [(0x0006, _link_message(n, ds_header_addr[n])) for n in names]
        )
    else:
        out += bytes([0, 0, 0, 0, 0, 8, 8, 0])
        out += struct.pack("<HHI", 4, 16, 0)  # leaf k, internal k, flags
        out += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        out += struct.pack(
            "<QQI4xQQ", 0, root_header_addr, 1, btree_addr, heap_addr
        )
        assert len(out) == superblock_size
        out += _object_header_v1(
            [_message_v1(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
        )
        out += b"HEAP" + struct.pack(
            "<B3xQQQ", 0, len(heap_data), UNDEF, heap_data_addr
        )
        out += heap_data
        out += b"TREE" + struct.pack("<BBH", 0, 0, 1)
        out += struct.pack("<QQ", UNDEF, UNDEF)
        out += struct.pack("<Q", 0)  # key 0
        out += struct.pack("<Q", snod_addr)
        out += struct.pack("<Q", name_off[sorted(names)[-1]])  # key 1
        out += b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
        for n in sorted(names):
            out += struct.pack("<QQI4x16x", name_off[n], ds_header_addr[n], 0)
    for n in names:
        out += ds_header(n, data_addr[n])

    # ---- data segments, written sparsely past any gap ----
    segments = [(0, bytes(out))]
    for n in names:
        if pieces[n] is None:
            arr = np.ascontiguousarray(datasets[n])
            if arr.dtype.byteorder == ">":
                arr = arr.astype(arr.dtype.newbyteorder("<"))
            segments.append((data_addr[n], arr.tobytes()))
        else:
            segments.append((data_addr[n], chunk_btree(n, chunk_addrs[n])))
            for (_, blob), addr in zip(pieces[n][3], chunk_addrs[n]):
                segments.append((addr, blob))
    with open(path, "wb") as f:
        for addr, blob in segments:
            f.seek(addr)
            f.write(blob)
        f.truncate(eof)
