"""Posting-list codec: delta + varint + fixed-size blocks with
block-max metadata (SURVEY §2.4 E7; Lucene postings-format semantics
re-expressed, not ported).

All encode/decode is numpy-vectorized — this runs inside Arrow-batched
``applyInPandas`` workers over potentially millions of postings for hot
terms, so no per-value Python loops.

Block layout (one logical posting list = ordered blocks):
  - ``doc_bytes``: varint-encoded doc gaps; first value is the gap from
    ``first_doc`` (i.e. 0 for the first doc), so a block is decodable
    standalone given ``first_doc``.
  - ``tf_bytes``: varint term frequencies, same order.
  - ``pos_bytes`` (optional): per-doc delta-encoded positions,
    concatenated (tf values give the per-doc counts).
  - metadata: ``first_doc, last_doc, n_docs, max_tf, max_tfnorm`` —
    skip + block-max data for WAND.
"""

from __future__ import annotations

import numpy as np

BLOCK_DOCS = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array, vectorized."""
    v = values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp = tmp >> np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | more
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a varint byte string to uint64, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    vals = np.zeros(len(ends), dtype=np.uint64)
    lengths = ends - starts + 1
    maxb = int(lengths.max())
    for k in range(maxb):
        mask = lengths > k
        vals[mask] |= (raw[starts[mask] + k].astype(np.uint64)
                       & np.uint64(0x7F)) << np.uint64(7 * k)
    if count is not None:
        assert len(vals) == count, (len(vals), count)
    return vals


def encode_positions(positions_concat: np.ndarray, tfs: np.ndarray) -> bytes:
    """Delta-encode per-doc position lists (concatenated, lengths=tfs)."""
    if len(positions_concat) == 0:
        return b""
    p = positions_concat.astype(np.int64, copy=False)
    deltas = np.diff(p, prepend=0)
    # reset the delta chain at each doc boundary
    starts = np.cumsum(tfs)[:-1].astype(np.int64)
    if len(starts):
        deltas[starts] = p[starts] - 0  # absolute first position per doc
    deltas[0] = p[0]
    return varint_encode(deltas.astype(np.uint64))


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions; returns the concatenated positions."""
    deltas = varint_decode(buf).astype(np.int64)
    if len(deltas) == 0:
        return deltas
    boundaries = np.zeros(len(deltas), dtype=bool)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1].astype(np.int64)))
    boundaries[starts] = True
    # cumulative sum within each doc's run
    out = np.empty(len(deltas), dtype=np.int64)
    acc = np.cumsum(deltas)
    base = np.zeros(len(deltas), dtype=np.int64)
    base[starts[1:]] = acc[starts[1:] - 1]
    np.maximum.accumulate(base, out=base)
    out = acc - base
    # positions are absolute at doc starts already (delta chain reset)
    return out


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray,
                  tfnorms: np.ndarray | None = None,
                  positions_concat: np.ndarray | None = None,
                  dls: np.ndarray | None = None,
                  block_docs: int = BLOCK_DOCS) -> list[dict]:
    """Split one term's sorted postings into encoded blocks.

    ``doc_ids`` must be sorted ascending and unique. ``dls`` (per-doc
    length) is embedded per posting (Lucene colocates norms with
    segments the same way) so query workers score without a docstats
    join. Returns a list of dicts matching the segment schema.
    """
    n = len(doc_ids)
    if n == 0:
        return []
    doc_ids = doc_ids.astype(np.int64, copy=False)
    tfs64 = tfs.astype(np.uint64, copy=False)
    out = []
    pos_offsets = None
    if positions_concat is not None:
        pos_offsets = np.concatenate(([0], np.cumsum(tfs.astype(np.int64))))
    for b0 in range(0, n, block_docs):
        b1 = min(b0 + block_docs, n)
        docs = doc_ids[b0:b1]
        gaps = np.diff(docs, prepend=docs[0]).astype(np.uint64)
        block_tfs = tfs64[b0:b1]
        rec = {
            "first_doc": int(docs[0]),
            "last_doc": int(docs[-1]),
            "n_docs": int(b1 - b0),
            "max_tf": int(block_tfs.max()),
            "sum_tf": int(block_tfs.sum()),
            "max_tfnorm": float(tfnorms[b0:b1].max()) if tfnorms is not None else 0.0,
            "doc_bytes": varint_encode(gaps),
            "tf_bytes": varint_encode(block_tfs),
            "dl_bytes": (varint_encode(dls[b0:b1].astype(np.uint64))
                         if dls is not None else b""),
            "pos_bytes": None,
        }
        if positions_concat is not None:
            seg = positions_concat[pos_offsets[b0]:pos_offsets[b1]]
            rec["pos_bytes"] = encode_positions(
                np.asarray(seg), tfs[b0:b1].astype(np.int64))
        out.append(rec)
    return out


def decode_block(first_doc: int, doc_bytes: bytes, tf_bytes: bytes,
                 n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids int64, tfs int64)."""
    gaps = varint_decode(doc_bytes, n_docs).astype(np.int64)
    docs = np.cumsum(gaps) + first_doc
    tfs = varint_decode(tf_bytes, n_docs).astype(np.int64)
    return docs, tfs
