"""Minimal BAM input reader (BGZF + record decode).

The reference accepts .bam read files via pysam (vacmap:439-471),
re-reverse-complementing reverse-strand records.  This native reader
yields (name, seq, qual) in original read orientation the same way.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional, Tuple

from ..seq import revcomp

_SEQ_CHARS = "=ACMGRSVTWYHKDBN"
_CIGAR_OPS = "MIDNSHP=X"


def _bgzf_blocks(path: str) -> Iterator[bytes]:
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    n = len(data)
    while off < n:
        if data[off : off + 2] != b"\x1f\x8b":
            raise ValueError("not a BGZF stream")
        xlen = struct.unpack("<H", data[off + 10 : off + 12])[0]
        extra = data[off + 12 : off + 12 + xlen]
        bsize = None
        e = 0
        while e < len(extra):
            si1, si2, slen = extra[e], extra[e + 1], struct.unpack("<H", extra[e + 2 : e + 4])[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack("<H", extra[e + 4 : e + 6])[0] + 1
            e += 4 + slen
        if bsize is None:
            raise ValueError("missing BC subfield (not BGZF)")
        cdata = data[off + 12 + xlen : off + bsize - 8]
        out = zlib.decompress(cdata, -15)
        if out:
            yield out
        off += bsize


def read_bam(
    path: str, keep_secondary: bool = False
) -> Iterator[Tuple[str, str, Optional[str]]]:
    """Yield (name, seq, qual) per primary record, reverse-complemented
    back to original read orientation when the record is reverse-strand."""
    stream = b"".join(_bgzf_blocks(path))
    if stream[:4] != b"BAM\x01":
        raise ValueError("not a BAM file")
    l_text = struct.unpack("<i", stream[4:8])[0]
    off = 8 + l_text
    n_ref = struct.unpack("<i", stream[off : off + 4])[0]
    off += 4
    for _ in range(n_ref):
        l_name = struct.unpack("<i", stream[off : off + 4])[0]
        off += 4 + l_name + 4
    n = len(stream)
    while off + 4 <= n:
        block_size = struct.unpack("<i", stream[off : off + 4])[0]
        off += 4
        rec = stream[off : off + block_size]
        off += block_size
        if len(rec) < 32:
            break
        (
            _refid, _pos, l_read_name, _mapq, _bin, n_cigar, flag, l_seq,
            _nref2, _npos, _tlen,
        ) = struct.unpack("<iiBBHHHiiii", rec[:32])
        p = 32
        name = rec[p : p + l_read_name - 1].decode()
        p += l_read_name
        p += 4 * n_cigar
        if flag & 0x100 or flag & 0x800:
            if not keep_secondary:
                continue
        if l_seq == 0:
            continue
        nbytes = (l_seq + 1) // 2
        seq_packed = rec[p : p + nbytes]
        p += nbytes
        qual_raw = rec[p : p + l_seq]
        chars = []
        for b in seq_packed:
            chars.append(_SEQ_CHARS[b >> 4])
            chars.append(_SEQ_CHARS[b & 0xF])
        seq = "".join(chars[:l_seq])
        qual = None
        if qual_raw and qual_raw[0] != 0xFF:
            qual = "".join(chr(q + 33) for q in qual_raw)
        if flag & 0x10:  # reverse strand: restore original orientation
            seq = revcomp(seq)
            if qual is not None:
                qual = qual[::-1]
        yield name, seq, qual
