"""BAM/BGZF reading and writing — first party, no htslib.

The environment has no pysam (SURVEY.md §7); the reference's alignment
ingest (pysam fetch in target.extract_bam_reads) is replaced by this
module + io.sam. Scope: whole-file streaming decode of BGZF (multi-member
gzip) and the BAM record layout, yielding the same SamRecord objects the
extractor consumes; a minimal writer for fixtures and intermediates.
Random access via BAI is not implemented — targeted-panel BAMs are scanned
linearly, with records grouped per region in one pass (see
read_bam_regions). A C++ BGZF inflate path can slot in underneath without
changing this API (native/).

BAM layout reference: SAM spec v1.6 §4 (magic, reference dictionary, then
per-alignment: block_size, refID, pos, l_read_name, mapq, bin, n_cigar_op,
flag, l_seq, next_refID, next_pos, tlen, name, packed CIGAR, 4-bit seq,
qual).
"""

from __future__ import annotations

import gzip
import struct
import zlib
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

from breakmer_tpu.io.sam import SamRecord

_CIGAR_OPS = "MIDNSHP=X"
_SEQ_NIBBLE = "=ACMGRSVTWYHKDBN"
_NIBBLE_OF = {c: i for i, c in enumerate(_SEQ_NIBBLE)}
_OP_OF = {c: i for i, c in enumerate(_CIGAR_OPS)}

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _bgzf_decompress(path: str | Path) -> bytes:
    """BGZF is a series of gzip members. Native zlib path when the C++
    runtime is built (native/breakmer_native.cc); gzip module fallback."""
    raw = Path(path).read_bytes()
    from breakmer_tpu import native

    out = native.bgzf_inflate(raw)
    if out is not None:
        return out
    return gzip.decompress(raw)


def _bgzf_compress(data: bytes, level: int = 6) -> bytes:
    """Write BGZF blocks (<=64KB payload each) with the BC extra field."""
    out = bytearray()
    MAX = 0xFF00
    for i in range(0, len(data) or 1, MAX):
        chunk = data[i : i + MAX]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        bsize = len(comp) + 25 + 1  # header(12)+extra(6)+deflate+crc(4)+isize(4)
        header = struct.pack(
            "<4BI2BH2BH",
            0x1F, 0x8B, 0x08, 0x04,  # magic, CM=deflate, FLG.FEXTRA
            0,                        # MTIME
            0, 0xFF,                  # XFL, OS
            6,                        # XLEN
            0x42, 0x43,               # 'B','C'
            2,                        # SLEN
        ) + struct.pack("<H", bsize - 1)
        out += header + comp + struct.pack("<II", zlib.crc32(chunk), len(chunk))
    out += BGZF_EOF
    return bytes(out)


class BamReader:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        data = _bgzf_decompress(path)
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file (bad magic)")
        l_text = struct.unpack_from("<i", data, 4)[0]
        off = 8 + l_text
        self.header_text = data[8 : 8 + l_text].rstrip(b"\x00").decode()
        n_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        self.refs: List[Tuple[str, int]] = []
        for _ in range(n_ref):
            l_name = struct.unpack_from("<i", data, off)[0]
            name = data[off + 4 : off + 4 + l_name - 1].decode()
            l_ref = struct.unpack_from("<i", data, off + 4 + l_name)[0]
            self.refs.append((name, l_ref))
            off += 8 + l_name
        self._data = data
        self._align_off = off

    def _ref_name(self, rid: int) -> str:
        return self.refs[rid][0] if 0 <= rid < len(self.refs) else "*"

    def __iter__(self) -> Iterator[SamRecord]:
        data = self._data
        off = self._align_off
        n = len(data)
        while off + 4 <= n:
            block_size = struct.unpack_from("<i", data, off)[0]
            off += 4
            end = off + block_size
            (
                ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
                next_ref, next_pos, tlen,
            ) = struct.unpack_from("<iiBBHHHiiii", data, off)
            p = off + 32
            qname = data[p : p + l_read_name - 1].decode()
            p += l_read_name
            cigar = []
            for _ in range(n_cigar):
                v = struct.unpack_from("<I", data, p)[0]
                cigar.append((v >> 4, _CIGAR_OPS[v & 0xF]))
                p += 4
            nb = (l_seq + 1) // 2
            seq_chars = []
            for i in range(l_seq):
                byte = data[p + i // 2]
                nib = (byte >> 4) if i % 2 == 0 else (byte & 0xF)
                seq_chars.append(_SEQ_NIBBLE[nib])
            seq = "".join(seq_chars)
            p += nb
            qual_raw = data[p : p + l_seq]
            qual = [] if (l_seq == 0 or qual_raw[:1] == b"\xff") else list(qual_raw)
            off = end
            yield SamRecord(
                qname=qname,
                flag=flag,
                rname=self._ref_name(ref_id),
                pos=pos,
                mapq=mapq,
                cigar=cigar,
                rnext=self._ref_name(next_ref) if next_ref != ref_id or next_ref < 0
                else self._ref_name(ref_id),
                pnext=next_pos,
                tlen=tlen,
                seq=seq if l_seq else "*",
                qual=qual,
            )


def read_bam(
    path: str | Path, region: Optional[Tuple[str, int, int]] = None
) -> Iterator[SamRecord]:
    """Iterate BAM records, optionally restricted to a region (linear
    scan; same contract as io.sam.read_sam)."""
    for rec in BamReader(path):
        if region is not None:
            chrom, start, end = region
            if rec.is_unmapped:
                if rec.rname != chrom or not (start <= rec.pos < end):
                    continue
            else:
                if rec.rname != chrom:
                    continue
                if rec.reference_end() <= start or rec.pos >= end:
                    continue
        yield rec


def read_alignments(
    path: str | Path, region: Optional[Tuple[str, int, int]] = None
) -> Iterator[SamRecord]:
    """Dispatch on extension: .bam -> BAM, anything else -> SAM text."""
    from breakmer_tpu.io.sam import read_sam

    if str(path).endswith(".bam"):
        return read_bam(path, region)
    return read_sam(path, region)


def write_bam(
    path: str | Path,
    refs: List[Tuple[str, int]],
    records: List[SamRecord],
) -> None:
    """Minimal BAM writer (fixtures, intermediates)."""
    rid: Dict[str, int] = {name: i for i, (name, _) in enumerate(refs)}
    header_text = "".join(
        f"@SQ\tSN:{name}\tLN:{ln}\n" for name, ln in refs
    ).encode()
    body = bytearray()
    body += b"BAM\x01"
    body += struct.pack("<i", len(header_text)) + header_text
    body += struct.pack("<i", len(refs))
    for name, ln in refs:
        bname = name.encode() + b"\x00"
        body += struct.pack("<i", len(bname)) + bname + struct.pack("<i", ln)
    for rec in records:
        name_b = rec.qname.encode() + b"\x00"
        seq = "" if rec.seq == "*" else rec.seq
        l_seq = len(seq)
        cigar_b = b"".join(
            struct.pack("<I", (ln << 4) | _OP_OF[op]) for ln, op in rec.cigar
        )
        seq_b = bytearray()
        for i in range(0, l_seq, 2):
            hi = _NIBBLE_OF.get(seq[i].upper(), 15) << 4
            lo = _NIBBLE_OF.get(seq[i + 1].upper(), 15) if i + 1 < l_seq else 0
            seq_b.append(hi | lo)
        qual_b = bytes(rec.qual) if rec.qual else b"\xff" * l_seq
        rec_b = struct.pack(
            "<iiBBHHHiiii",
            rid.get(rec.rname, -1),
            rec.pos,
            len(name_b),
            rec.mapq,
            0,
            len(rec.cigar),
            rec.flag,
            l_seq,
            rid.get(rec.rnext, -1),
            rec.pnext,
            rec.tlen,
        ) + name_b + cigar_b + bytes(seq_b) + qual_b
        body += struct.pack("<i", len(rec_b)) + rec_b
    Path(path).write_bytes(_bgzf_compress(bytes(body)))
