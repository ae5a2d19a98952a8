"""Minimal sas7bdat writer for test fixtures.

The container has no SAS installation and pandas ships no .sas7bdat test
files, so tests synthesize one. Emits the simplest valid layout a
sas7bdat consumer accepts: 32-bit little-endian, uncompressed, one meta
page (row-size / column-size / column-text / column-name /
column-attributes / per-column format subheaders) followed by one data
page of fixed-width rows.

Format reference (public): the sas7bdat reverse-engineered spec,
https://cran.r-project.org/package=sas7bdat/vignettes/sas7bdat.pdf
"""

from __future__ import annotations

import struct

MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

HEADER_SIZE = 1024
PAGE_SIZE = 4096
BIT_OFFSET = 16  # x86 page bit offset
SUBPTR = 12  # x86 subheader pointer length

SIG_ROWSIZE = b"\xf7\xf7\xf7\xf7"
SIG_COLSIZE = b"\xf6\xf6\xf6\xf6"
SIG_COLTEXT = b"\xfd\xff\xff\xff"
SIG_COLNAME = b"\xff\xff\xff\xff"
SIG_COLATTR = b"\xfc\xff\xff\xff"
SIG_FORMAT = b"\xfe\xfb\xff\xff"


def _u16(v):
    return struct.pack("<H", v)


def _u32(v):
    return struct.pack("<I", v)


def write_sas7bdat(path, columns, rows):
    """columns: list of (name, kind, length) with kind in
    {'num', 'str', 'date'}; 'num'/'date' are 8-byte doubles ('date' gets a
    DATE format → days since 1960-01-01, converted to datetime by
    readers). rows: list of tuples (floats / strs; None = missing)."""
    names = [c[0] for c in columns]
    kinds = [c[1] for c in columns]
    lengths = [8 if k in ("num", "date") else int(l)
               for (_, k, l) in columns]
    # numeric columns first (doubles must not be offset-shifted by
    # variable-length strings; SAS lays rows out the same way)
    order = sorted(range(len(columns)), key=lambda i: kinds[i] == "str")
    offsets = {}
    pos = 0
    for i in order:
        offsets[i] = pos
        pos += lengths[i]
    row_length = pos
    row_count = len(rows)
    ncols = len(columns)

    # --- column text block: 8-byte prologue then names + format strings
    text = bytearray(8)
    name_ptrs = []  # (offset, len) per column
    for n in names:
        b = n.encode("ascii")
        name_ptrs.append((len(text), len(b)))
        text.extend(b)
    fmt_ptr = {}
    if any(k == "date" for k in kinds):
        fmt_ptr["date"] = (len(text), 4)
        text.extend(b"DATE")
    text[0:2] = _u16(len(text))

    # --- subheaders (built back-to-front into the meta page tail)
    def rowsize_sub():
        b = bytearray(480)
        b[0:4] = SIG_ROWSIZE
        b[5 * 4:5 * 4 + 4] = _u32(row_length)
        b[6 * 4:6 * 4 + 4] = _u32(row_count)
        b[9 * 4:9 * 4 + 4] = _u32(ncols)   # col_count_p1
        b[10 * 4:10 * 4 + 4] = _u32(0)     # col_count_p2
        b[15 * 4:15 * 4 + 4] = _u32(0)     # rows on mix page: none
        b[354:356] = _u16(0)               # lcs
        b[378:380] = _u16(0)               # lcp
        return bytes(b)

    def colsize_sub():
        return SIG_COLSIZE + _u32(ncols) + b"\x00" * 8

    def coltext_sub():
        return SIG_COLTEXT + bytes(text)

    def colname_sub():
        # name pointer i lives at start + 4 + 8*(i+1)
        b = bytearray(4 + 8 * (ncols + 1) + 8)
        b[0:4] = SIG_COLNAME
        for i, (off, ln) in enumerate(name_ptrs):
            p = 4 + 8 * (i + 1)
            b[p:p + 2] = _u16(0)        # text subheader index
            b[p + 2:p + 4] = _u16(off)  # offset into text block
            b[p + 4:p + 6] = _u16(ln)   # name length
        return bytes(b)

    def colattr_sub():
        b = bytearray(8 + (4 + 8) * ncols + 12)
        b[0:4] = SIG_COLATTR
        for i in range(ncols):
            base = 12 + i * 12
            b[base:base + 4] = _u32(offsets[i])
            b[base + 4:base + 8] = _u32(lengths[i])
            b[base + 10] = 1 if kinds[i] in ("num", "date") else 2
        return bytes(b)

    def format_sub(i):
        b = bytearray(64)
        b[0:4] = SIG_FORMAT
        if kinds[i] == "date":
            off, ln = fmt_ptr["date"]
            b[36:38] = _u16(off)  # format offset (into text block 0)
            b[38:40] = _u16(ln)   # format length
        return bytes(b)

    subs = [rowsize_sub(), colsize_sub(), coltext_sub(), colname_sub(),
            colattr_sub()] + [format_sub(i) for i in range(ncols)]

    # --- meta page: pointers grow from the front, payloads from the back
    meta = bytearray(PAGE_SIZE)
    meta[BIT_OFFSET:BIT_OFFSET + 2] = _u16(0x0000)  # page_meta_type
    meta[BIT_OFFSET + 2:BIT_OFFSET + 4] = _u16(len(subs))
    meta[BIT_OFFSET + 4:BIT_OFFSET + 6] = _u16(len(subs))
    tail = PAGE_SIZE
    for i, sub in enumerate(subs):
        tail -= len(sub)
        meta[tail:tail + len(sub)] = sub
        p = BIT_OFFSET + 8 + i * SUBPTR
        meta[p:p + 4] = _u32(tail)
        meta[p + 4:p + 8] = _u32(len(sub))
        meta[p + 8] = 0  # compression: none
        meta[p + 9] = 0  # type

    # --- data page
    data = bytearray(PAGE_SIZE)
    data[BIT_OFFSET:BIT_OFFSET + 2] = _u16(0x0100)  # page_data_type
    data[BIT_OFFSET + 2:BIT_OFFSET + 4] = _u16(row_count)  # block count
    data[BIT_OFFSET + 4:BIT_OFFSET + 6] = _u16(0)
    base = BIT_OFFSET + 8
    for r, row in enumerate(rows):
        for i, v in enumerate(row):
            off = base + r * row_length + offsets[i]
            if kinds[i] in ("num", "date"):
                val = float("nan") if v is None else float(v)
                data[off:off + 8] = struct.pack("<d", val)
            else:
                s = ("" if v is None else str(v)).encode("ascii")
                s = s[:lengths[i]].ljust(lengths[i], b" ")
                data[off:off + lengths[i]] = s

    # --- file header
    hdr = bytearray(HEADER_SIZE)
    hdr[0:32] = MAGIC
    hdr[32] = 0x22  # not '3' -> 32-bit
    hdr[35] = 0x22  # not '3' -> align1 = 0
    hdr[37] = 0x01  # little-endian
    hdr[70] = 20    # utf-8
    hdr[164:172] = struct.pack("<d", 0.0)  # created (1960 epoch)
    hdr[172:180] = struct.pack("<d", 0.0)  # modified
    hdr[196:200] = _u32(HEADER_SIZE)
    hdr[200:204] = _u32(PAGE_SIZE)
    hdr[204:208] = _u32(2)  # page count

    with open(path, "wb") as f:
        f.write(bytes(hdr) + bytes(meta) + bytes(data))
