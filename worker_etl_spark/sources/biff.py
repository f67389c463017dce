"""Legacy .xls (BIFF8 + BIFF5) codec — self-contained stdlib reader + writer.

The reference routes ``.xls`` objects through xlrd (``etl.py:527``,
requirements.txt); this container ships no Excel codec, so the engine
carries a minimal reader for the published formats:

- the OLE2/CFB compound-file container ([MS-CFB], public spec): header,
  FAT, directory, and the mini-FAT path (real small workbooks store the
  Workbook stream in the ministream);
- the BIFF8 record stream ([MS-XLS], public spec): workbook globals
  (BOUNDSHEET, SST — including strings split across CONTINUE records,
  with the repeated fHighByte flag at each continuation of character
  data per [MS-XLS] 2.5.293) plus the worksheet cell records a
  string-grid scan needs (LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR;
  BLANK/MULBLANK as None gaps; unknown records skipped);
- the BIFF5 record stream (the 'Book'-stream generation xlrd reads,
  ``etl.py:527``): no SST — LABEL/RSTRING cells carry inline byte
  strings decoded through the workbook's CODEPAGE record.

Deliberate, documented limits (raise with actionable messages, never
silently misread): encrypted workbooks (FILEPASS), BIFF4-and-older
(pre-CFB) files, chained-DIFAT containers (>6.8 MB of FAT), and SST
string HEADER fields straddling a CONTINUE boundary (writers split at
character boundaries; a header split is corrupt-or-exotic) are
unsupported — install xlrd and the pandas chain takes over.  Numeric
cells surface like the stdlib .xlsx path surfaces stored numerics:
integral doubles as '3', fractional as '1.5' (``dtype=str`` semantics;
typing happens downstream in inference, I4).

The writer exists for fixtures/demos only (the reference only reads
Excel): BIFF8 LABELSST/NUMBER/BOOLERR cells with optional CONTINUE-split
SST emission, or BIFF5 inline-LABEL sheets — exercising every reader
branch above.
"""

from __future__ import annotations

import struct

# --- [MS-CFB] compound file container ----------------------------------------
_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


def is_cfb(content: bytes) -> bool:
    return content[:8] == _CFB_SIG


def _read_chain(data: bytes, fat: list[int], start: int, sector_size: int,
                offset: int) -> bytes:
    """Concatenate a FAT (or miniFAT) chain. *offset* is where sector 0
    begins (512 for the regular FAT, 0 for chains over the ministream)."""
    out = bytearray()
    sect = start
    seen = 0
    while sect != _ENDOFCHAIN:
        if sect >= len(fat) or seen > len(fat):
            raise ValueError("corrupt CFB: sector chain out of bounds")
        pos = offset + sect * sector_size
        out += data[pos : pos + sector_size]
        sect = fat[sect]
        seen += 1
    return bytes(out)


def cfb_open_stream(content: bytes, stream_name: str) -> bytes:
    """Extract one named stream from a compound file."""
    if not is_cfb(content):
        raise ValueError("not an OLE2 compound file")
    (sector_shift,) = struct.unpack_from("<H", content, 30)
    (mini_shift,) = struct.unpack_from("<H", content, 32)
    sector_size, mini_size = 1 << sector_shift, 1 << mini_shift
    (num_fat,) = struct.unpack_from("<I", content, 44)
    (first_dir,) = struct.unpack_from("<I", content, 48)
    (mini_cutoff,) = struct.unpack_from("<I", content, 56)
    (first_minifat,) = struct.unpack_from("<I", content, 60)
    (num_difat,) = struct.unpack_from("<I", content, 72)
    if num_difat:
        raise NotImplementedError(
            "CFB with chained DIFAT (>6.8 MB of FAT) unsupported by the "
            "minimal .xls reader; install xlrd for large legacy workbooks"
        )
    difat = struct.unpack_from("<109I", content, 76)[:num_fat]
    fat: list[int] = []
    for fs in difat:
        pos = 512 + fs * sector_size
        fat.extend(struct.unpack_from(f"<{sector_size // 4}I", content, pos))

    directory = _read_chain(content, fat, first_dir, sector_size, 512)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory), 128):
        entry = directory[off : off + 128]
        if len(entry) < 128:
            break
        (name_len,) = struct.unpack_from("<H", entry, 64)
        etype = entry[66]
        if etype == 0 or name_len == 0:
            continue
        name = entry[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
        (start,) = struct.unpack_from("<I", entry, 116)
        (size,) = struct.unpack_from("<I", entry, 120)
        if etype == 5:  # root storage → ministream location
            root_start, root_size = start, size
        elif name == stream_name:
            target = (start, size)
    if target is None:
        raise ValueError(f"CFB stream {stream_name!r} not found")
    start, size = target
    if size >= mini_cutoff:
        return _read_chain(content, fat, start, sector_size, 512)[:size]
    # ministream path: miniFAT chains 64-byte sectors inside the root chain
    if root_start is None:
        raise ValueError("corrupt CFB: mini stream without root entry")
    ministream = _read_chain(content, fat, root_start, sector_size, 512)[:root_size]
    minifat_raw = _read_chain(content, fat, first_minifat, sector_size, 512) \
        if first_minifat != _ENDOFCHAIN else b""
    minifat = list(struct.unpack_from(f"<{len(minifat_raw) // 4}I", minifat_raw, 0))
    return _read_chain(ministream, minifat, start, mini_size, 0)[:size]


# --- BIFF record stream -------------------------------------------------------
_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_BOUNDSHEET, _SST = 0x0085, 0x00FC
_LABELSST, _LABEL = 0x00FD, 0x0204
_NUMBER, _RK, _MULRK = 0x0203, 0x027E, 0x00BD
_BOOLERR = 0x0205
_FILEPASS = 0x002F
_CODEPAGE = 0x0042
_RSTRING = 0x00D6  # BIFF5 rich-text label (runs ignored, text kept)

# BIFF2/3-era BOF ids — genuinely ancient, pre-CFB worksheet streams.
_OLD_BOFS = {0x0009, 0x0209, 0x0409}


def _codepage_codec(cp: int) -> str:
    """CODEPAGE record value → python codec (BIFF5 byte strings)."""
    if cp == 1200:
        return "utf-16-le"
    if cp == 10000:
        return "mac-roman"
    try:
        import codecs

        codecs.lookup(f"cp{cp}")
        return f"cp{cp}"
    except LookupError:
        return "latin-1"


def _records(stream: bytes, start: int = 0):
    """Yield (record_id, payload_offset, payload_len) from *start* to EOF."""
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rid, rlen = struct.unpack_from("<HH", stream, pos)
        yield rid, pos + 4, rlen
        pos += 4 + rlen
        if rid == _EOF:
            return


def _xl_unicode(stream: bytes, pos: int, end: int, cch_bytes: int = 2):
    """Decode one XLUnicodeString at *pos*; returns (text, next_pos).
    *end* is the record payload end — crossing it means the string spills
    into a CONTINUE record, which the minimal reader refuses loudly."""
    if cch_bytes == 2:
        (cch,) = struct.unpack_from("<H", stream, pos)
        pos += 2
    else:
        cch = stream[pos]
        pos += 1
    grbit = stream[pos]
    pos += 1
    crun = cab = 0
    if grbit & 0x08:
        (crun,) = struct.unpack_from("<H", stream, pos)
        pos += 2
    if grbit & 0x04:
        (cab,) = struct.unpack_from("<I", stream, pos)
        pos += 4
    nbytes = cch * (2 if grbit & 0x01 else 1)
    if pos + nbytes + 4 * crun + cab > end:
        raise NotImplementedError(
            "BIFF8 string split across CONTINUE records — unsupported by the "
            "minimal .xls reader; install xlrd for large legacy workbooks"
        )
    raw = stream[pos : pos + nbytes]
    text = raw.decode("utf-16-le" if grbit & 0x01 else "latin-1")
    return text, pos + nbytes + 4 * crun + cab


def _parse_sst(segs: list[bytes]) -> list[str]:
    """Parse an SST spanning its CONTINUE records ([MS-XLS] 2.4.265).

    *segs* = the SST payload followed by each CONTINUE payload, in stream
    order.  Strings are parsed over the concatenation, with the one
    continuation rule that matters: whenever CHARACTER data resumes in a
    new segment, that segment starts with a fresh fHighByte flags byte
    (so a string may switch between compressed and UTF-16 halves,
    [MS-XLS] 2.5.293).  Rich-run and phonetic blocks continue raw — no
    repeated flags.  Header fields straddling a boundary are refused
    loudly (real writers split at character boundaries only)."""
    data = b"".join(segs)
    bounds: list[int] = []
    acc = 0
    for s in segs[:-1]:
        acc += len(s)
        bounds.append(acc)

    def next_bound(p: int) -> int:
        for b in bounds:
            if b > p:
                return b
        return len(data)

    def fixed(p: int, n: int) -> int:
        nb = next_bound(p)
        if p < nb < p + n:
            raise NotImplementedError(
                "SST string header split across a CONTINUE boundary — "
                "unsupported by the minimal .xls reader; install xlrd"
            )
        return p + n

    (unique,) = struct.unpack_from("<I", data, 4)
    pos = 8
    out: list[str] = []
    for _ in range(unique):
        nxt = fixed(pos, 2)
        (cch,) = struct.unpack_from("<H", data, pos)
        pos = nxt
        nxt = fixed(pos, 1)
        grbit = data[pos]
        pos = nxt
        crun = cab = 0
        if grbit & 0x08:
            nxt = fixed(pos, 2)
            (crun,) = struct.unpack_from("<H", data, pos)
            pos = nxt
        if grbit & 0x04:
            nxt = fixed(pos, 4)
            (cab,) = struct.unpack_from("<I", data, pos)
            pos = nxt
        wide = bool(grbit & 0x01)
        remaining = cch
        pieces: list[str] = []
        bset = set(bounds)
        while remaining:
            if pos in bset:
                # character data resumes (or begins) at a CONTINUE start:
                # the segment opens with a repeated fHighByte flags byte,
                # and the continued portion may switch compressed/UTF-16
                if pos >= len(data):
                    raise ValueError("truncated SST: string runs past stream")
                wide = bool(data[pos] & 0x01)
                pos += 1
            nb = next_bound(pos)
            width = 2 if wide else 1
            take = min(remaining, (nb - pos) // width)
            if take <= 0:
                raise NotImplementedError(
                    "SST character split mid-UTF-16-unit across a "
                    "CONTINUE boundary — corrupt stream; install xlrd"
                )
            raw = data[pos : pos + take * width]
            pieces.append(raw.decode("utf-16-le" if wide else "latin-1"))
            pos += take * width
            remaining -= take
        out.append("".join(pieces))
        pos += 4 * crun + cab  # rich runs + phonetic continue raw
    return out


def _decode_rk(rk: int) -> object:
    """RK-compressed number → int/float per [MS-XLS] 2.5.122."""
    div100 = rk & 0x01
    if rk & 0x02:  # 30-bit signed integer
        val = rk >> 2
        if val & 0x20000000:
            val -= 0x40000000
        return val / 100 if div100 else val
    # high 30 bits of an IEEE double
    (d,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return d / 100 if div100 else d


def _num_str(v: float) -> str:
    """Stored numeric → untyped-scan string ('3' not '3.0'), matching how
    the stdlib .xlsx path surfaces stored numerics."""
    if isinstance(v, int) or (isinstance(v, float) and v.is_integer()):
        return str(int(v))
    return repr(v)


def parse_biff8(workbook_stream: bytes) -> dict[str, list[list[object]]]:
    """Workbook stream → {sheet_name: rows of str/None} (untyped scan).

    Dispatches on the BOF version: 0x0600 (BIFF8) here, 0x0500 (BIFF5)
    to ``_parse_biff5``, older generations refused loudly."""
    if len(workbook_stream) < 8:
        raise ValueError("truncated BIFF stream")
    rid0, _ = struct.unpack_from("<HH", workbook_stream, 0)
    vers, dt = struct.unpack_from("<HH", workbook_stream, 4)
    if vers == 0x0500 or (rid0 in _OLD_BOFS and rid0 != _BOF):
        if vers != 0x0500:
            raise NotImplementedError(
                f"pre-BIFF5 stream (BOF id 0x{rid0:04x}) unsupported; "
                "install xlrd for ancient workbooks"
            )
        return _parse_biff5(workbook_stream)
    if vers != 0x0600:
        raise NotImplementedError(
            f"BIFF version 0x{vers:04x} unsupported (BIFF8/BIFF5 only); "
            "install xlrd for older workbooks"
        )
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    recs = list(_records(workbook_stream))
    i = 0
    while i < len(recs):
        rid, off, rlen = recs[i]
        end = off + rlen
        if rid == _FILEPASS:
            raise NotImplementedError("encrypted .xls workbooks unsupported")
        elif rid == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", workbook_stream, off)
            name, _ = _xl_unicode(workbook_stream, off + 6, end, cch_bytes=1)
            sheets.append((name, pos))
        elif rid == _SST:
            segs = [workbook_stream[off:end]]
            while i + 1 < len(recs) and recs[i + 1][0] == _CONTINUE:
                i += 1
                _, o2, l2 = recs[i]
                segs.append(workbook_stream[o2 : o2 + l2])
            sst = _parse_sst(segs)
        i += 1

    out: dict[str, list[list[object]]] = {}
    for name, start in sheets:
        cells: dict[int, dict[int, object]] = {}

        def put(r: int, c: int, v: object) -> None:
            cells.setdefault(r, {})[c] = v

        for rid, off, rlen in _records(workbook_stream, start):
            end = off + rlen
            if rid == _LABELSST:
                r, c, _xf, isst = struct.unpack_from("<HHHI", workbook_stream, off)
                put(r, c, sst[isst] if isst < len(sst) else None)
            elif rid == _LABEL:
                r, c = struct.unpack_from("<HH", workbook_stream, off)
                text, _ = _xl_unicode(workbook_stream, off + 6, end)
                put(r, c, text)
            elif rid == _NUMBER:
                r, c, _xf, d = struct.unpack_from("<HHHd", workbook_stream, off)
                put(r, c, _num_str(d))
            elif rid == _RK:
                r, c, _xf, rk = struct.unpack_from("<HHHI", workbook_stream, off)
                put(r, c, _num_str(_decode_rk(rk)))
            elif rid == _MULRK:
                r, c0 = struct.unpack_from("<HH", workbook_stream, off)
                nrk = (rlen - 6) // 6
                for i in range(nrk):
                    (rk,) = struct.unpack_from("<I", workbook_stream, off + 4 + 6 * i + 2)
                    put(r, c0 + i, _num_str(_decode_rk(rk)))
            elif rid == _BOOLERR:
                r, c, _xf, val, is_err = struct.unpack_from(
                    "<HHHBB", workbook_stream, off
                )
                if not is_err:
                    put(r, c, "True" if val else "False")
        n_rows = max(cells) + 1 if cells else 0
        rows_out: list[list[object]] = []
        for r in range(n_rows):
            row = cells.get(r, {})
            width = max(row) + 1 if row else 0
            rows_out.append([row.get(c) for c in range(width)])
        out[name] = rows_out
    return out


def _parse_biff5(workbook_stream: bytes) -> dict[str, list[list[object]]]:
    """BIFF5 Book stream → {sheet_name: rows} (untyped scan).

    The pre-SST generation (what xlrd's legacy path reads, reference
    ``etl.py:527``): LABEL/RSTRING cells carry inline byte strings in the
    workbook codepage; BOUNDSHEET names are cch+ANSI with no flags byte;
    numeric records (NUMBER/RK/MULRK/BOOLERR) are layout-identical to
    BIFF8."""
    # Two-pass globals (round-4 ADVICE): record ORDER inside the globals
    # substream isn't guaranteed in the wild, so discover CODEPAGE in a
    # first full pass, THEN decode BOUNDSHEET names — otherwise a workbook
    # whose CODEPAGE follows its BOUNDSHEETs gets sheet names in the cp1252
    # default while cell labels use the declared codepage.
    codec = "cp1252"  # BIFF5 default ANSI codepage until CODEPAGE says else
    for rid, off, rlen in _records(workbook_stream):
        if rid == _FILEPASS:
            raise NotImplementedError("encrypted .xls workbooks unsupported")
        elif rid == _CODEPAGE:
            (cp,) = struct.unpack_from("<H", workbook_stream, off)
            codec = _codepage_codec(cp)
    sheets: list[tuple[str, int]] = []
    for rid, off, rlen in _records(workbook_stream):
        if rid == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", workbook_stream, off)
            cch = workbook_stream[off + 6]
            name = workbook_stream[off + 7 : off + 7 + cch].decode(
                codec, errors="replace"
            )
            sheets.append((name, pos))

    out: dict[str, list[list[object]]] = {}
    for name, start in sheets:
        cells: dict[int, dict[int, object]] = {}

        def put(r: int, c: int, v: object) -> None:
            cells.setdefault(r, {})[c] = v

        for rid, off, rlen in _records(workbook_stream, start):
            if rid in (_LABEL, _RSTRING):
                r, c = struct.unpack_from("<HH", workbook_stream, off)
                (cch,) = struct.unpack_from("<H", workbook_stream, off + 6)
                raw = workbook_stream[off + 8 : off + 8 + cch]
                put(r, c, raw.decode(codec, errors="replace"))
            elif rid == _NUMBER:
                r, c, _xf, d = struct.unpack_from("<HHHd", workbook_stream, off)
                put(r, c, _num_str(d))
            elif rid == _RK:
                r, c, _xf, rk = struct.unpack_from("<HHHI", workbook_stream, off)
                put(r, c, _num_str(_decode_rk(rk)))
            elif rid == _MULRK:
                r, c0 = struct.unpack_from("<HH", workbook_stream, off)
                nrk = (rlen - 6) // 6
                for i in range(nrk):
                    (rk,) = struct.unpack_from(
                        "<I", workbook_stream, off + 4 + 6 * i + 2
                    )
                    put(r, c0 + i, _num_str(_decode_rk(rk)))
            elif rid == _BOOLERR:
                r, c, _xf, val, is_err = struct.unpack_from(
                    "<HHHBB", workbook_stream, off
                )
                if not is_err:
                    put(r, c, "True" if val else "False")
        n_rows = max(cells) + 1 if cells else 0
        rows_out: list[list[object]] = []
        for r in range(n_rows):
            row = cells.get(r, {})
            width = max(row) + 1 if row else 0
            rows_out.append([row.get(c) for c in range(width)])
        out[name] = rows_out
    return out


def stdlib_xls_parser(content: bytes) -> dict[str, list[list[object]]]:
    """SheetParser for legacy .xls: CFB container → Workbook/Book stream →
    BIFF8 or BIFF5 (version dispatched from the BOF record)."""
    try:
        stream = cfb_open_stream(content, "Workbook")
    except ValueError:
        stream = cfb_open_stream(content, "Book")  # BIFF5-era stream name
    return parse_biff8(stream)


# --- minimal BIFF8 writer (fixtures/demos) ------------------------------------
def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _uni(s: str, cch_bytes: int = 2) -> bytes:
    """XLUnicodeString, always uncompressed UTF-16LE."""
    enc = s.encode("utf-16-le")
    head = struct.pack("<H", len(s)) if cch_bytes == 2 else struct.pack("<B", len(s))
    return head + b"\x01" + enc


def _build_sst_records(shared: list[str], limit: int | None) -> bytes:
    """SST payload → SST record, split into CONTINUE records when *limit*
    bounds the per-record payload (mirrors the reader's continuation
    rules: character data splits only at character boundaries and each
    continuation of character data opens with a fresh flags byte; header
    fields never straddle — they move whole into the next record)."""
    if limit is None:
        payload = struct.pack("<II", len(shared), len(shared)) + b"".join(
            _uni(s) for s in shared
        )
        if len(payload) > 8224:
            raise ValueError("SST exceeds one record; pass sst_continue_limit")
        return _rec(_SST, payload)
    if limit < 8:
        raise ValueError("sst_continue_limit must be >= 8 bytes")

    segs: list[bytearray] = [bytearray()]

    def emit_atomic(b: bytes) -> None:
        # header fields: never straddle a boundary, no flags byte on spill
        if limit - len(segs[-1]) < len(b):
            segs.append(bytearray())
        segs[-1] += b

    def emit_chars(b: bytes) -> None:
        # UTF-16 character data: split at char boundaries, repeat flags byte
        i = 0
        while i < len(b):
            room = limit - len(segs[-1])
            take = min(len(b) - i, room)
            take -= take % 2
            if take <= 0:
                segs.append(bytearray())
                segs[-1].append(0x01)  # repeated fHighByte: uncompressed
                continue
            segs[-1] += b[i : i + take]
            i += take

    emit_atomic(struct.pack("<II", len(shared), len(shared)))
    for s in shared:
        emit_atomic(struct.pack("<H", len(s)) + b"\x01")
        emit_chars(s.encode("utf-16-le"))
    return _rec(_SST, bytes(segs[0])) + b"".join(
        _rec(_CONTINUE, bytes(seg)) for seg in segs[1:]
    )


def write_minimal_xls(
    path: str,
    sheets: dict[str, list[list[object]]],
    pad: bool = True,
    biff_version: int = 8,
    sst_continue_limit: int | None = None,
) -> str:
    """Write a minimal real .xls inside a CFB container.

    BIFF8 (default): str cells go through the SST (split across CONTINUE
    records when ``sst_continue_limit`` bounds the record payload),
    int/float become NUMBER records, bools BOOLERR, None is skipped.
    ``biff_version=5`` writes the pre-SST generation instead: a 'Book'
    stream with inline cp1252 LABEL cells and flag-less BOUNDSHEET names.
    ``pad=True`` pushes the stream past the 4096-byte mini cutoff (regular
    FAT); ``pad=False`` keeps small streams in the ministream, the layout
    Excel itself uses for small workbooks (covers the reader's mini path)."""
    if biff_version not in (5, 8):
        raise ValueError("biff_version must be 5 or 8")
    biff5 = biff_version == 5
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sst_id(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    vers = 0x0500 if biff5 else 0x0600
    sheet_bodies: list[bytes] = []
    for rows in sheets.values():
        body = bytearray()
        body += _rec(_BOF, struct.pack("<HHHHII", vers, 0x0010, 0x0DBB, 0x07CC, 0, 0))
        for ri, row in enumerate(rows):
            for ci, val in enumerate(row):
                if val is None:
                    continue
                if isinstance(val, bool):
                    body += _rec(_BOOLERR, struct.pack("<HHHBB", ri, ci, 0, int(val), 0))
                elif isinstance(val, (int, float)):
                    body += _rec(_NUMBER, struct.pack("<HHHd", ri, ci, 0, float(val)))
                elif biff5:
                    enc = str(val).encode("cp1252")
                    body += _rec(
                        _LABEL,
                        struct.pack("<HHHH", ri, ci, 0, len(enc)) + enc,
                    )
                else:
                    body += _rec(
                        _LABELSST, struct.pack("<HHHI", ri, ci, 0, sst_id(str(val)))
                    )
        body += _rec(_EOF, b"")
        sheet_bodies.append(bytes(body))

    # Two-pass globals: BOUNDSHEET records carry absolute sheet offsets.
    def globals_block(offsets: list[int]) -> bytes:
        g = bytearray()
        g += _rec(_BOF, struct.pack("<HHHHII", vers, 0x0005, 0x0DBB, 0x07CC, 0, 0))
        g += _rec(_CODEPAGE, struct.pack("<H", 1252 if biff5 else 1200))
        for off, name in zip(offsets, sheets):
            if biff5:
                enc = name.encode("cp1252")
                g += _rec(
                    _BOUNDSHEET,
                    struct.pack("<IBBB", off, 0, 0, len(enc)) + enc,
                )
            else:
                g += _rec(_BOUNDSHEET, struct.pack("<IBB", off, 0, 0) + _uni(name, 1))
        if not biff5:
            g += _build_sst_records(shared, sst_continue_limit)
        g += _rec(_EOF, b"")
        return bytes(g)

    glen = len(globals_block([0] * len(sheets)))
    offsets = []
    pos = glen
    for b in sheet_bodies:
        offsets.append(pos)
        pos += len(b)
    stream = globals_block(offsets) + b"".join(sheet_bodies)
    # Padding past the 4096-byte mini cutoff keeps the container on the
    # regular FAT ([MS-CFB] §2.6); trailing zero bytes sit after the final
    # EOF record, never parsed.
    if pad and len(stream) < 4096:
        stream += b"\x00" * (4096 - len(stream))

    with open(path, "wb") as fh:
        fh.write(_cfb_wrap(stream, "Book" if biff5 else "Workbook"))
    return path


def _dir_entry(ename: str, etype: int, child: int, start: int, size: int) -> bytes:
    raw = ename.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<iii", e, 68, -1, -1, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def _cfb_header(num_fat: int, first_minifat: int, num_minifat: int) -> bytearray:
    header = bytearray(512)
    header[:8] = _CFB_SIG
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", header, 44, num_fat)
    struct.pack_into("<I", header, 48, 1)       # directory starts at sector 1
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, num_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *([0] + [_FREESECT] * 108))
    return header


def _cfb_wrap(stream: bytes, name: str) -> bytes:
    """Single-stream CFB.  Streams ≥ 4096 B chain on the regular FAT:
    [header][FAT][dir][stream sectors].  Smaller streams follow the spec's
    ministream layout: [header][FAT][dir][miniFAT][ministream sectors]."""
    if len(stream) >= 4096:
        ns = (len(stream) + 511) // 512
        data = stream.ljust(ns * 512, b"\x00")
        if ns + 2 > 128:
            raise ValueError("fixture writer caps streams at one FAT sector (~63 KB)")
        fat = [_FATSECT, _ENDOFCHAIN]  # sector 0 = FAT itself, 1 = directory
        fat += [2 + i + 1 for i in range(ns - 1)] + [_ENDOFCHAIN]  # stream chain
        fat += [_FREESECT] * (128 - len(fat))
        directory = (
            _dir_entry("Root Entry", 5, 1, _ENDOFCHAIN, 0)
            + _dir_entry(name, 2, -1, 2, len(stream))
            + bytes(128) * 2
        )
        header = _cfb_header(num_fat=1, first_minifat=_ENDOFCHAIN, num_minifat=0)
        return bytes(header) + struct.pack("<128I", *fat) + directory + data

    # ministream layout: the stream lives in 64-byte mini sectors chained by
    # the miniFAT; the ministream container itself chains on the regular FAT
    # and is addressed from the root directory entry.
    n_mini = (len(stream) + 63) // 64
    ministream = stream.ljust(n_mini * 64, b"\x00")
    n_ms_sect = (len(ministream) + 511) // 512
    ministream = ministream.ljust(n_ms_sect * 512, b"\x00")
    # sectors: 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = ministream
    fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
    fat += [3 + i + 1 for i in range(n_ms_sect - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (128 - len(fat))
    minifat = [i + 1 for i in range(n_mini - 1)] + [_ENDOFCHAIN]
    minifat += [_FREESECT] * (128 - len(minifat))
    directory = (
        _dir_entry("Root Entry", 5, 1, 3, len(ministream))
        + _dir_entry(name, 2, -1, 0, len(stream))
        + bytes(128) * 2
    )
    header = _cfb_header(num_fat=1, first_minifat=2, num_minifat=1)
    return (
        bytes(header)
        + struct.pack("<128I", *fat)
        + directory
        + struct.pack("<128I", *minifat)
        + ministream
    )
