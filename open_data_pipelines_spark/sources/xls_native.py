"""Native encrypted legacy-XLS reader (S9) — no external deps.

The reference decrypts GeoPlace SWA spreadsheets with msoffcrypto and
the Excel default password ``VelvetSweatshop``
(``src/data_processors/geoplace_swa.py:39-105``). Neither msoffcrypto
nor xlrd exists in this container, so this module implements the whole
path from public specs with the stdlib only:

- **CFB / OLE2 container** (MS-CFB): sector FAT, directory, mini
  stream — enough to extract the ``Workbook`` stream.
- **Office Binary Document RC4 encryption** (MS-OFFCRYPTO 2.3.6):
  MD5-based key derivation from the password + 16-byte salt, RC4
  re-keyed every 1024 bytes, password verifier check.
- **BIFF8 records** (MS-XLS): FILEPASS, BOF/EOF substreams,
  BoundSheet8, SST/LabelSst, Number/RK/MulRk, Label, BoolErr,
  Blank/MulBlank, Formula cached values — enough to materialize the
  sheet grid as a pandas frame.

Like the native ODS reader this is a driver-side single-file ingest;
the Spark hand-off stays ``spark.createDataFrame`` (Arrow path) in
:mod:`.spreadsheet`.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# record bodies that stay plaintext inside an encrypted stream
# (MS-XLS 2.2.10: BOF, FILEPASS, UsrExcl, FileLock, InterfaceHdr,
# RRDInfo, RRDHead; plus BoundSheet8.lbPlyPos)
_PLAINTEXT_BODY = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
_BOUNDSHEET = 0x0085


class XlsFormatError(ValueError):
    """Not a CFB file / not a BIFF8 workbook / unsupported crypto."""


class XlsPasswordError(ValueError):
    """The password verifier check failed."""


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


# --------------------------------------------------------------------------
# CFB (OLE2) container
# --------------------------------------------------------------------------
def _fat_chain(fat: list[int], start: int) -> list[int]:
    chain, s, seen = [], start, set()
    while s < DIFSECT:
        if s in seen:
            raise XlsFormatError("cyclic FAT chain")
        seen.add(s)
        chain.append(s)
        if s >= len(fat):
            raise XlsFormatError("FAT chain runs off the FAT")
        s = fat[s]
    return chain


def read_cfb_stream(data: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Extract the first directory stream matching ``names`` from a CFB
    container, handling both regular-sector and mini-stream storage."""
    if data[:8] != _CFB_MAGIC:
        raise XlsFormatError("not an OLE2/CFB file (bad signature)")
    ssz = 1 << _u16(data, 30)
    mssz = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    first_dir = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    first_minifat = _u32(data, 60)
    n_minifat = _u32(data, 64)
    first_difat = _u32(data, 68)
    n_difat = _u32(data, 72)

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        return data[off : off + ssz]

    difat = [_u32(data, 76 + 4 * i) for i in range(109)]
    s = first_difat
    for _ in range(n_difat):
        ds = sector(s)
        entries = [_u32(ds, 4 * i) for i in range(ssz // 4)]
        difat.extend(entries[:-1])
        s = entries[-1]
        if s >= DIFSECT:
            break
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs >= DIFSECT:
            continue
        fsec = sector(fs)
        fat.extend(_u32(fsec, 4 * i) for i in range(ssz // 4))

    dir_data = b"".join(sector(s) for s in _fat_chain(fat, first_dir))
    entries = []
    for off in range(0, len(dir_data), 128):
        e = dir_data[off : off + 128]
        if len(e) < 128:
            break
        name_len = _u16(e, 64)
        if name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", errors="replace")
        entries.append(
            {
                "name": name,
                "type": e[66],
                "start": _u32(e, 116),
                "size": struct.unpack_from("<Q", e, 120)[0],
            }
        )
    if not entries:
        raise XlsFormatError("empty CFB directory")
    root = next(e for e in entries if e["type"] == 5)

    target = None
    for want in names:
        target = next((e for e in entries if e["type"] == 2 and e["name"] == want), None)
        if target:
            break
    if target is None:
        raise XlsFormatError(f"no {names} stream in CFB directory")

    if target["size"] >= mini_cutoff:
        raw = b"".join(sector(s) for s in _fat_chain(fat, target["start"]))
        return raw[: target["size"]]

    # mini stream: the root chain holds the mini-stream bytes; the
    # mini-FAT chains 64-byte mini sectors within it
    mini_stream = b"".join(sector(s) for s in _fat_chain(fat, root["start"]))
    minifat: list[int] = []
    s = first_minifat
    for _ in range(n_minifat):
        if s >= DIFSECT:
            break
        ms = sector(s)
        minifat.extend(_u32(ms, 4 * i) for i in range(ssz // 4))
        s = fat[s]
    chain, cur, seen = [], target["start"], set()
    while cur < DIFSECT:
        if cur in seen:
            raise XlsFormatError("cyclic mini-FAT chain")
        seen.add(cur)
        chain.append(cur)
        cur = minifat[cur]
    raw = b"".join(mini_stream[c * mssz : (c + 1) * mssz] for c in chain)
    return raw[: target["size"]]


# --------------------------------------------------------------------------
# RC4 + MS-OFFCRYPTO 2.3.6 key derivation
# --------------------------------------------------------------------------
def rc4_keystream(key: bytes, n: int) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(n)
    i = j = 0
    for k in range(n):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _xor(data: bytes, ks: bytes) -> bytes:
    n = len(data)
    x = int.from_bytes(data, "little") ^ int.from_bytes(ks[:n], "little")
    return x.to_bytes(n, "little")


def derive_rc4_key(password: str, salt: bytes, block: int) -> bytes:
    """MS-OFFCRYPTO 2.3.6.2 'Encryption Key Derivation': MD5 of the
    UTF-16LE password, 5-byte truncation mixed with the salt 16 times,
    re-keyed per 1024-byte block number."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()
    intermediate = (h0[:5] + salt) * 16
    h1 = hashlib.md5(intermediate).digest()
    hfinal = hashlib.md5(h1[:5] + struct.pack("<I", block)).digest()
    return hfinal[:16]


def verify_password(password: str, salt: bytes, enc_verifier: bytes, enc_verifier_hash: bytes) -> bool:
    """MS-OFFCRYPTO 2.3.6.4: decrypt verifier + hash with one
    continuing block-0 keystream; MD5(verifier) must equal the hash."""
    ks = rc4_keystream(derive_rc4_key(password, salt, 0), 32)
    verifier = _xor(enc_verifier, ks[:16])
    vhash = _xor(enc_verifier_hash, ks[16:32])
    return hashlib.md5(verifier).digest() == vhash


def _plaintext_ranges(stream: bytes) -> list[tuple[int, int]]:
    """Byte ranges of an (en|de)crypted Workbook stream that are stored
    plaintext: every 4-byte record header, exempt record bodies, and
    BoundSheet8.lbPlyPos. Valid on either form because headers are
    plaintext."""
    ranges: list[tuple[int, int]] = []
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        rid = _u16(stream, pos)
        ln = _u16(stream, pos + 2)
        if rid == 0:  # zero padding after the final EOF
            ranges.append((pos, n))
            break
        ranges.append((pos, pos + 4))
        body = pos + 4
        if rid in _PLAINTEXT_BODY:
            ranges.append((body, min(body + ln, n)))
        elif rid == _BOUNDSHEET:
            ranges.append((body, min(body + 4, n)))
        pos = body + ln
    return ranges


def rc4_crypt_stream(stream: bytes, password: str, salt: bytes) -> bytes:
    """Apply the MS-XLS RC4 transform (encrypt == decrypt): XOR the
    whole stream against per-1024-byte-block keystreams, then restore
    the plaintext-exempt ranges. The keystream advances over exempt
    bytes too (MS-XLS 2.2.10)."""
    out = bytearray(len(stream))
    for off in range(0, len(stream), 1024):
        chunk = stream[off : off + 1024]
        ks = rc4_keystream(derive_rc4_key(password, salt, off // 1024), len(chunk))
        out[off : off + len(chunk)] = _xor(chunk, ks)
    for a, b in _plaintext_ranges(stream):
        out[a:b] = stream[a:b]
    return bytes(out)


def parse_filepass(body: bytes) -> tuple[bytes, bytes, bytes]:
    """FILEPASS (0x002F) body -> (salt, encryptedVerifier,
    encryptedVerifierHash). Only the RC4 'binary document' header
    (vMajor=vMinor=1) is supported — XOR obfuscation and CryptoAPI
    raise a typed error."""
    enc_type = _u16(body, 0)
    if enc_type == 0:
        raise XlsFormatError("XOR-obfuscated XLS not supported (RC4 expected)")
    vmajor, vminor = _u16(body, 2), _u16(body, 4)
    if (vmajor, vminor) != (1, 1):
        raise XlsFormatError(f"unsupported RC4 header version {vmajor}.{vminor} (CryptoAPI?)")
    if len(body) < 54:
        raise XlsFormatError("truncated FILEPASS record")
    return body[6:22], body[22:38], body[38:54]


# --------------------------------------------------------------------------
# BIFF8 record parsing
# --------------------------------------------------------------------------
_BOF, _EOF, _FILEPASS = 0x0809, 0x000A, 0x002F
_SST, _LABELSST, _LABEL = 0x00FC, 0x00FD, 0x0204
_NUMBER, _RK, _MULRK = 0x0203, 0x027E, 0x00BD
_BOOLERR, _FORMULA, _STRING = 0x0205, 0x0006, 0x0207


def _records(stream: bytes):
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        rid = _u16(stream, pos)
        ln = _u16(stream, pos + 2)
        if rid == 0:
            return
        yield rid, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


def _unicode_str(body: bytes, off: int, cch: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString tail after the cch field: flags,
    optional rich/ext lengths, characters. Returns (text, next_off)."""
    flags = body[off]
    off += 1
    crun = cbext = 0
    if flags & 0x08:
        crun = _u16(body, off)
        off += 2
    if flags & 0x04:
        cbext = _u32(body, off)
        off += 4
    if flags & 0x01:
        text = body[off : off + 2 * cch].decode("utf-16-le")
        off += 2 * cch
    else:
        text = body[off : off + cch].decode("latin-1")
        off += cch
    off += 4 * crun + cbext
    return text, off


def _parse_sst(body: bytes) -> list[str]:
    unique = _u32(body, 4)
    strings, off = [], 8
    for _ in range(unique):
        if off + 3 > len(body):
            raise XlsFormatError("SST spills into CONTINUE records (unsupported)")
        cch = _u16(body, off)
        text, off = _unicode_str(body, off + 2, cch)
        strings.append(text)
    return strings


def _decode_rk(rk: int) -> float:
    if rk & 0x02:  # fInt: signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        v = float(v)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 0x01 else v


def parse_biff_cells(stream: bytes) -> dict[str, dict[tuple[int, int], object]]:
    """Decrypted BIFF8 Workbook stream -> {sheet_name: {(row, col):
    value}}. Sheets appear in BoundSheet8 order; cached formula values
    are used as-is (numeric / boolean / string via trailing STRING)."""
    sst: list[str] = []
    sheet_names: list[str] = []
    sheets: dict[str, dict[tuple[int, int], object]] = {}
    cur: dict[tuple[int, int], object] | None = None
    sheet_idx = -1
    pending_formula: tuple[int, int] | None = None
    for rid, body in _records(stream):
        if rid == _BOF:
            dt = _u16(body, 2)
            if dt == 0x0010:  # worksheet substream
                sheet_idx += 1
                name = sheet_names[sheet_idx] if sheet_idx < len(sheet_names) else f"Sheet{sheet_idx + 1}"
                cur = sheets.setdefault(name, {})
        elif rid == _EOF:
            cur = None
        elif rid == _BOUNDSHEET:
            cch = body[6]
            flags = body[7]
            raw = body[8:]
            name = raw[: 2 * cch].decode("utf-16-le") if flags & 0x01 else raw[:cch].decode("latin-1")
            sheet_names.append(name)
        elif rid == _SST:
            sst = _parse_sst(body)
        elif cur is None:
            continue
        elif rid == _LABELSST:
            r, c, isst = _u16(body, 0), _u16(body, 2), _u32(body, 6)
            cur[(r, c)] = sst[isst] if isst < len(sst) else None
        elif rid == _LABEL:
            r, c = _u16(body, 0), _u16(body, 2)
            cch = _u16(body, 6)
            cur[(r, c)], _ = _unicode_str(body, 8, cch)
        elif rid == _NUMBER:
            r, c = _u16(body, 0), _u16(body, 2)
            cur[(r, c)] = struct.unpack_from("<d", body, 6)[0]
        elif rid == _RK:
            r, c = _u16(body, 0), _u16(body, 2)
            cur[(r, c)] = _decode_rk(_u32(body, 6))
        elif rid == _MULRK:
            r, c0 = _u16(body, 0), _u16(body, 2)
            ncells = (len(body) - 6) // 6
            for i in range(ncells):
                cur[(r, c0 + i)] = _decode_rk(_u32(body, 4 + 6 * i + 2))
        elif rid == _BOOLERR:
            r, c = _u16(body, 0), _u16(body, 2)
            if body[7] == 0:  # fError == 0 -> boolean
                cur[(r, c)] = bool(body[6])
        elif rid == _FORMULA:
            r, c = _u16(body, 0), _u16(body, 2)
            cached = body[6:14]
            if cached[6:8] == b"\xff\xff":
                kind = cached[0]
                if kind == 0:  # string: value arrives in the next STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    cur[(r, c)] = bool(cached[2])
            else:
                cur[(r, c)] = struct.unpack("<d", cached)[0]
        elif rid == _STRING and pending_formula is not None:
            cch = _u16(body, 0)
            cur[pending_formula], _ = _unicode_str(body, 2, cch)
            pending_formula = None
    return sheets


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------
def read_encrypted_xls_native(
    path: str,
    password: str = "VelvetSweatshop",
    sheet_name: str | int = 0,
    header_row: int = 1,
) -> pd.DataFrame:
    """Decrypt + parse a legacy encrypted XLS with the stdlib only,
    with ``pd.read_excel(header=N)`` semantics. Unencrypted BIFF8
    files (no FILEPASS) parse too."""
    with open(path, "rb") as fh:
        data = fh.read()
    stream = read_cfb_stream(data)
    filepass = next((body for rid, body in _records(stream) if rid == _FILEPASS), None)
    if filepass is not None:
        salt, enc_ver, enc_hash = parse_filepass(filepass)
        if not verify_password(password, salt, enc_ver, enc_hash):
            raise XlsPasswordError(f"password verifier failed for {path}")
        stream = rc4_crypt_stream(stream, password, salt)
    sheets = parse_biff_cells(stream)
    if not sheets:
        raise XlsFormatError(f"{path} has no worksheet substreams")
    if isinstance(sheet_name, int):
        try:
            cells = list(sheets.values())[sheet_name]
        except IndexError:
            raise XlsFormatError(f"{path} has {len(sheets)} sheets, asked for {sheet_name}") from None
    else:
        if sheet_name not in sheets:
            raise XlsFormatError(f"sheet {sheet_name!r} not in {sorted(sheets)}")
        cells = sheets[sheet_name]
    if not cells:
        raise XlsFormatError(f"{path}: selected sheet is empty")
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c)) for c in range(ncols)] for r in range(nrows)]
    if header_row >= len(grid):
        raise XlsFormatError(f"header_row {header_row} beyond the {len(grid)} rows in {path}")
    header = [h if h is not None else f"Unnamed: {i}" for i, h in enumerate(grid[header_row])]
    return pd.DataFrame(grid[header_row + 1 :], columns=header)
