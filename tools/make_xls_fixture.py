"""Author the encrypted-XLS test fixture (S9).

Builds a minimal BIFF8 workbook shaped like the reference's GeoPlace
SWA file (title row, header row at index 1, data rows), encrypts the
Workbook stream with the Excel default password ``VelvetSweatshop``
per MS-OFFCRYPTO 2.3.6 / MS-XLS 2.2.10, and wraps it in a minimal CFB
container. Run once; the output is checked in at
``tests/fixtures/encrypted_velvet.xls`` and the decrypt test pins its
contents (the fixture bytes are the contract — the reader must keep
decrypting this exact artifact across refactors).

Deterministic: fixed salt, no timestamps.
"""

from __future__ import annotations

import hashlib
import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_data_pipelines_spark.sources.xls_native import (  # noqa: E402
    derive_rc4_key,
    rc4_crypt_stream,
    rc4_keystream,
)

PASSWORD = "VelvetSweatshop"
SALT = hashlib.md5(b"spark-graft-s9-fixture").digest()
VERIFIER = hashlib.md5(b"spark-graft-s9-verifier").digest()


def rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def bof(dt: int) -> bytes:
    return rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def filepass() -> bytes:
    ks = rc4_keystream(derive_rc4_key(PASSWORD, SALT, 0), 32)
    enc_ver = bytes(a ^ b for a, b in zip(VERIFIER, ks[:16]))
    vhash = hashlib.md5(VERIFIER).digest()
    enc_hash = bytes(a ^ b for a, b in zip(vhash, ks[16:32]))
    return rec(0x002F, struct.pack("<HHH", 1, 1, 1) + SALT + enc_ver + enc_hash)


def sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        raw = s.encode("utf-16-le")
        # cch counts UTF-16 CODE UNITS (surrogate pairs = 2), not
        # codepoints — found by the round-trip property test
        body += struct.pack("<HB", len(raw) // 2, 0x01) + raw
    return rec(0x00FC, body)


def labelsst(r: int, c: int, isst: int) -> bytes:
    return rec(0x00FD, struct.pack("<HHHI", r, c, 15, isst))


def number(r: int, c: int, v: float) -> bytes:
    return rec(0x0203, struct.pack("<HHHd", r, c, 15, v))


DEFAULT_HEADERS = ["swa_code", "account_name", "prefix", "account_type"]
DEFAULT_DATA = [
    (10.0, "Ashfield District Council", "QD", "District"),
    (1445.0, "Transport for London", "YG", "Strategic"),
    (4720.0, "Cardiff Council", "QM", "Unitary"),
]
DEFAULT_TITLE = "GeoPlace SWA Codes — fixture"


def build_workbook_stream(
    encrypted: bool = True,
    pad: bool = True,
    headers: list | None = None,
    data: list | None = None,
    title: str = DEFAULT_TITLE,
) -> bytes:
    # SWA-shaped content: row 0 title junk, row 1 headers, rows 2+ data
    headers = DEFAULT_HEADERS if headers is None else headers
    data = DEFAULT_DATA if data is None else data
    strings = [title] + list(headers) + [v for row in data for v in row if isinstance(v, str)]
    uniq: list[str] = []
    for s in strings:
        if s not in uniq:
            uniq.append(s)
    idx = {s: i for i, s in enumerate(uniq)}

    sheet = bof(0x0010)
    sheet += rec(0x0200, struct.pack("<IIHHH", 0, 2 + len(data), 0, len(headers), 0))
    sheet += labelsst(0, 0, idx[title])
    for c, h in enumerate(headers):
        sheet += labelsst(1, c, idx[h])
    for r, row in enumerate(data, start=2):
        for c, v in enumerate(row):
            sheet += number(r, c, v) if isinstance(v, float) else labelsst(r, c, idx[v])
    sheet += rec(0x000A, b"")

    window1 = rec(0x003D, struct.pack("<9H", 360, 270, 14940, 9150, 0x38, 0, 0, 1, 600))
    name = "SWA Codes"

    # lbPlyPos needs the final globals length: assemble with a
    # placeholder, measure, then patch
    def globals_substream(lbplypos: int) -> bytes:
        bs = rec(0x0085, struct.pack("<IHBB", lbplypos, 0, len(name), 0x01) + name.encode("utf-16-le"))
        fp = filepass() if encrypted else b""
        return bof(0x0005) + fp + window1 + bs + sst(uniq) + rec(0x000A, b"")

    glen = len(globals_substream(0))
    stream = globals_substream(glen) + sheet
    assert len(stream) == glen + len(sheet)
    # pad past the 4096-byte CFB mini-stream cutoff so the stream lives
    # in regular sectors (zero bytes read as end-of-records); the
    # unpadded variant stays small on purpose to exercise the reader's
    # mini-stream branch
    if pad and len(stream) < 4096:
        stream += b"\x00" * (4096 - len(stream))
    return stream


def _direntry(name: str, typ: int, child: int, start: int, size: int) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = raw.ljust(64, b"\x00")
    e += struct.pack("<HBB", len(raw), typ, 1)
    e += struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, child)
    e += b"\x00" * 16  # CLSID
    e += struct.pack("<I", 0)  # state
    e += b"\x00" * 16  # timestamps
    e += struct.pack("<IQ", start, size)
    assert len(e) == 128
    return e


def write_cfb(stream: bytes) -> bytes:
    """Minimal v3 CFB holding one ``Workbook`` stream.

    >= 4096 bytes: regular sectors (FAT sector 0, directory sector 1,
    stream from sector 2). < 4096 bytes: stored as 64-byte mini
    sectors inside a root mini stream (layout: FAT 0, dir 1, mini-FAT
    2, mini-stream data from 3) — exercises the reader's mini-FAT
    branch, which real small XLS files hit."""
    ssz = 512
    if len(stream) >= 4096:
        n_stream_sectors = -(-len(stream) // ssz)
        directory = _direntry("Root Entry", 5, 1, 0xFFFFFFFE, 0)
        directory += _direntry("Workbook", 2, 0xFFFFFFFF, 2, len(stream))
        directory = directory.ljust(ssz, b"\x00")
        fat = [0xFFFFFFFD, 0xFFFFFFFE]  # FAT sector itself, dir chain
        fat += [2 + i + 1 for i in range(n_stream_sectors - 1)] + [0xFFFFFFFE]
        fat += [0xFFFFFFFF] * (ssz // 4 - len(fat))
        assert len(fat) == ssz // 4, "stream too large for a one-FAT-sector fixture"
        fat_sector = struct.pack(f"<{ssz // 4}I", *fat)
        n_minifat, first_minifat = 0, 0xFFFFFFFE
        body = stream.ljust(n_stream_sectors * ssz, b"\x00")
    else:
        mssz = 64
        n_mini = -(-len(stream) // mssz)
        mini_data = stream.ljust(n_mini * mssz, b"\x00")
        n_mini_sectors = -(-len(mini_data) // ssz)  # regular sectors holding it
        directory = _direntry("Root Entry", 5, 1, 3, len(mini_data))
        directory += _direntry("Workbook", 2, 0xFFFFFFFF, 0, len(stream))
        directory = directory.ljust(ssz, b"\x00")
        fat = [0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE]  # FAT, dir, mini-FAT sector
        fat += [3 + i + 1 for i in range(n_mini_sectors - 1)] + [0xFFFFFFFE]
        fat += [0xFFFFFFFF] * (ssz // 4 - len(fat))
        fat_sector = struct.pack(f"<{ssz // 4}I", *fat)
        minifat = [i + 1 for i in range(n_mini - 1)] + [0xFFFFFFFE]
        minifat += [0xFFFFFFFF] * (ssz // 4 - len(minifat))
        minifat_sector = struct.pack(f"<{ssz // 4}I", *minifat)
        n_minifat, first_minifat = 1, 2
        body = minifat_sector + mini_data.ljust(n_mini_sectors * ssz, b"\x00")

    header = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    header += struct.pack(
        "<HHHHHHIIIIIIII",
        0x003E, 0x0003, 0xFFFE, 9, 6, 0, 0, 0, 1, 1, 0, 4096, first_minifat, n_minifat,
    )
    header += struct.pack("<II", 0xFFFFFFFE, 0)
    header += struct.pack("<I", 0) + b"\xff" * 4 * 108
    assert len(header) == 512
    return header + fat_sector + directory + body


def main(out_path: str) -> None:
    plain = build_workbook_stream()
    encrypted = rc4_crypt_stream(plain, PASSWORD, SALT)
    assert encrypted != plain
    # self-check: transform is an involution outside exempt ranges
    assert rc4_crypt_stream(encrypted, PASSWORD, SALT) == plain
    Path(out_path).write_bytes(write_cfb(encrypted))
    print(f"wrote {out_path} ({len(encrypted)}-byte stream, salt {SALT.hex()})")

    # companion fixture: unencrypted, < 4096 bytes -> CFB mini stream
    # (pins the reader's mini-FAT branch + the no-FILEPASS parse)
    small = build_workbook_stream(encrypted=False, pad=False)
    assert len(small) < 4096, len(small)
    mini_path = str(Path(out_path).parent / "plain_mini.xls")
    Path(mini_path).write_bytes(write_cfb(small))
    print(f"wrote {mini_path} ({len(small)}-byte stream, mini-sectored)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/encrypted_velvet.xls")
