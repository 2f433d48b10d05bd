"""Landing-zone ZIP handling (S1/S4/S8/S10).

The reference streams remote ZIPs member-by-member in bounded memory
(``stream_unzip`` over 1 MiB HTTP chunks —
``src/data_processors/street_manager.py:202-265``,
``bduk_premises.py:95-224``, whole-zip download+extract variants
``os_usrn_uprn.py:68-219``). Spark reads ``.csv.gz`` natively but not
``.zip``, so extraction is a driver-side prep step into a landing dir,
after which the *parse* is distributed (``spark.read`` on the extracted
members) — the cluster boundary moves from "Python row loop" to
"driver unzips, executors parse" (SURVEY.md §3.1).

Member extraction is streamed (``shutil.copyfileobj`` in 1 MiB chunks,
mirroring the reference's chunk size) — no whole-member buffering.
Network fetch is injectable (``opener=``) so tests run offline on
``file://`` URLs and production can pass a requests-backed opener with
retry/backoff (the reference's 3-attempt 3·2ⁿs policy, K3).
"""

from __future__ import annotations

import fnmatch
import shutil
import urllib.request
import zipfile
from collections.abc import Callable
from pathlib import Path

CHUNK = 1024 * 1024  # 1 MiB — reference's streaming chunk size


def download_to_landing(
    url: str,
    landing_dir: str,
    filename: str | None = None,
    opener: Callable = urllib.request.urlopen,
) -> str:
    """Stream a remote file to the landing dir in 1 MiB chunks."""
    dest = Path(landing_dir)
    dest.mkdir(parents=True, exist_ok=True)
    out = dest / (filename or url.rstrip("/").split("/")[-1])
    with opener(url) as resp, open(out, "wb") as fh:
        shutil.copyfileobj(resp, fh, CHUNK)
    return str(out)


def extract_zip(
    zip_path: str,
    landing_dir: str,
    member_glob: str = "*",
    flatten: bool = True,
) -> list[str]:
    """Extract matching members, streamed per member. Returns paths.

    ``member_glob`` picks members the way the reference picks ``.csv``
    inside BDUK zips or ``Data/*.csv`` inside ONS zips.
    """
    dest = Path(landing_dir)
    dest.mkdir(parents=True, exist_ok=True)
    out_paths: list[str] = []
    seen: set[str] = set()
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            if info.is_dir() or not fnmatch.fnmatch(info.filename, member_glob):
                continue
            if flatten:
                name = Path(info.filename).name
                if str(dest / name) in seen:
                    # basename collision across ZIP dirs: disambiguate
                    # instead of silently overwriting the first member;
                    # loop until genuinely unused (a flattened full
                    # path can itself collide)
                    base = info.filename.replace("/", "_")
                    name, i = base, 1
                    while str(dest / name) in seen:
                        name = f"{i}_{base}"
                        i += 1
                target = dest / name
            else:
                target = dest / info.filename
            target.parent.mkdir(parents=True, exist_ok=True)
            with zf.open(info) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst, CHUNK)
            seen.add(str(target))
            out_paths.append(str(target))
    return sorted(out_paths)


def fetch_and_extract(
    url: str,
    landing_dir: str,
    member_glob: str = "*",
    opener: Callable = urllib.request.urlopen,
) -> list[str]:
    """download + extract in one step (the common S1/S4/S10 shape)."""
    zpath = download_to_landing(url, landing_dir, opener=opener)
    return extract_zip(zpath, landing_dir, member_glob)
