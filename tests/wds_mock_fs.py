"""Recording mock object store for the WebDataset sink's REMOTE code
route (VERDICT r13 #7). A ``pyarrow.fs.PyFileSystem`` whose handler
proxies onto a local directory but (a) reports a non-"local"
``type_name`` — so the sink must take the atomic-at-close, no-rename
branch, (b) REFUSES ``move`` — if the sink silently fell back to the
local tmp+rename publish, the write would fail loudly rather than
pass by accident, and (c) journals every output-stream open to an
on-disk log so the test can assert no dotted tmp names were ever
created. Lives in its own importable module (not the test file)
because the factory is resolved BY NAME inside mapInPandas worker
processes via ``SPARK_GRAFT_WDS_FS_FACTORY``.

The backing directory rides IN THE URI (``mockremote://<root>!<path>``)
— worker daemons inherited their env at JVM start, so nothing else
set by the test can reach them.
"""

from __future__ import annotations

import os

from pyarrow import fs as pafs

SCHEME = "mockremote://"


class _Handler(pafs.FileSystemHandler):
    """Proxy every call to a LocalFileSystem rooted at ``root``;
    behave like an object store at the contract level."""

    def __init__(self, root: str):
        self._root = root.rstrip("/")
        self._local = pafs.LocalFileSystem()

    # --- bookkeeping -----------------------------------------------------
    def _abs(self, path: str) -> str:
        return f"{self._root}/{path.lstrip('/')}" if path else self._root

    def _journal(self, line: str) -> None:
        with open(os.path.join(self._root, "__ops.log"), "a") as fh:
            fh.write(line + "\n")

    # --- identity ----------------------------------------------------------
    def get_type_name(self) -> str:
        return "mockremote"

    def normalize_path(self, path: str) -> str:
        return path

    def __eq__(self, other) -> bool:  # pyarrow compares handlers
        return isinstance(other, _Handler) and other._root == self._root

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    # --- metadata ----------------------------------------------------------
    def get_file_info(self, paths):
        infos = []
        for p in paths:
            raw = self._local.get_file_info(self._abs(p))
            # re-root the reported path so callers see in-fs paths
            infos.append(
                pafs.FileInfo(
                    p, raw.type, size=raw.size if raw.size is not None else -1
                )
            )
        return infos

    def get_file_info_selector(self, selector):
        base = self._abs(selector.base_dir)
        sel = pafs.FileSelector(
            base,
            allow_not_found=selector.allow_not_found,
            recursive=selector.recursive,
        )
        out = []
        for raw in self._local.get_file_info(sel):
            rel = raw.path[len(self._root) :].lstrip("/")
            out.append(
                pafs.FileInfo(
                    rel, raw.type, size=raw.size if raw.size is not None else -1
                )
            )
        return out

    # --- namespace ops -------------------------------------------------------
    def create_dir(self, path, recursive):
        self._local.create_dir(self._abs(path), recursive=recursive)

    def delete_dir(self, path):
        self._local.delete_dir(self._abs(path))

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._local.delete_dir_contents(
            self._abs(path), missing_dir_ok=missing_dir_ok
        )

    def delete_root_dir_contents(self):
        raise NotImplementedError

    def delete_file(self, path):
        self._local.delete_file(self._abs(path))

    def move(self, src, dest):
        # the object-store contract this mock enforces: no rename.
        # The sink's remote branch never calls move; a silent local
        # fallback would, and must FAIL here, not pass.
        raise OSError(
            f"mockremote forbids move/rename ({src!r} -> {dest!r}): "
            "object-store publishes are atomic-at-close, not renamed"
        )

    def copy_file(self, src, dest):
        self._local.copy_file(self._abs(src), self._abs(dest))

    # --- streams --------------------------------------------------------------
    def open_input_stream(self, path):
        return self._local.open_input_stream(self._abs(path))

    def open_input_file(self, path):
        return self._local.open_input_file(self._abs(path))

    def open_output_stream(self, path, metadata=None):
        self._journal(f"open_output_stream {path}")
        return self._local.open_output_stream(self._abs(path))

    def open_append_stream(self, path, metadata=None):
        raise NotImplementedError("object stores do not append")


def factory(path: str):
    """SPARK_GRAFT_WDS_FS_FACTORY entry point: claim mockremote://
    paths, decline everything else. URI form:
    ``mockremote://<backing-dir>!<in-store path>``."""
    if not path.startswith(SCHEME):
        return None
    root, _, inner = path[len(SCHEME) :].partition("!")
    return pafs.PyFileSystem(_Handler(root)), inner
