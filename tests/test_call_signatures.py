"""Static intra-package call-signature audit.

Round 5 found a latent TypeError on a rarely-driven path (the catalog
GTFS branch called ``load_gtfs_bundle`` without its required
``landing_dir``) that loader-level tests could not see. This test
binds every by-name intra-package call to the target function's
signature via AST, so signature drift on ANY path — tested or not —
fails fast. Calls through attributes, *args, or **kwargs are skipped
(unresolvable statically), as are names shared by functions with
differing signatures."""

from __future__ import annotations

import ast
import importlib
import inspect
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "open_data_pipelines_spark"


def test_intra_package_calls_bind():
    sigs: dict[tuple[str, str], inspect.Signature] = {}
    for p in PKG.rglob("*.py"):
        mod = "open_data_pipelines_spark." + str(
            p.relative_to(PKG).with_suffix("")
        ).replace("/", ".")
        mod = mod.removesuffix(".__init__")
        m = importlib.import_module(mod)
        for name, fn in vars(m).items():
            if callable(fn) and getattr(fn, "__module__", "").startswith(
                "open_data_pipelines_spark"
            ):
                try:
                    sigs[(mod, name)] = inspect.signature(fn)
                except (ValueError, TypeError):
                    pass

    bad: list[tuple[str, int, str, str]] = []
    for p in PKG.rglob("*.py"):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call) or not isinstance(node.func, ast.Name):
                continue
            fname = node.func.id
            cands = {str(s): s for (m, n), s in sigs.items() if n == fname}
            if len(cands) != 1:
                continue  # unknown or ambiguous across modules
            (sig,) = cands.values()
            if any(isinstance(a, ast.Starred) for a in node.args) or any(
                k.arg is None for k in node.keywords
            ):
                continue
            try:
                sig.bind(*[None] * len(node.args), **{k.arg: None for k in node.keywords})
            except TypeError as e:
                bad.append((str(p), node.lineno, fname, str(e)))
    assert not bad, "\n".join(f"{f}:{line} {fn}: {err}" for f, line, fn, err in bad)
