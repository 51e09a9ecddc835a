"""Docs pipeline: api.md is a BUILD PRODUCT, not a frozen snapshot.

Regenerates the API reference from the live package and asserts the
committed docs/api.md matches — any signature/docstring drift fails CI until
``make -C docs api`` is rerun. Also sanity-checks the Sphinx scaffold so the
``make -C docs html`` path (for sphinx-equipped machines) stays coherent
with the package layout."""

import re
import subprocess
import sys
from pathlib import Path

DOCS = Path(__file__).resolve().parent.parent / "docs"


def test_api_md_is_fresh(tmp_path):
    committed = (DOCS / "api.md").read_text()
    r = subprocess.run(
        [sys.executable, str(DOCS / "gen_api.py")],
        cwd=str(tmp_path), capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(DOCS.parent)})
    assert r.returncode == 0, r.stdout + r.stderr
    regenerated = (DOCS / "api.md").read_text()
    assert regenerated == committed, (
        "docs/api.md is stale — run `make -C docs api` and commit the result")


def test_sphinx_index_covers_package():
    """Every automodule target in index.rst must import, and every module
    documented by gen_api.py must appear in index.rst (the two pipelines
    stay in sync)."""
    import importlib

    index = (DOCS / "index.rst").read_text()
    targets = re.findall(r"^\.\. automodule:: (\S+)", index, re.M)
    assert targets, "no automodule directives found"
    for t in targets:
        importlib.import_module(t)

    sys.path.insert(0, str(DOCS))
    try:
        import gen_api
    finally:
        sys.path.pop(0)
    for modname, _ in gen_api.MODULES:
        assert modname in index, f"{modname} missing from docs/index.rst"


def test_html_fallback_builds():
    """The dependency-free HTML site (docs/gen_html.py — the executable
    docs build for sphinx-less environments) renders every page and the
    output is well-formed enough to serve: one <html> per page, balanced
    code fences, and the api reference's module headings present."""
    r = subprocess.run(
        [sys.executable, str(DOCS / "gen_html.py")],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(DOCS.parent)})
    assert r.returncode == 0, r.stdout + r.stderr
    out = DOCS / "_build" / "html"
    pages = sorted(p.name for p in out.glob("*.html"))
    assert "index.html" in pages and "api.html" in pages, pages
    api = (out / "api.html").read_text()
    assert api.count("<html") == 1
    assert "<h2>" in api
    assert "pyaudiodsptools_tpu.ops.fft_filter" in api
    arch = (out / "architecture.html").read_text()
    assert "<pre><code>" in arch  # code fences survive the renderer
    index = (out / "index.html").read_text()
    assert 'href="api.html"' in index
