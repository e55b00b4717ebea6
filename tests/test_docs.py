"""API docs freshness: docs/api must match what the generator produces.

The committed markdown API reference (docs/api/, the analog of the
reference's Sphinx autodoc tree at reference docs/source/reference/) is
generated from docstrings by scripts/build_api_docs.py; this test
regenerates it in-process and diffs, so a public-signature or docstring
change cannot silently leave the docs stale.
"""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "build_api_docs", os.path.join(REPO, "scripts", "build_api_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_docs_are_fresh():
    gen = _load_generator()
    pages = gen.build()
    out = os.path.join(REPO, "docs", "api")
    stale = []
    for fname, content in pages.items():
        path = os.path.join(out, fname)
        if not os.path.exists(path):
            stale.append(f"missing: {fname}")
        elif open(path).read() != content:
            stale.append(f"outdated: {fname}")
    extra = set(os.listdir(out)) - set(pages)
    stale += [f"orphaned: {f}" for f in sorted(extra) if f.endswith(".md")]
    assert not stale, (
        "docs/api is stale — run `python scripts/build_api_docs.py`:\n"
        + "\n".join(stale)
    )
