"""Generate the API reference (docs/api/*.md) from package docstrings.

The reference ships a Sphinx autodoc tree (reference docs/source/reference/
*.rst — plain per-module stubs rendered from docstrings).  Sphinx is not
available in this environment, so this script renders the same artifact —
one page per public module with every public class/function signature and
docstring — as plain markdown, deterministic and committed so the docs
never drift silently (tests/test_docs.py regenerates and diffs them).

    python scripts/build_api_docs.py          # (re)write docs/api/
    python scripts/build_api_docs.py --check  # exit 1 if out of date
"""
import argparse
import re
import importlib
import inspect
import os
import pkgutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU before any JAX-touching import: docs generation must not grab
# the (single-tenant) TPU. The site plugin overrides JAX_PLATFORMS, so use
# jax.config (see CLAUDE.md / tests/conftest.py).
import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "api")


def _iter_modules():
    import flexs_tpu

    yield "flexs_tpu"
    pkg_path = flexs_tpu.__path__
    for info in sorted(
        pkgutil.walk_packages(pkg_path, prefix="flexs_tpu."),
        key=lambda i: i.name,
    ):
        base = info.name.rsplit(".", 1)[-1]
        if base.startswith("_") or ".data" in info.name:
            continue
        yield info.name


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # Default-value reprs of function/instance objects embed memory
    # addresses; scrub them so regeneration is deterministic.
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else ""


def _anchor(text: str) -> str:
    return text.lower().replace(".", "").replace(" ", "-").replace("_", "-")


def _render_function(name, fn, level="###") -> list:
    lines = [f"{level} `{name}{_signature(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return lines


def _render_class(name, cls) -> list:
    try:
        init_sig = _signature(cls.__init__)
        # Drop the `self` parameter for display.
        init_sig = init_sig.replace("(self, ", "(").replace("(self)", "()")
    except Exception:
        init_sig = "(...)"
    lines = [f"### class `{name}{init_sig}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    bases = [
        b.__module__ + "." + b.__qualname__
        for b in cls.__bases__
        if b is not object
    ]
    if bases:
        lines += [f"*Bases:* {', '.join('`%s`' % b for b in bases)}", ""]
    for mname, member in sorted(vars(cls).items()):
        if mname.startswith("_"):
            continue
        if isinstance(member, property):
            lines += [f"#### property `{mname}`", ""]
            pdoc = _doc(member.fget) if member.fget else ""
            if pdoc:
                lines += [pdoc, ""]
        elif inspect.isfunction(member):
            sig = _signature(member).replace("(self, ", "(").replace(
                "(self)", "()"
            )
            lines += [f"#### `{mname}{sig}`", ""]
            mdoc = _doc(member)
            if mdoc:
                lines += [mdoc, ""]
    return lines


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    doc = _doc(mod)
    if doc:
        lines += [doc, ""]

    classes, functions = [], []
    public = getattr(mod, "__all__", None)
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if public is not None and name not in public:
            continue
        # Only document what this module defines (re-exports are documented
        # where they are defined; __init__ pages list them instead).
        if getattr(obj, "__module__", None) != modname:
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))

    if modname.endswith("__init__") or hasattr(mod, "__path__"):
        # Package page: list re-exports with links.
        exports = []
        for name, obj in sorted(vars(mod).items()):
            if name.startswith("_") or (public and name not in public):
                continue
            target = getattr(obj, "__module__", None)
            if (
                inspect.isclass(obj) or inspect.isfunction(obj)
            ) and target and target.startswith("flexs_tpu") and target != modname:
                exports.append((name, target))
        if exports:
            lines += ["## Re-exports", ""]
            for name, target in exports:
                lines.append(f"- `{name}` — defined in [`{target}`]({target}.md)")
            lines.append("")

    if classes:
        lines += ["## Classes", ""]
        for name, cls in classes:
            lines += _render_class(name, cls)
    if functions:
        lines += ["## Functions", ""]
        for name, fn in functions:
            lines += _render_function(name, fn)
    return "\n".join(lines).rstrip() + "\n"


def build() -> dict:
    pages = {}
    index = [
        "# flexs_tpu API reference",
        "",
        "Generated from package docstrings by `scripts/build_api_docs.py`",
        "(the TPU-native analog of the reference's Sphinx autodoc tree,",
        "reference docs/source/reference/*.rst). Regenerate after changing",
        "any public signature or docstring; tests/test_docs.py enforces",
        "freshness.",
        "",
    ]
    for modname in _iter_modules():
        page = render_module(modname)
        pages[f"{modname}.md"] = page
        title = page.splitlines()[0].lstrip("# ").strip("`")
        depth = modname.count(".")
        index.append(f"{'  ' * depth}- [`{title}`]({modname}.md)")
    pages["index.md"] = "\n".join(index) + "\n"
    return pages


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args()

    pages = build()
    if args.check:
        stale = []
        for fname, content in pages.items():
            path = os.path.join(OUT, fname)
            if not os.path.exists(path) or open(path).read() != content:
                stale.append(fname)
        current = {
            f for f in os.listdir(OUT) if f.endswith(".md")
        } if os.path.isdir(OUT) else set()
        stale += sorted(current - set(pages))
        if stale:
            print("stale API docs (run scripts/build_api_docs.py):")
            for f in stale:
                print(f"  {f}")
            sys.exit(1)
        print(f"docs/api up to date ({len(pages)} pages)")
        return

    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT):
        if f.endswith(".md"):
            os.remove(os.path.join(OUT, f))
    for fname, content in pages.items():
        with open(os.path.join(OUT, fname), "w") as fh:
            fh.write(content)
    print(f"wrote {len(pages)} pages to docs/api/")


if __name__ == "__main__":
    main()
