"""Import behavioral-spec modules from the read-only reference checkout
(/root/reference) with its heavy external deps stubbed out, so tests can
compare our fresh implementations against the reference's actual behavior.

Only used in tests, only when the reference checkout is present; the
package itself never imports from the reference.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


class _AnyMeta(type):
    def __getattr__(cls, n):
        return _Any

    def __iter__(cls):
        return iter(())

    def __getitem__(cls, k):
        return _Any


class _Any(metaclass=_AnyMeta):
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, n):
        return _Any

    def __iter__(self):
        return iter(())

    def __getitem__(self, k):
        return _Any


def _stub(name: str) -> None:
    if name in sys.modules:
        return
    top = name.partition(".")[0]
    if top not in sys.modules:
        try:
            if importlib.util.find_spec(top) is not None:
                return  # real package installed — let the reference use it
        except (ImportError, ValueError):
            pass
    mod = types.ModuleType(name)

    def _getattr(n, _mod=name):
        if n.startswith("__") and n.endswith("__"):
            # keep introspection (inspect/hypothesis/pyspark) honest on dunders
            raise AttributeError(n)
        return _Any

    mod.__getattr__ = _getattr  # PEP 562
    mod.__path__ = []
    mod.__file__ = f"<stub {name}>"
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = mod


_PRESEED = [
    "epub_generator",
    "doc_page_extractor",
    "ahocorasick",
    "pdf2image",
    "pypdf",
    "PIL",
    "PIL.Image",
    "pylatexenc",
    "pylatexenc.latex2text",
    "markdownify",
    "openai",
    "openai.types",
    "openai.types.chat",
    "tiktoken",
    "httpx",
    "jinja2",
]

_initialized = False


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "pdf_craft"))


def _init() -> None:
    global _initialized
    if _initialized:
        return
    for name in _PRESEED:
        if name not in sys.modules:
            _stub(name)
    pkg = types.ModuleType("pdf_craft")
    pkg.__path__ = [os.path.join(REFERENCE_ROOT, "pdf_craft")]
    sys.modules.setdefault("pdf_craft", pkg)
    _initialized = True


def load_reference_module(name: str):
    """Import e.g. 'pdf_craft.sequence.mergeable'; stubs any further
    missing third-party deps on the fly (bounded retries)."""
    _init()
    for _ in range(20):
        try:
            return importlib.import_module(name)
        except ModuleNotFoundError as e:
            missing = e.name
            if missing is None or missing.startswith("pdf_craft"):
                raise
            _stub(missing)
    raise ImportError(f"could not import {name} after stubbing")
