"""ctypes bindings for the native C++ components (built by
native/build.py). Importing raises if the shared library is absent; the
data pipeline falls back to pure python."""

from . import wavio  # noqa: F401

__all__ = ["wavio"]
