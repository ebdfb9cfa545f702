"""Native (C) components: the independent Life oracle used for
differential bit-exactness tests, built on demand with the system compiler
and bound via ctypes (no pybind11 dependency)."""

from .build import load_oracle  # noqa: F401
