"""Native (C++) runtime pieces, loaded via ctypes with lazy compilation."""

from .build import load_library  # noqa: F401
