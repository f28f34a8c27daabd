"""Composed query plans + the graded query catalog."""

from __future__ import annotations


def catalog_all():
    """Import every sub-catalog (registration side effects) and return the
    full name → QuerySpec registry."""
    from . import catalog  # noqa: F401

    import importlib.util

    for mod in ("catalog_text", "catalog_llm", "catalog_streaming"):
        if importlib.util.find_spec(f"{__name__}.{mod}") is not None:
            __import__(f"{__name__}.{mod}")
    from .catalog import REGISTRY

    return dict(REGISTRY)
