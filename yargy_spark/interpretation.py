"""API-compat shim mirroring ``yargy.interpretation``
(/root/reference/yargy/interpretation/__init__.py)."""

from .kernel.interp import (  # noqa: F401
    fact, attribute,
    normalized, inflected, const, custom,
    FactBase as Fact, Interpretator,
)
