"""API-compat shim mirroring ``yargy.morph``
(/root/reference/yargy/morph.py) — lexicon-backed analyzer."""

from .kernel.morphology import (  # noqa: F401
    Form, Morphology, default_morphology, KNOWN_GRAMMEMES,
)
