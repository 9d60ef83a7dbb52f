"""API-compat shim mirroring ``yargy.pipelines``
(/root/reference/yargy/pipelines.py)."""

from .kernel.gazetteer import (  # noqa: F401
    pipeline, caseless_pipeline, morph_pipeline,
    GazScheme, CaselessGazScheme, MorphGazScheme,
    GazRule, CaselessGazRule, MorphGazRule, GazProd,
)
