"""API-compat shim mirroring ``yargy.relations``
(/root/reference/yargy/relations/__init__.py)."""

from .kernel.agree import (  # noqa: F401
    Relation, is_relation, main, Main,
    gender_relation, number_relation, case_relation, gnc_relation,
    AndRel as AndRelation, OrRel as OrRelation, NotRel as NotRelation,
)
