from .relation import OverlapRelation, compute_relation  # noqa: F401
