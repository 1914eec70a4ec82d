from .replay import containment_replay, build_graph_replay  # noqa: F401
