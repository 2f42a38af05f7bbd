from . import projections  # noqa: F401
