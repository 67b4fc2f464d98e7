from . import sim  # noqa: F401
