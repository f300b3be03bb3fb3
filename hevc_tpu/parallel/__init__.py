from . import frames, mesh  # noqa: F401
