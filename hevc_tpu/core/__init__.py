from . import yuv, zorder  # noqa: F401
