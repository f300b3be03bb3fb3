from . import bitstream, cabac, contexts, scan  # noqa: F401
