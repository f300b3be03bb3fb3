from . import transforms, quant  # noqa: F401
