from . import eth_cnn, hcpm  # noqa: F401
