from . import dataset, labels, losses, train_cnn  # noqa: F401
