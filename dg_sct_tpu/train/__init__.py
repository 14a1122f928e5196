from . import ave_train, losses, metrics, optim  # noqa: F401
