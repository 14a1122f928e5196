from . import ave_train, avqa_train, avs_train, avvp_train, losses, metrics, optim  # noqa: F401
