from . import checkpoint, torch_convert  # noqa: F401
