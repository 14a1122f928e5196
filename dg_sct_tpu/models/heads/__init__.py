from . import ave, avs  # noqa: F401
