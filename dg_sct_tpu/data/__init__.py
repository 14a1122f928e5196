from . import ave  # noqa: F401
