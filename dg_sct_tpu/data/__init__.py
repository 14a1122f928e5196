from . import ave, avqa, avs, avvp  # noqa: F401
