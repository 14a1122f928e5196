from . import adapter, ave, htsat, interleave, swinv2  # noqa: F401
