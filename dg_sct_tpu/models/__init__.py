from . import adapter, ave, avqa, avs, avvp, grouping, htsat, interleave, swinv2, tpavi  # noqa: F401
