from . import (adapter, ave, avqa, avqa_grounding, avs, avvp, clip, grouping,
               htsat, interleave, pretrain, prompt_learner, swinv2, tpavi)  # noqa: F401
