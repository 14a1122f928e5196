from . import (ave_train, avqa_train, avs_train, avvp_train, losses, metrics,
               optim, pretrain_train)  # noqa: F401
