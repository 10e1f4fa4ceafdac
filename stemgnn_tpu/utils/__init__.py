from stemgnn_tpu.utils.logger import Logger  # noqa: F401
from stemgnn_tpu.utils.early_stop import EarlyStopping  # noqa: F401
from stemgnn_tpu.utils.metrics import eval_acc, eval_auc, evaluate, task2metric  # noqa: F401
from stemgnn_tpu.utils.seeding import seed_everything  # noqa: F401
