from stemgnn_tpu.models.pretrain import (  # noqa: F401
    pretrain_init, pretrain_forward, ema_update_teacher,
)
from stemgnn_tpu.models.task import (  # noqa: F401
    task_model_init, task_logits, activation_loss, decoder_jacobian_penalty,
)
