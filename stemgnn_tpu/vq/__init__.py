from stemgnn_tpu.vq.quantize import (  # noqa: F401
    vq_init,
    vq_apply,
    vq_kmeans_init,
    adopt_ema_embed,
    get_codes_from_indices,
    get_output_from_indices,
)
