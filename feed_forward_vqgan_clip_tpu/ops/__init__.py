from feed_forward_vqgan_clip_tpu.ops.grad_ops import clamp_with_grad, replace_grad  # noqa: F401
from feed_forward_vqgan_clip_tpu.ops.quantize import (  # noqa: F401
    quantize_indices,
    vector_quantize,
)
from feed_forward_vqgan_clip_tpu.ops.losses import (  # noqa: F401
    l2_loss,
    spherical_dist,
    spherical_dist_loss,
    tv_loss,
)
