"""Hand-fused Pallas TPU kernels for the hot ops."""

from thunder_tpu.kernels.frontend_pallas import fused_log_mel  # noqa: F401
from thunder_tpu.kernels.stride2_conv import stride2_conv_gelu  # noqa: F401
