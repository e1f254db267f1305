"""Hand-fused Pallas TPU kernels for the hot ops."""

from thunder_tpu.kernels.frontend_pallas import fused_log_mel  # noqa: F401
