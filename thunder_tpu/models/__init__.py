"""Flax model zoo: QuartzNet, Citrinet, wav2vec2 encoders + CTC decoders."""

from thunder_tpu.models.citrinet import CitrinetEncoder  # noqa: F401
from thunder_tpu.models.decoders import Conv1dDecoder, LinearDecoder  # noqa: F401
from thunder_tpu.models.layers import EncoderBlock, MaskedConv1d, SqueezeExcite  # noqa: F401
from thunder_tpu.models.quartznet import QuartznetEncoder  # noqa: F401
