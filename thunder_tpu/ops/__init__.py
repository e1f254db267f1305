"""Shared TPU-native ops: masking, convolution, spectral frontend, CTC, augment."""

from thunder_tpu.ops.masking import (  # noqa: F401
    apply_mask,
    lengths_to_mask,
    masked_feature_normalize,
    masked_mean_std,
    normalize_tensor,
)
from thunder_tpu.ops.conv import conv1d, conv_output_length, get_same_padding  # noqa: F401
from thunder_tpu.ops.stft import (  # noqa: F401
    convolution_stft,
    frame_signal,
    hann_window,
    mel_features,
    mel_filterbank,
    next_pow2,
    power_spectrum,
    power_spectrum_lengths,
    preemphasis,
    stft,
)
from thunder_tpu.ops.ctc import (  # noqa: F401
    alignment_segments,
    calculate_ctc,
    collapse_ctc,
    ctc_forced_align,
    ctc_forward_scores,
    ctc_loss,
    greedy_decode,
)
from thunder_tpu.ops.specaugment import spec_augment, spec_cutout  # noqa: F401
from thunder_tpu.ops.ctc_beam import beam_search_decode, prefix_beam_search  # noqa: F401
