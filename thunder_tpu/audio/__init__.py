"""Audio frontends and host-side IO."""

from thunder_tpu.audio.frontend import FilterbankFeatures, Wav2Vec2Preprocess  # noqa: F401
