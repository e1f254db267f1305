"""Host-side data pipeline: audio IO, datasets, loaders."""

from thunder_tpu.data.audio_io import AudioFileLoader, audio_info, load_audio, resample  # noqa: F401
from thunder_tpu.data.collate import asr_collate  # noqa: F401
from thunder_tpu.data.datamodule import BaseDataModule, DataLoader, ManifestDatamodule  # noqa: F401
from thunder_tpu.data.dataset import BaseSpeechDataset, ManifestSpeechDataset  # noqa: F401
