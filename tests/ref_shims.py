"""Import shims that make the FULL reference package importable offline.

The reference (`/root/reference/src/thunder`) depends on pytorch_lightning,
torchmetrics, torchaudio, sentencepiece, num2words and wget — none installed
here.  For end-to-end parity testing we only need the pieces its *inference*
path touches, so each missing dependency gets a minimal stand-in:

- ``pytorch_lightning.LightningModule`` -> ``torch.nn.Module`` subclass with
  no-op ``log``/``save_hyperparameters`` (the predict path never calls a
  Trainer);
- ``torchmetrics`` CER/WER -> no-op metric modules (constructed in
  ``BaseCTCModule.__init__``, used only in validation_step);
- ``torchaudio.functional.melscale_fbanks`` -> HF transformers'
  ``audio_utils.mel_filter_bank`` (an INDEPENDENT third-party implementation
  of the same slaney/slaney algorithm — keeps the parity test non-circular,
  cross-check in tests/test_ops_stft.py::test_mel_filterbank_matches_transformers);
- ``torchaudio.functional.mask_along_axis`` -> direct port of the documented
  semantics (train-only SpecAugment; eval-mode predict never calls it);
- ``sentencepiece`` / ``num2words`` / ``wget`` -> import-time placeholders
  that raise if actually used.

Importing this module installs the shims (idempotent) and puts
``/root/reference/src`` on ``sys.path`` so ``import thunder`` resolves to the
actual reference code.
"""

import sys
import types
from pathlib import Path

import torch

REF_SRC = "/root/reference/src"
HAS_REF = Path(REF_SRC, "thunder/module.py").exists()


def _module(name):
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (availability probes in
    # transformers etc.) doesn't choke on the shim
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    # marker so tests gated on the REAL library (pytest.importorskip) can
    # tell the shim apart once it sits in sys.modules
    mod.__thunder_shim__ = True
    sys.modules[name] = mod
    return mod


def install_reference_shims():
    """Idempotent; safe to call after other tests already imported the
    torch-only reference modules (thunder.blocks etc.)."""
    if not HAS_REF:
        return
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)

    import importlib.metadata as _md

    if not getattr(_md, "_thunder_shimmed", False):
        _orig_version = _md.version

        def _version(name):
            if name == "thunder-speech":
                return "0.0.0"
            return _orig_version(name)

        _md.version = _version
        _md._thunder_shimmed = True

    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        pl.Callback = object
        pl.LightningDataModule = object

    if "torchmetrics" not in sys.modules:
        tm = _module("torchmetrics")
        tm_text = _module("torchmetrics.text")
        tm_cer = _module("torchmetrics.text.cer")
        tm_wer = _module("torchmetrics.text.wer")

        class _NoOpMetric(torch.nn.Module):
            def update(self, *a, **k):
                pass

            def compute(self):
                return torch.tensor(0.0)

            def forward(self, *a, **k):
                return torch.tensor(0.0)

        tm_cer.CharErrorRate = _NoOpMetric
        tm_wer.WordErrorRate = _NoOpMetric
        tm_text.cer = tm_cer
        tm_text.wer = tm_wer
        tm.text = tm_text

    if "torchaudio" not in sys.modules:
        ta = _module("torchaudio")
        ta_f = _module("torchaudio.functional")
        ta_models = _module("torchaudio.models")
        ta_w2v = _module("torchaudio.models.wav2vec2")
        ta_w2v_utils = _module("torchaudio.models.wav2vec2.utils")
        ta_ds = _module("torchaudio.datasets")
        ta_ds_utils = _module("torchaudio.datasets.utils")

        def extract_archive(from_path, to_path):
            import tarfile

            with tarfile.open(from_path) as tar:
                tar.extractall(to_path)
            return to_path

        ta_ds_utils.extract_archive = extract_archive
        ta_ds.utils = ta_ds_utils
        ta.datasets = ta_ds

        def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate, norm=None, mel_scale="htk"):
            from transformers.audio_utils import mel_filter_bank

            fb = mel_filter_bank(
                num_frequency_bins=n_freqs,
                num_mel_filters=n_mels,
                min_frequency=float(f_min),
                max_frequency=float(f_max),
                sampling_rate=sample_rate,
                norm=norm,
                mel_scale=mel_scale,
            )
            return torch.from_numpy(fb).to(torch.float32)

        def mask_along_axis(specgram, mask_param, mask_value, axis):
            # documented torchaudio semantics: one random [v0, v0+v) span
            # masked, v ~ U[0, mask_param), v0 ~ U[0, dim - v)
            dim = specgram.shape[axis]
            value = torch.rand(1).item() * mask_param
            min_value = torch.rand(1).item() * (dim - value)
            mask_start = int(min_value)
            mask_end = int(min_value + value)
            idx = [slice(None)] * specgram.dim()
            idx[axis] = slice(mask_start, mask_end)
            specgram = specgram.clone()
            specgram[tuple(idx)] = mask_value
            return specgram

        def _unavailable(*a, **k):
            raise RuntimeError("torchaudio shim: not implemented offline")

        ta_f.melscale_fbanks = melscale_fbanks
        ta_f.mask_along_axis = mask_along_axis
        ta_f.resample = _unavailable
        ta.functional = ta_f
        ta.load = _unavailable
        ta.info = _unavailable
        ta_w2v_utils.import_huggingface_model = _unavailable
        ta_w2v.utils = ta_w2v_utils
        ta_models.wav2vec2 = ta_w2v
        ta.models = ta_models

    if "sentencepiece" not in sys.modules:
        sp = _module("sentencepiece")

        class SentencePieceProcessor:
            """Backed by thunder_tpu's in-repo sentencepiece engine.  Only
            ``Load`` + ``encode_as_pieces`` (what the reference BPETokenizer
            calls); the e2e predict path never tokenizes, so this is
            construction support, not a parity dependency."""

            def __init__(self, model_file=None, *a, **k):
                self._model = None
                if model_file is not None:
                    self.Load(model_file)

            def Load(self, model_path):
                from thunder_tpu.text.sentencepiece_model import SentencePieceModel

                self._model = SentencePieceModel.load(str(model_path))

            def encode_as_pieces(self, text):
                return self._model.encode_as_pieces(text)

        sp.SentencePieceProcessor = SentencePieceProcessor
        sp.SentencePieceTrainer = types.SimpleNamespace(Train=None)

    if "omegaconf" not in sys.modules:
        oc = _module("omegaconf")

        class OmegaConf:
            @staticmethod
            def load(path):
                import yaml

                with open(path) as f:
                    return yaml.safe_load(f)

            @staticmethod
            def to_container(obj):
                return obj

        oc.OmegaConf = OmegaConf

    if "num2words" not in sys.modules:
        n2w = _module("num2words")

        def num2words(*a, **k):
            raise RuntimeError("num2words shim: not available offline")

        n2w.num2words = num2words

    if "wget" not in sys.modules:
        wg = _module("wget")

        def download(*a, **k):
            raise RuntimeError("wget shim: no network")

        wg.download = download
