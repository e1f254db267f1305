"""Generate docs/api/*.md from the package's docstrings.

The reference ships per-module API pages (`/root/reference/docs/api/*.md`,
mkdocstrings one-liners rendered at docs build).  This environment has no
mkdocstrings, so the equivalent here is generated markdown checked into
docs/api/ — re-run this script after changing public APIs:

    python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "docs" / "api"

#: section -> [(page title, module path)]
PAGES = {
    "Core": [
        ("registry", "thunder_tpu.registry"),
        ("module", "thunder_tpu.module"),
        ("finetune", "thunder_tpu.finetune"),
        ("engine", "thunder_tpu.engine"),
        ("export", "thunder_tpu.export"),
        ("streaming", "thunder_tpu.streaming"),
        ("quantization", "thunder_tpu.quantization"),
        ("profiling", "thunder_tpu.profiling"),
        ("flops", "thunder_tpu.flops"),
        ("utils", "thunder_tpu.utils"),
    ],
    "Models": [
        ("quartznet", "thunder_tpu.models.quartznet"),
        ("citrinet", "thunder_tpu.models.citrinet"),
        ("wav2vec2", "thunder_tpu.models.wav2vec2"),
        ("layers", "thunder_tpu.models.layers"),
        ("decoders", "thunder_tpu.models.decoders"),
        ("audio frontend", "thunder_tpu.audio.frontend"),
    ],
    "Ops": [
        ("masking", "thunder_tpu.ops.masking"),
        ("conv", "thunder_tpu.ops.conv"),
        ("stft", "thunder_tpu.ops.stft"),
        ("ctc", "thunder_tpu.ops.ctc"),
        ("ctc beam search", "thunder_tpu.ops.ctc_beam"),
        ("ctc beam search (device)", "thunder_tpu.ops.ctc_beam_device"),
        ("specaugment", "thunder_tpu.ops.specaugment"),
    ],
    "Kernels": [
        ("frontend (Pallas)", "thunder_tpu.kernels.frontend_pallas"),
        ("separable conv (Pallas)", "thunder_tpu.kernels.separable_conv"),
        ("attention one-panel (Pallas)", "thunder_tpu.kernels.attn_onepanel"),
        ("attention train fwd+bwd (Pallas)", "thunder_tpu.kernels.attn_train"),
        ("add + layernorm (Pallas)", "thunder_tpu.kernels.add_ln"),
        ("add + dropout + layernorm train (Pallas)", "thunder_tpu.kernels.add_ln_train"),
        ("beam search (Pallas)", "thunder_tpu.kernels.beam_pallas"),
        ("ctc recursion (Pallas)", "thunder_tpu.kernels.ctc_pallas"),
        ("selftest", "thunder_tpu.kernels.selftest"),
    ],
    "Text Processing": [
        ("vocab", "thunder_tpu.text.vocab"),
        ("tokenizer", "thunder_tpu.text.tokenizer"),
        ("transform", "thunder_tpu.text.transform"),
        ("preprocess", "thunder_tpu.text.preprocess"),
        ("numbers", "thunder_tpu.text.numbers"),
        ("lm", "thunder_tpu.text.lm"),
        ("word fusion", "thunder_tpu.text.word_fusion"),
        ("sentencepiece model", "thunder_tpu.text.sentencepiece_model"),
    ],
    "Data": [
        ("audio io", "thunder_tpu.data.audio_io"),
        ("dataset", "thunder_tpu.data.dataset"),
        ("datamodule", "thunder_tpu.data.datamodule"),
        ("collate", "thunder_tpu.data.collate"),
    ],
    "Training": [
        ("trainer", "thunder_tpu.training.trainer"),
        ("optim", "thunder_tpu.training.optim"),
        ("metrics", "thunder_tpu.training.metrics"),
        ("checkpointing", "thunder_tpu.training.checkpointing"),
    ],
    "Parallel": [
        ("mesh", "thunder_tpu.parallel.mesh"),
    ],
    "Compatibility": [
        ("nemo", "thunder_tpu.compat.nemo"),
        ("huggingface", "thunder_tpu.compat.hf"),
        ("torch reader", "thunder_tpu.compat.torch_reader"),
    ],
    "Native runtime": [
        ("native bindings", "thunder_tpu.native"),
    ],
}


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    return inspect.getdoc(obj) or ""


def _public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [
        n
        for n, o in vars(mod).items()
        if not n.startswith("_")
        and (inspect.isclass(o) or inspect.isfunction(o))
        and getattr(o, "__module__", None) == mod.__name__
    ]


def render_module(modpath: str, title: str) -> str:
    mod = importlib.import_module(modpath)
    lines = [f"# `{modpath}`", ""]
    if _doc(mod):
        lines += [_doc(mod), ""]
    for name in _public_names(mod):
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            lines += [f"## class `{name}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_doc(obj), ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                fn = inspect.unwrap(meth.__func__ if isinstance(meth, (classmethod, staticmethod)) else meth)
                lines += [f"### `{name}.{mname}{_sig(fn)}`", ""]
                if _doc(fn):
                    lines += [_doc(fn), ""]
        elif inspect.isfunction(obj) or callable(obj):
            lines += [f"## `{name}{_sig(obj)}`", ""]
            if _doc(obj):
                lines += [_doc(obj), ""]
        else:
            lines += [f"## `{name}`", "", f"`{name} = {obj!r}`", ""]
    return "\n".join(lines).rstrip() + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    nav_lines = []
    index = ["# API reference", "", "Generated from docstrings by `scripts/gen_api_docs.py`.", ""]
    for section, pages in PAGES.items():
        nav_lines.append(f"      - {section}:")
        index.append(f"## {section}")
        index.append("")
        sdir = OUT / section.replace(" ", "_").lower()
        sdir.mkdir(exist_ok=True)
        for title, modpath in pages:
            fname = title.replace(" ", "_").replace("(", "").replace(")", "").replace("+", "plus")
            rel = f"api/{sdir.name}/{fname}.md"
            try:
                content = render_module(modpath, title)
            except Exception as e:  # pragma: no cover - generation-time guard
                print(f"SKIP {modpath}: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            (REPO / "docs" / rel).write_text(content)
            nav_lines.append(f"          - {title}: {rel}")
            index.append(f"- [{title}]({sdir.name}/{fname}.md) — `{modpath}`")
        index.append("")
    (OUT / "index.md").write_text("\n".join(index))
    print("nav snippet for mkdocs.yml:")
    print("  - API reference: api/index.md")
    print("\n".join(nav_lines))


if __name__ == "__main__":
    main()
