"""Example: subtitle (.srt/.vtt) generation via CTC forced alignment.

Transcribe (or take a known transcript), force-align it to the audio, and
write a subtitle file with word-accurate timings:

    python examples/make_subtitles.py clip.wav --checkpoint model.nemo
    python examples/make_subtitles.py clip.wav --checkpoint model.nemo \
        --transcript "the known transcript" --out clip.vtt
"""

import argparse
from pathlib import Path

import numpy as np

from thunder_tpu.data import AudioFileLoader
from thunder_tpu.registry import load_pretrained
from thunder_tpu.text.subtitles import to_srt, to_vtt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--transcript", help="known text (default: transcribe first)")
    p.add_argument("--out", help="output path (.srt or .vtt; default <audio>.srt)")
    p.add_argument("--max-chars", type=int, default=42)
    p.add_argument("--max-seconds", type=float, default=5.0)
    args = p.parse_args()

    module = load_pretrained(args.checkpoint)
    loader = AudioFileLoader(sample_rate=16000)
    audio = np.asarray(loader(args.audio)[0], np.float32)

    text = args.transcript or module.predict(audio)[0]
    if not text.strip():
        raise SystemExit("empty transcript — nothing to align")
    spans, scores = module.align(audio, [text])
    if not np.isfinite(scores[0]):
        raise SystemExit("transcript does not align to this audio")

    out = Path(args.out) if args.out else Path(args.audio).with_suffix(".srt")
    render = to_vtt if out.suffix == ".vtt" else to_srt
    out.write_text(render(spans[0], max_chars=args.max_chars, max_seconds=args.max_seconds))
    print(f"wrote {out} ({len(spans[0])} aligned tokens)")


if __name__ == "__main__":
    main()
