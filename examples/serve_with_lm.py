"""Example: serving with the word-LM decode stack (beam + ARPA/hotwords).

Transcribe with CTC prefix beam search fused with a word-level LM — the
decode recipe that actually moves WER over greedy.  Any of the three LM
sources work, alone or combined with hotword biasing:

    # a KenLM-trained ARPA file (lmplz -o 3 < corpus.txt > lm.arpa)
    python examples/serve_with_lm.py --checkpoint model.nemo \
        --arpa lm.arpa.gz --lm-weight 1.0 *.wav

    # a word n-gram LM fit on your own transcripts
    python examples/serve_with_lm.py --checkpoint model.nemo \
        --transcripts train.txt --lm-weight 0.8 *.wav

    # pure contextual biasing, no LM at all
    python examples/serve_with_lm.py --checkpoint model.nemo \
        --hotword "anthropic:6" --hotword "pallas:6" *.wav

Everything (ARPA Katz backoff, the boundary fusion, hotwords) runs inside
the C++ beam search; greedy remains the default decode elsewhere.
"""

import argparse
import json

import numpy as np

from thunder_tpu.data import AudioFileLoader
from thunder_tpu.engine import InferenceEngine
from thunder_tpu.registry import load_pretrained
from thunder_tpu.text.lm import ArpaLM
from thunder_tpu.text.word_fusion import WordFusionLM, WordNGramLM


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio", nargs="+")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arpa", help="ARPA/.gz word LM (KenLM/SRILM format)")
    p.add_argument("--transcripts", help="text file to fit a word n-gram LM on")
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--hotword", action="append", default=[], metavar="WORD:BOOST")
    p.add_argument("--word-score", type=float, default=0.0)
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--lm-weight", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    module = load_pretrained(args.checkpoint)
    engine = InferenceEngine(module)

    if args.arpa:
        word_lm = ArpaLM.load(args.arpa)
    elif args.transcripts:
        with open(args.transcripts, encoding="utf-8") as f:
            word_lm = WordNGramLM(order=args.order).fit(line.strip() for line in f)
    else:
        word_lm = None
    hotwords = {}
    for spec in args.hotword:
        word, sep, boost = spec.rpartition(":")
        if not sep or not word:
            raise SystemExit(f"--hotword expects WORD:BOOST, got {spec!r}")
        hotwords[word] = float(boost)
    lm = WordFusionLM(
        word_lm, module.text_transform, word_score=args.word_score, hotwords=hotwords
    )

    loader = AudioFileLoader(sample_rate=16000)
    for i in range(0, len(args.audio), args.batch_size):
        paths = args.audio[i : i + args.batch_size]
        clips = [loader(p)[0] for p in paths]
        width = max(c.shape[-1] for c in clips)
        batch = np.zeros((len(clips), width), dtype=np.float32)
        lengths = np.zeros(len(clips), dtype=np.int32)
        for j, c in enumerate(clips):
            batch[j, : c.shape[-1]] = c
            lengths[j] = c.shape[-1]
        texts = engine.predict(
            batch, lengths, beam_width=args.beam_width, lm=lm, lm_weight=args.lm_weight
        )
        for path, text in zip(paths, texts):
            print(json.dumps({"audio": path, "text": text.strip()}))


if __name__ == "__main__":
    main()
