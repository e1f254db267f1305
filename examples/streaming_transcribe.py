"""Example: incremental (streaming) transcription with beam-search rescoring.

Feeds a wav file to the StreamingTranscriber in small buffers, printing the
stable transcript as it grows, then finishes with a beam-searched decode of
the final audio for comparison.

    python examples/streaming_transcribe.py --checkpoint model.nemo audio.wav
"""

import argparse

import numpy as np

from thunder_tpu.data import AudioFileLoader
from thunder_tpu.engine import InferenceEngine
from thunder_tpu.registry import load_pretrained
from thunder_tpu.streaming import StreamingTranscriber


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--push-ms", type=int, default=250, help="simulated feed size")
    p.add_argument("--chunk-seconds", type=float, default=20.0)
    p.add_argument("--beam-width", type=int, default=16)
    args = p.parse_args()

    module = load_pretrained(args.checkpoint)
    engine = InferenceEngine(module)
    wav = AudioFileLoader(sample_rate=16000)(args.audio)
    wav = np.asarray(wav, np.float32).reshape(-1)

    st = StreamingTranscriber(engine, chunk_seconds=args.chunk_seconds)
    step = int(16000 * args.push_ms / 1000)
    shown = ""
    for i in range(0, len(wav), step):
        partial = st.push(wav[i : i + step])
        if partial != shown:
            print(f"[{i / 16000:6.2f}s] {partial}")
            shown = partial
    print("final (streamed):", st.flush())

    if args.beam_width:
        if len(wav) > args.chunk_seconds * 16000:
            print("final (chunked beam):",
                  engine.predict_long(wav, chunk_seconds=args.chunk_seconds,
                                      beam_width=args.beam_width))
        else:
            print("final (beam):", engine.predict(wav, beam_width=args.beam_width)[0])


if __name__ == "__main__":
    main()
