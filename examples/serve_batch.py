"""Example: high-throughput batch transcription with the inference engine.

    python examples/serve_batch.py --checkpoint model.nemo *.wav
"""

import argparse
import json

import numpy as np

from thunder_tpu.data import AudioFileLoader
from thunder_tpu.engine import InferenceEngine
from thunder_tpu.registry import load_pretrained


def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio", nargs="+")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    module = load_pretrained(args.checkpoint)
    engine = InferenceEngine(module)  # BN-folded, bf16 on TPU
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
        for path, text in zip(paths, engine.predict(batch, lengths)):
            print(json.dumps({"audio": path, "text": text.strip()}))


if __name__ == "__main__":
    main()
