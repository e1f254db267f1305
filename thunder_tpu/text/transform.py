"""Batched text encode/decode glue.

Behavioral rebuild of the reference ``BatchTextTransformer``
(`/root/reference/src/thunder/text_processing/transform.py:22-154`):
tokenize -> add specials -> numericalize -> pad, and the inverse CTC decode
(consecutive-duplicate collapse -> tokens -> string -> marker cleanup ->
special-token strip).  Host-side numpy; the padded int arrays feed straight
into jitted train steps.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from thunder_tpu.text.tokenizer import BPETokenizer, char_tokenizer
from thunder_tpu.text.vocab import Vocabulary

__all__ = ["BatchTextTransformer"]


class BatchTextTransformer:
    def __init__(
        self,
        tokens: Sequence[str],
        blank_token: str = "<blank>",
        pad_token: Optional[str] = None,
        unknown_token: Optional[str] = None,
        start_token: Optional[str] = None,
        end_token: Optional[str] = None,
        sentencepiece_model: Optional[str] = None,
        custom_tokenizer_function: Optional[Callable[[str], List[str]]] = None,
    ):
        """Glue that encodes/decodes whole batches of text.

        Tokenizer priority mirrors the reference: custom function >
        sentencepiece model > character tokenizer.
        """
        self.vocab = Vocabulary(
            tokens,
            blank_token=blank_token,
            pad_token=pad_token,
            unknown_token=unknown_token,
            start_token=start_token,
            end_token=end_token,
        )
        if custom_tokenizer_function is not None:
            self.tokenizer = custom_tokenizer_function
        elif sentencepiece_model is not None:
            self.tokenizer = BPETokenizer(sentencepiece_model)
        else:
            self.tokenizer = char_tokenizer

    def encode(
        self, items: Sequence[str], return_length: bool = True, pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray] | np.ndarray:
        """Texts -> padded int32 array (+ lengths).

        Args:
            items: batch of transcripts.
            pad_to: optional static width (for bucketed jit shapes); defaults
                to the batch max length.
        """
        encoded = []
        for text in items:
            toks = self.tokenizer(text)
            toks = self.vocab.add_special_tokens(list(toks))
            encoded.append(self.vocab.numericalize(toks))
        lengths = np.asarray([len(e) for e in encoded], dtype=np.int32)
        width = pad_to if pad_to is not None else max(1, int(lengths.max(initial=1)))
        if int(lengths.max(initial=0)) > width:
            raise ValueError(
                f"pad_to={width} is smaller than the longest encoded text "
                f"({int(lengths.max())} tokens); truncating would corrupt CTC targets"
            )
        batch = np.full((len(encoded), width), self.vocab.pad_idx, dtype=np.int32)
        for i, e in enumerate(encoded):
            batch[i, : len(e)] = e
        if return_length:
            return batch, lengths
        return batch

    def decode_prediction(self, predictions, remove_repeated: bool = True) -> List[str]:
        """(batch, time) argmax ids -> list of strings.

        Collapses consecutive repeats (CTC), maps ids to tokens, joins,
        converts sentencepiece ``▁`` and HF ``|`` markers to spaces, strips
        special tokens.
        """
        out: List[str] = []
        predictions = np.asarray(predictions)
        for row in predictions:
            if remove_repeated and row.size:
                keep = np.ones(row.shape, dtype=bool)
                keep[1:] = row[1:] != row[:-1]
                row = row[keep]
            text = "".join(self.vocab.decode_into_text(row))
            text = text.replace("▁", " ").replace("|", " ")
            text = self.vocab.remove_special_tokens(text)
            out.append(text)
        return out

    @classmethod
    def from_sentencepiece(cls, output_dir: str) -> "BatchTextTransformer":
        """Build from a sentencepiece training output dir (tokenizer.vocab/.model)."""
        special_tokens = {"<s>", "</s>", "<pad>", "<unk>"}
        vocab: List[str] = []
        with open(f"{output_dir}/tokenizer.vocab", "r", encoding="utf-8") as f:
            for line in f:
                piece = line.split("\t")[0]
                if piece in special_tokens:
                    continue
                vocab.append(piece)
        return cls(tokens=vocab, sentencepiece_model=f"{output_dir}/tokenizer.model")

    @property
    def num_tokens(self) -> int:
        return len(self.vocab)
