"""Host-side text pipeline: vocab, tokenizers, batch transform, preprocess."""

from thunder_tpu.text.preprocess import expand_numbers, lower_text, normalize_text  # noqa: F401
from thunder_tpu.text.tokenizer import (  # noqa: F401
    BPETokenizer,
    char_tokenizer,
    get_most_frequent_tokens,
    train_sentencepiece_model,
    word_tokenizer,
)
from thunder_tpu.text.lm import ArpaLM, NGramLM  # noqa: F401
from thunder_tpu.text.transform import BatchTextTransformer  # noqa: F401
from thunder_tpu.text.subtitles import to_srt, to_vtt, word_spans  # noqa: F401
from thunder_tpu.text.vocab import Vocabulary  # noqa: F401
from thunder_tpu.text.word_fusion import WordFusionLM, WordNGramLM  # noqa: F401
