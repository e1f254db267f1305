"""Token-level n-gram language model for shallow-fusion beam decoding.

A small, dependency-free LM over *token ids* (chars or sentencepiece pieces —
whatever the model's vocabulary is), with stupid backoff (Brants et al.,
2007).  Pairs with :func:`thunder_tpu.ops.ctc_beam.prefix_beam_search` via
the ``lm=`` hook: each prefix extension is scored
``lm_weight * lm(prefix_ids, next_id)``.

The reference framework has no LM support (greedy decode only); this is a
beyond-parity serving feature.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, Iterable, Sequence, Tuple

__all__ = ["NGramLM"]


class NGramLM:
    """Stupid-backoff n-gram LM over integer token sequences.

    ``score(context, token)`` returns ``log P(token | context)`` using the
    longest matching context, multiplying by the backoff factor per level
    skipped.  Unseen unigrams get a floor of ``oov_logp`` (a log-probability).
    """

    def __init__(self, order: int = 4, backoff: float = 0.4, oov_logp: float = -12.0):
        if order < 1:
            raise ValueError("order must be >= 1")
        self.order = order
        self.backoff = backoff
        self.oov_logp = oov_logp
        # counts[n] maps an n-gram tuple to its count; context totals cached
        self._counts: Dict[int, Dict[Tuple[int, ...], int]] = {
            n: defaultdict(int) for n in range(1, order + 1)
        }
        self._context_totals: Dict[Tuple[int, ...], int] = defaultdict(int)
        self._total_unigrams = 0
        self._native = None  # lazily-built C++ mirror (see native())

    def fit(self, sequences: Iterable[Sequence[int]]) -> "NGramLM":
        self._native = None  # counts change: any built C++ mirror is stale
        for seq in sequences:
            seq = tuple(int(t) for t in seq)
            for i in range(len(seq)):
                for n in range(1, self.order + 1):
                    if i + n > len(seq):
                        break
                    self._counts[n][seq[i : i + n]] += 1
            self._total_unigrams += len(seq)
        # rebuild context totals from scratch so repeated fit() calls
        # (incremental corpora) don't double-count earlier batches
        self._context_totals = defaultdict(int)
        for n in range(2, self.order + 1):
            for gram, c in self._counts[n].items():
                self._context_totals[gram[:-1]] += c
        return self

    @classmethod
    def from_texts(cls, texts: Iterable[str], text_transform, order: int = 4, **kw) -> "NGramLM":
        """Fit from transcripts through a ``BatchTextTransformer`` vocabulary.

        Start/end/pad/blank ids are stripped: CTC beam prefixes never contain
        them, so training on them would leave sentence-initial n-grams
        reachable only through a BOS the scorer never sees.
        """
        import numpy as np

        vocab = text_transform.vocab
        drop = {vocab.blank_idx, vocab.pad_idx}
        for tok in (vocab.start_token, vocab.end_token):
            if tok is not None and tok in vocab.stoi:
                drop.add(vocab.stoi[tok])
        seqs = []
        for t in texts:
            ids, lens = text_transform.encode([t])
            seq = np.asarray(ids)[0, : int(np.asarray(lens)[0])].tolist()
            seqs.append([i for i in seq if i not in drop])
        return cls(order=order, **kw).fit(seqs)

    def score(self, context: Sequence[int], token: int) -> float:
        """log P(token | context) with stupid backoff."""
        ctx = tuple(int(t) for t in context)[-(self.order - 1) :] if self.order > 1 else ()
        penalty = 0.0
        while True:
            gram = ctx + (int(token),)
            c = self._counts[len(gram)].get(gram)
            if c:
                denom = self._context_totals[ctx] if ctx else self._total_unigrams
                return penalty + math.log(c / denom)
            if not ctx:
                return penalty + self.oov_logp
            ctx = ctx[1:]
            penalty += math.log(self.backoff)

    def __call__(self, context: Sequence[int], token: int) -> float:
        return self.score(context, token)

    def native(self):
        """C++ mirror of this LM for in-beam fusion (``None`` if unavailable).

        Built lazily from the count tables and cached; ``fit()`` invalidates
        it.  With a native mirror, :func:`ops.ctc_beam.beam_search_decode` /
        ``beam_search_stream`` fuse LM scores inside the C++ beam search
        (~20x the numpy path) instead of calling this object per extension.
        """
        if self._native is None:
            try:
                from thunder_tpu.native import NativeNGramLM
            except ImportError:
                return None
            try:
                self._native = NativeNGramLM.from_counts(
                    self.order, self.backoff, self.oov_logp, self._counts
                )
            except (ValueError, ImportError):
                return None
        return self._native
