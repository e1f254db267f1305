"""wav2vec2 encoder in flax (conv feature extractor + transformer).

TPU-native implementation of the architecture the reference reaches through
HuggingFace ``AutoModelForCTC`` (`/root/reference/src/thunder/huggingface/
compatibility.py:23-42,65-112`).  Supports both HF variants:

- ``feat_extract_norm="group"`` + post-layernorm encoder (wav2vec2-base)
- ``feat_extract_norm="layer"`` + pre-layernorm ("stable") encoder
  (wav2vec2-large / lv60)

Layout: waveform ``(batch, time)`` -> hidden ``(batch, frames, hidden)``;
lengths thread through with the HF conv-arithmetic formula
(``_get_feat_extract_output_lengths``).  Attention uses explicit q/k/v/out
Dense projections so HF weights map 1:1 (see compat/hf.py).
"""

from __future__ import annotations

import math
from dataclasses import field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from thunder_tpu.ops.masking import lengths_to_mask

__all__ = ["Wav2Vec2Config", "Wav2Vec2Encoder", "feat_extract_output_lengths", "gelu"]


# minimax odd-polynomial fit of Phi(x) = 0.5*(1+erf(x/sqrt(2))) on [-4, 4],
# |x|-weighted so the *gelu* absolute error equioscillates; exact 0/1 tails.
_GELU_COEFFS = (
    3.9532497308e-01,
    -6.1340755325e-02,
    7.4120497122e-03,
    -5.5134104003e-04,
    2.2377131731e-05,
    -3.7642009188e-07,
)


def _fast_gelu(x: jax.Array) -> jax.Array:
    """Polynomial exact-gelu approximation, max abs error 2.0e-3.

    XLA's ``erf`` on TPU is a slow software expansion (~10x the cost of a
    short polynomial per element — measured 5.8 ms vs 0.6 ms per pass over
    393M elements on v5e); for bf16 compute the 2.0e-3 approximation error
    sits below bf16 activation rounding (~4e-3 at |x|~1), so the fast path
    is numerically free at serving precision.
    """
    f = x.astype(jnp.float32)
    t = jnp.clip(f, -4.0, 4.0)
    t2 = t * t
    p = jnp.asarray(_GELU_COEFFS[-1], jnp.float32)
    for c in _GELU_COEFFS[-2::-1]:
        p = p * t2 + c
    phi = 0.5 + t * p
    phi = jnp.where(f > 4.0, 1.0, jnp.where(f < -4.0, 0.0, phi))
    return (f * phi).astype(x.dtype)


def gelu(x: jax.Array, dtype=None) -> jax.Array:
    """Exact (erf) gelu for f32 parity; fast polynomial for bf16 compute."""
    if (dtype or x.dtype) == jnp.bfloat16:
        return _fast_gelu(x)
    return nn.gelu(x, approximate=False)


class Wav2Vec2Config:
    """Subset of HF Wav2Vec2Config the encoder needs (defaults = base)."""

    def __init__(
        self,
        hidden_size: int = 768,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        intermediate_size: int = 3072,
        conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512),
        conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2),
        conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2),
        conv_bias: bool = False,
        feat_extract_norm: str = "group",
        do_stable_layer_norm: bool = False,
        num_conv_pos_embeddings: int = 128,
        num_conv_pos_embedding_groups: int = 16,
        layer_norm_eps: float = 1e-5,
        hidden_dropout: float = 0.1,
        attention_dropout: float = 0.1,
        feat_proj_dropout: float = 0.1,
        feat_proj_layer_norm: bool = True,
        pos_conv_stack: bool = False,
        conv_pos_kernel_size: Optional[int] = None,
        rel_pos_buckets: int = 0,
        rel_pos_max_distance: int = 0,
        sew_style: bool = False,
        squeeze_factor: int = 1,
        add_adapter: bool = False,
        output_hidden_size: Optional[int] = None,
        num_adapter_layers: int = 3,
        adapter_kernel_size: int = 3,
        adapter_stride: int = 2,
        adapter_attn_dim: Optional[int] = None,
    ):
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.conv_dim = tuple(conv_dim)
        self.conv_kernel = tuple(conv_kernel)
        self.conv_stride = tuple(conv_stride)
        self.conv_bias = conv_bias
        self.feat_extract_norm = feat_extract_norm
        self.do_stable_layer_norm = do_stable_layer_norm
        self.num_conv_pos_embeddings = num_conv_pos_embeddings
        self.num_conv_pos_embedding_groups = num_conv_pos_embedding_groups
        self.layer_norm_eps = layer_norm_eps
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        self.feat_proj_dropout = feat_proj_dropout
        #: HuBERT can drop the feature-projection LayerNorm (HF
        #: ``feat_proj_layer_norm=False``); wav2vec2 always has it
        self.feat_proj_layer_norm = feat_proj_layer_norm
        #: data2vec-audio replaces the single weight-normed positional conv
        #: with a stack of ``num_conv_pos_embeddings`` plain convs (kernel
        #: ``conv_pos_kernel_size``), each followed by a parameter-free
        #: LayerNorm + GELU
        self.pos_conv_stack = pos_conv_stack
        self.conv_pos_kernel_size = conv_pos_kernel_size
        #: WavLM: T5-style bucketed relative position bias, gated per layer
        #: (``rel_pos_buckets`` > 0 switches it on)
        self.rel_pos_buckets = rel_pos_buckets
        self.rel_pos_max_distance = rel_pos_max_distance
        #: SEW: LayerNorm straight after the extractor, the transformer runs
        #: on an avg-pooled (``squeeze_factor``-strided) sequence with a
        #: strided positional conv, and a linear upsample restores the frame
        #: rate afterwards
        self.sew_style = sew_style
        self.squeeze_factor = squeeze_factor
        #: MMS/SpeechEncoderDecoder conv adapter appended after the
        #: transformer (HF ``Wav2Vec2Adapter``): optional down-projection to
        #: ``output_hidden_size`` then ``num_adapter_layers`` GLU convs of
        #: stride ``adapter_stride`` — the CTC head then runs at the
        #: adapter's (further downsampled) frame rate
        self.add_adapter = add_adapter
        self.output_hidden_size = output_hidden_size or hidden_size
        self.num_adapter_layers = num_adapter_layers
        self.adapter_kernel_size = adapter_kernel_size
        self.adapter_stride = adapter_stride
        #: MMS-1B-all per-language attention adapters: a LayerNorm'd
        #: bottleneck (hidden -> adapter_attn_dim -> hidden) added residually
        #: at the end of every (stable-LN) encoder layer
        #: (HF ``Wav2Vec2AttnAdapterLayer``)
        self.adapter_attn_dim = adapter_attn_dim

    @classmethod
    def from_hf(cls, hf_config) -> "Wav2Vec2Config":
        """Any wav2vec2-family HF config (wav2vec2 / hubert / wavlm /
        data2vec-audio — everything ``AutoModelForCTC`` covers that shares
        the conv-frontend + transformer shape, reference
        `huggingface/compatibility.py:65-112`)."""
        model_type = getattr(hf_config, "model_type", "wav2vec2")
        is_d2v = model_type == "data2vec-audio"
        return cls(
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            conv_dim=hf_config.conv_dim,
            conv_kernel=hf_config.conv_kernel,
            conv_stride=hf_config.conv_stride,
            conv_bias=hf_config.conv_bias,
            # data2vec-audio hardcodes per-layer LN convs and post-norm
            # layers (its config has neither flag)
            feat_extract_norm="layer" if is_d2v else hf_config.feat_extract_norm,
            do_stable_layer_norm=getattr(hf_config, "do_stable_layer_norm", False),
            num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
            layer_norm_eps=hf_config.layer_norm_eps,
            hidden_dropout=getattr(hf_config, "hidden_dropout", 0.1),
            attention_dropout=getattr(hf_config, "attention_dropout", 0.1),
            feat_proj_dropout=getattr(hf_config, "feat_proj_dropout", 0.1),
            feat_proj_layer_norm=getattr(hf_config, "feat_proj_layer_norm", True),
            pos_conv_stack=is_d2v,
            conv_pos_kernel_size=getattr(hf_config, "conv_pos_kernel_size", None),
            rel_pos_buckets=getattr(hf_config, "num_buckets", 0) if model_type == "wavlm" else 0,
            rel_pos_max_distance=getattr(hf_config, "max_bucket_distance", 0) if model_type == "wavlm" else 0,
            sew_style=model_type == "sew",
            squeeze_factor=getattr(hf_config, "squeeze_factor", 1) if model_type == "sew" else 1,
            add_adapter=bool(getattr(hf_config, "add_adapter", False)),
            output_hidden_size=getattr(hf_config, "output_hidden_size", None),
            num_adapter_layers=getattr(hf_config, "num_adapter_layers", 3),
            adapter_kernel_size=getattr(hf_config, "adapter_kernel_size", 3),
            adapter_stride=getattr(hf_config, "adapter_stride", 2),
            adapter_attn_dim=getattr(hf_config, "adapter_attn_dim", None),
        )


def feat_extract_output_lengths(lengths, kernels: Sequence[int], strides: Sequence[int]):
    """HF ``_get_feat_extract_output_lengths``: floor((L - k) / s) + 1 per layer."""
    for k, s in zip(kernels, strides):
        lengths = (lengths - k) // s + 1
    return lengths


class _MaskedInstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over valid frames.

    HF's first-layer GroupNorm (groups == channels) normalizes over the whole
    padded time axis, so its statistics depend on bucket fill — fine for the
    reference (pads to batch max) but not for static buckets; masking the
    statistics is identical for unpadded inputs (the HF-parity tests) and
    padding-invariant otherwise.  Param layout matches nn.GroupNorm.
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        m = mask.astype(jnp.float32)[:, :, None]
        n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        xf = x.astype(jnp.float32)
        # one-pass E[x]/E[x^2] statistics (one HBM read instead of the
        # two-pass mean-then-var read pair; same trick as TorchBatchNorm's
        # training stats) followed by a folded scale/shift normalize
        xm = xf * m
        mean = xm.sum(axis=1, keepdims=True) / n
        var = jnp.maximum((xm * xf).sum(axis=1, keepdims=True) / n - mean * mean, 0.0)
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return (xf * a + b).astype(self.dtype)


class _ExtractorConv(nn.Module):
    """``nn.Conv(padding=VALID)`` with an opt-in int8-compute serving path.

    Float mode (init / training / default serving): identical parameters
    (``{kernel: (K, Cin, Cout), bias}``) and math to the ``nn.Conv`` it
    replaces — checkpoints and the HF importer see no difference.  When the
    supplied variables carry ``kernel_q8``/``kernel_scale`` leaves (engine
    ``int8_compute`` mode, ``quantization.quantize_tree_compute``), the conv
    runs int8 x int8 -> int32 on the MXU (measured 380 TOPS vs 194 TFLOPS
    bf16 at the k=3/C=512 extractor shape on v5e) with dynamic per-sample
    activation quantization (``quantization.dynamic_int8_conv``).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.has_variable("params", "kernel_q8"):
            from thunder_tpu.quantization import dynamic_int8_conv

            kq = self.get_variable("params", "kernel_q8")
            scale = self.get_variable("params", "kernel_scale")
            y = dynamic_int8_conv(x, kq, scale, self.stride)
            if self.use_bias:
                y = y + self.get_variable("params", "bias").astype(jnp.float32)
            return y.astype(self.dtype)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        else:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias if self.use_bias else y


class _FeatureExtractor(nn.Module):
    # NOTE: a fused Pallas stride-2 conv+gelu extractor was built and
    # measured in round 2 — it LOST end-to-end on chip (encoder forward
    # −19.8% at 15 s, −28.3% at 30 s vs XLA's strided-conv emitter with
    # fused epilogues; docs/benchmarks.md "closed design space") and was
    # removed; XLA's native path is the fast one.  The remaining extractor
    # lever is precision: _ExtractorConv adds an int8-compute serving path.
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        specs = list(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride))
        x = x[:, :, None]  # (B, T, 1)
        cur = lengths.astype(jnp.int32)
        for i, (dim, k, s) in enumerate(specs):
            x = _ExtractorConv(
                features=dim,
                kernel_size=k,
                stride=s,
                use_bias=cfg.conv_bias,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            cur = (cur - k) // s + 1
            if cfg.feat_extract_norm == "group" and i == 0:
                # HF GroupNorm(groups == channels) == per-channel instance
                # norm; statistics masked to valid frames (see docstring)
                x = _MaskedInstanceNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="gn")(
                    x, lengths_to_mask(cur, x.shape[1])
                )
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=f"ln{i}")(x)
            x = gelu(x, self.dtype)
        return x


def _flash_min_seq() -> int:
    """Sequence-length threshold for the flash path (default 640; override
    with THUNDER_FLASH_MIN_SEQ for A/B measurement — scripts/bench_w2v2.py)."""
    import os

    return int(os.environ.get("THUNDER_FLASH_MIN_SEQ", "640"))


def _use_flash_attention(
    dtype, train: bool, seq_len: int, attention_dropout: float = 0.0
) -> bool:
    """Fused flash attention on the TPU bf16 path for long inputs.

    A/B on v5e (scripts/bench_w2v2.py, wav2vec2-base end-to-end, B=16): with
    tuned block sizes (bq=512, full-length k panel) flash WINS at T=768
    (43.2 -> 39.9 ms/batch, +8%) but loses at T<=512 (5 s: 12.8 -> 14.1 ms;
    10 s/T=512: 24.4 -> 25.1 ms) — at short k panels the running-max/
    renormalize pass isn't amortized and dh=64 wastes half the MXU lanes, so
    the unfused bf16-score path stays faster.  Crossover sits between 512
    and 768 frames -> threshold 640.  Past ~1k frames flash's linear memory
    is also what keeps the (B, H, T, T) score tensor from dominating.

    Training is allowed through (the jax Pallas flash kernel carries a
    custom_vjp, so fwd AND bwd avoid materializing the (B, H, T, T) score
    tensor) EXCEPT when attention-prob dropout is active — dropout needs the
    materialized probabilities, so ``attention_dropout > 0`` falls back to
    the unfused path in train mode.  Since round 5 this stock-flash train
    gate is mostly a FALLBACK: dh=64 configs (every wav2vec2/HuBERT family
    member) train through ``kernels.attn_train.mha_train`` instead — see
    ``_use_train_attn`` — which carries in-kernel prob dropout and a
    one-panel backward, so the dropout>0 restriction here only bites shapes
    the train kernel rejects."""
    return (
        dtype == jnp.bfloat16
        and not (train and attention_dropout > 0.0)
        and seq_len >= _flash_min_seq()
        and jax.default_backend() == "tpu"
    )


def _use_train_attn(dtype, train: bool, seq_len: int, cfg: "Wav2Vec2Config") -> bool:
    """Gate for the one-panel TRAIN attention kernel (kernels/attn_train.py).

    Round-5 measurement (scripts/bench_flash_bwd.py harness, B=16 x T=768,
    chain-timed): attention fwd+bwd 6.75 ms (stock flash, tuned blocks) ->
    3.85 ms, and in-kernel prob dropout costs only +4% — so the HF-default
    ``attention_dropout=0.1`` finetune config rides the fast path instead of
    the materialized-score fallback.  Unlike the stock-flash serving gate
    there is NO lower length threshold: the round-5 crossover sweep
    (constant B*T work, dropout 0.1, fwd+bwd vs the materialized-score
    path) measured the kernel ahead at every length — T=256: 2.49 vs
    3.85 ms, T=384: 3.14 vs 5.26, T=512: 2.69 vs 6.91, T=768: 3.28 vs
    7.87 — so short-utterance (5-10 s) training rides it too.  Bounds: dh
    must be 64 with an even head count (the head-pair lane packing), and
    T <= 1536 keeps the backward's full k/v panels + f32 score blocks
    inside VMEM (covers 30 s audio; longer sequences fall back to stock
    flash / unfused).  Kill switch: THUNDER_TRAIN_ATTN=0.
    """
    import os

    if os.environ.get("THUNDER_TRAIN_ATTN", "1") == "0":
        return False
    dh = cfg.hidden_size // cfg.num_attention_heads
    return (
        train
        and dtype == jnp.bfloat16
        and dh == 64
        and cfg.num_attention_heads % 2 == 0
        and 128 <= seq_len <= 1536
        and jax.default_backend() == "tpu"
    )


def _use_fused_add_ln_train(dtype, train: bool, rows: int, d: int) -> bool:
    """Gate for the TRAIN-side fused add+dropout+LayerNorm
    (kernels/add_ln_train.py, custom_vjp fwd+bwd).  Covers the two
    post-norm residual-LN sites per layer; the hidden-state dropout that HF
    applies before each of them runs in-kernel (Mosaic PRNG), so the
    separate mask tensors' HBM churn disappears from both passes.  Kill
    switch: THUNDER_FUSED_ADDLN_TRAIN=0."""
    import os

    if os.environ.get("THUNDER_FUSED_ADDLN_TRAIN", "1") == "0":
        return False
    return (
        dtype == jnp.bfloat16
        and train
        and rows % 256 == 0
        and d % 128 == 0
        and jax.default_backend() == "tpu"
    )


def _use_fused_add_ln(dtype, train: bool, rows: int, d: int) -> bool:
    """Fused residual-add+LayerNorm on the TPU bf16 inference path.

    The Pallas kernel (kernels/add_ln.py) reads ``x`` and ``y`` once and
    writes the normalized result once (3 HBM passes) where XLA's two-fusion
    lowering re-reads both inputs for the normalize (~5 passes).  Training
    keeps the plain expression (autodiff through the unfused math).  Gated
    off unless the feature dim tiles the 128-lane axis and the row count
    tiles the 8-sublane axis."""
    import os

    if os.environ.get("THUNDER_FUSED_ADDLN", "1") == "0":
        return False
    return (
        dtype == jnp.bfloat16
        and not train
        and rows % 8 == 0
        and d % 128 == 0
        and jax.default_backend() == "tpu"
    )


class _AddLayerNorm(nn.Module):
    """``LayerNorm(x + dropout(y))`` with the same param tree as ``nn.LayerNorm``.

    Serving (bf16, eval, TPU) routes to the one-pass Pallas kernel; training
    (bf16, TPU) routes to the custom_vjp fused kernel with IN-KERNEL
    dropout on ``y`` (kernels/add_ln_train.py); every other path applies
    ``nn.Dropout`` then math bit-identical to flax's ``nn.LayerNorm`` on
    ``x + y`` (f32 fast-variance statistics, ``(x-mu) * (rsqrt(var+eps) *
    scale) + bias`` in f32, cast to the compute dtype) — pinned by
    tests/wav2vec2/test_add_ln.py.  ``dropout_rate=0`` (the default)
    reproduces the old plain add+LN exactly."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, y: jax.Array, train: bool = False, dropout_rate: float = 0.0
    ) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if _use_fused_add_ln_train(self.dtype, train, rows, d):
            from thunder_tpu.kernels.add_ln_train import add_ln_dropout_train

            rate = float(dropout_rate) if train else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            return add_ln_dropout_train(
                x, y, scale, bias, seed, dropout_rate=rate, eps=self.epsilon
            )
        if dropout_rate > 0.0:
            y = nn.Dropout(rate=dropout_rate, deterministic=not train)(y)
        if _use_fused_add_ln(self.dtype, train, rows, d):
            from thunder_tpu.kernels.add_ln import add_layer_norm

            return add_layer_norm(x, y, scale, bias, eps=self.epsilon)
        s = jnp.asarray(x + y)  # residual add in the compute dtype, as before
        f = s.astype(jnp.promote_types(s.dtype, jnp.float32))
        mu = jnp.mean(f, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, jnp.mean(f * f, axis=-1, keepdims=True) - mu * mu)
        out = (f - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return out.astype(self.dtype)


def _wavlm_position_bias(embed: jax.Array, T: int, num_buckets: int, max_distance: int) -> jax.Array:
    """WavLM relative position bias: ``(num_buckets, H)`` table -> ``(H, T, T)``.

    T5-style bidirectional bucketing (`modeling_wavlm.WavLMAttention.
    _relative_positions_bucket`): half the buckets for sign, half of those
    exact small distances, the rest log-spaced up to ``max_distance``.
    """
    nb = num_buckets // 2
    rel = jnp.arange(T, dtype=jnp.int32)[None, :] - jnp.arange(T, dtype=jnp.int32)[:, None]
    buckets = (rel > 0).astype(jnp.int32) * nb
    dist = jnp.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(jnp.maximum(dist, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    buckets = buckets + jnp.where(dist < max_exact, dist, large)
    return embed[buckets].transpose(2, 0, 1)  # (H, T, T)


class _Dense(nn.Module):
    """``nn.Dense`` with an opt-in int8-compute serving path.

    Float mode (init / training / default serving): identical parameters
    (``{kernel, bias}``) and math to ``nn.Dense(features, dtype=dtype)`` —
    checkpoints and the HF importer (compat/hf.py) see no difference.  When
    the supplied variables instead carry ``kernel_q8``/``kernel_scale``
    leaves (engine ``int8_compute`` mode, built by
    ``quantization.quantize_tree_compute``), the matmul runs
    int8 x int8 -> int32 on the MXU (measured 330 vs 233 TFLOPS bf16 on
    v5e, scripts/bench_int8_matmul.py) with dynamic per-row activation
    quantization — the TPU-native W8A8 analogue of the
    reference's torch dynamic quantization
    (`/root/reference/src/thunder/huggingface/compatibility.py:128-132`).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # GEMMs run over a flattened (B*T, K) view: measured on v5e at the
        # serving shape (16, 768, 768) the batched 3-D dot runs at 186
        # TFLOPS vs 306 for the identical 2-D matmul (scripts/bench_ffn.py
        # full_3d vs full_2d) — XLA tiles the batch dim separately instead
        # of fusing it into M.  The reshapes are free (contiguous layout).
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1]) if x.ndim > 2 else x
        if self.has_variable("params", "kernel_q8"):
            from thunder_tpu.quantization import dynamic_int8_matmul

            kq = self.get_variable("params", "kernel_q8")
            scale = self.get_variable("params", "kernel_scale")
            bias = self.get_variable("params", "bias")
            y = dynamic_int8_matmul(x2, kq, scale) + bias.astype(jnp.float32)
            return y.astype(self.dtype).reshape(*lead, self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x2, kernel, bias = nn.dtypes.promote_dtype(x2, kernel, bias, dtype=self.dtype)
        return (x2 @ kernel + bias).reshape(*lead, self.features)


class _Attention(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_mask: jax.Array,
        train: bool = False,
        position_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        h, heads = cfg.hidden_size, cfg.num_attention_heads
        dh = h // heads
        # fused QKV: one (h, 3h) matmul reads x once and fills the MXU's N
        # dimension; the HF importer concatenates q/k/v kernels (compat/hf.py)
        qkv = _Dense(3 * h, dtype=self.dtype, name="qkv_proj")(x)
        t = x.shape[1]
        if (
            position_bias is None
            and _use_train_attn(self.dtype, train, t, cfg)
            and t % 128 == 0
        ):
            # One-panel TRAIN kernel (custom_vjp fwd+bwd, in-kernel prob
            # dropout): q/k/v sliced from the packed (B, T, 3H) GEMM output
            # and the backward emits the packed [dq|dk|dv] cotangent — see
            # kernels/attn_train.py and the _use_train_attn measurements.
            from thunder_tpu.kernels.attn_train import mha_train

            lens = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
            if cfg.attention_dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            out = mha_train(
                qkv, lens, seed, heads=heads, dropout_rate=float(cfg.attention_dropout)
            )
            return _Dense(h, dtype=self.dtype, name="out_proj")(out)
        if (
            position_bias is None
            and not train  # fwd-only kernel: no vjp — train uses _flash_mha
            and _use_flash_attention(self.dtype, train, t)
            and dh == 64
            and heads % 2 == 0
            and t % 128 == 0
            and t <= 4096
        ):
            # One-panel Pallas kernel: q/k/v panels are BlockSpec-sliced
            # straight out of the packed (B, T, 3H) GEMM output and the
            # result lands back in (B, T, H) — zero splits/pads/transposes.
            # Measured on v5e (scripts/bench_attn_layout.py, qkv GEMM +
            # attention + out GEMM): 2.39 vs 5.08 ms/layer at (B=64, T=768)
            # against the split+transpose flash path; block_q sweep there
            # picked 512 (2.73/2.39/3.09 at bq 256/512/768).
            from thunder_tpu.kernels.attn_onepanel import mha_from_qkv

            lens = jnp.sum(key_mask.astype(jnp.int32), axis=-1)
            out = mha_from_qkv(qkv, lens, heads=heads, block_q=512 if t <= 3072 else 128)
            return _Dense(h, dtype=self.dtype, name="out_proj")(out)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # HF scales the query projection by dh**-0.5
        q = q * (dh**-0.5)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], heads, dh)
        if position_bias is None and _use_flash_attention(
            self.dtype, train, x.shape[1], cfg.attention_dropout
        ):
            out = _flash_mha(split(q), split(k), split(v), key_mask)
        else:
            # bf16 inference: store the materialized (B, H, T, T) scores in
            # bf16 — the MXU still accumulates f32; this halves the dominant
            # HBM traffic of the unfused path (the score tensor is ~430 MB
            # f32 at B=16, T=749).  Softmax max-subtraction keeps bf16's
            # 8 exponent bits safe; training/f32 paths keep f32 scores.
            score_t = self.dtype if (self.dtype == jnp.bfloat16 and not train) else jnp.float32
            scores = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k), preferred_element_type=score_t)
            if position_bias is not None:
                # WavLM gated relative position bias: the shared (H, T, T)
                # bucketed bias is scaled per (batch, head, query) by a gate
                # computed from this layer's input hidden states
                # (`modeling_wavlm.WavLMAttention.forward` steps 1-4)
                g = x.reshape(x.shape[0], x.shape[1], heads, dh).transpose(0, 2, 1, 3)
                proj = nn.Dense(8, dtype=jnp.float32, name="gru_rel_pos_linear")(
                    g.astype(jnp.float32)
                )
                proj = proj.reshape(*proj.shape[:-1], 2, 4).sum(-1)  # (B, H, T, 2)
                gates = jax.nn.sigmoid(proj)
                const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, heads, 1, 1))
                gate_out = gates[..., 0] * (gates[..., 1] * const[:, :, :, 0] - 1.0) + 2.0
                scores = scores + (gate_out[..., None] * position_bias[None]).astype(scores.dtype)
            neg = jnp.asarray(jnp.finfo(score_t).min, scores.dtype)
            scores = jnp.where(key_mask[:, None, None, :], scores, neg)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            probs = nn.Dropout(rate=cfg.attention_dropout, deterministic=not train)(probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, split(v))
        out = out.reshape(x.shape[0], x.shape[1], h)
        return _Dense(h, dtype=self.dtype, name="out_proj")(out)


def _flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, key_mask: jax.Array) -> jax.Array:
    """jax's Pallas TPU flash-attention over (B, T, H, dh) inputs.

    Padding is excluded by giving padded positions segment id 1 (valid = 0):
    valid queries then never attend padded keys; padded query rows attend
    only padding and are zeroed downstream by the caller's length masking.
    q must already carry the dh**-0.5 scale (HF convention).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, heads, dh = q.shape
    t_pad = -(-t // 128) * 128
    pad = t_pad - t

    def to_bhtd(a):
        a = jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else a
        return a.transpose(0, 2, 1, 3)

    seg = jnp.pad(~key_mask, ((0, 0), (0, pad)), constant_values=True).astype(jnp.int32)
    # Block sizes from the v5e sweep (scripts/bench_flash_blocks.py, dh=64):
    # a full-length k panel always wins (amortizes the running-max pass),
    # and block_b > 1 is the big lever — batching batch entries per grid
    # step fills the MXU past the dh=64 half-lane ceiling:
    #   T=768,  B=16: (bq=256, bb=8) 0.199 ms/layer (146 TFLOPS)
    #                  vs (384, bb=1) 0.574 — 2.9x
    #   T=1536, B=8:  (bq=768, bb=2) 0.695 ms/layer (83 TFLOPS)
    #                  vs (512, bb=1) 0.91
    # VMEM bounds the product: combos with bq*bk*bb beyond ~2.4M elements
    # fail Mosaic compilation (e.g. 768x1536x4), hence the budget check.
    # The surface is jagged (bq=384 at bb=8 is 1.6x slower than bq=256), so
    # this is a measured preference list, not a formula.
    def _fits(bq_c, bb_c):
        return (
            t_pad % bq_c == 0
            and b % bb_c == 0
            and bq_c * t_pad * bb_c <= 2_400_000
        )

    for bq, bb in ((256, 8), (768, 2), (256, 4), (384, 2), (512, 2), (256, 2)):
        if _fits(bq, bb):
            break
    else:
        bb = 1
        bq = 128
        for d in range(128, min(512, t_pad) + 1, 128):
            if t_pad % d == 0:
                bq = d
    bk = 128
    for d in range(128, min(4096, t_pad) + 1, 128):
        if t_pad % d == 0:
            bk = d
    blocks = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        to_bhtd(q), to_bhtd(k), to_bhtd(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=1.0,
        block_sizes=blocks,
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :t] if pad else out


class _EncoderLayer(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        key_mask: jax.Array,
        train: bool = False,
        position_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        attn = _Attention(cfg, dtype=self.dtype, name="attention")
        drop = lambda v: nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(v)
        if cfg.do_stable_layer_norm:
            x = x + drop(attn(ln("layer_norm")(x), key_mask, train=train, position_bias=position_bias))
            y = ln("final_layer_norm")(x)
            y = _Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(y)
            y = gelu(y, self.dtype)
            y = drop(_Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(y))
            x = x + y
            if cfg.adapter_attn_dim:
                # MMS per-language attention adapter: residual LayerNorm'd
                # bottleneck at the layer tail (HF attaches it only to the
                # stable-LN encoder layer, `Wav2Vec2AttnAdapterLayer`)
                a = ln("adapter_norm")(x)
                a = nn.Dense(cfg.adapter_attn_dim, dtype=self.dtype, name="adapter_dense1")(a)
                a = nn.relu(a)
                a = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="adapter_dense2")(a)
                x = x + a
            return x
        add_ln = lambda name: _AddLayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        # hidden-state dropout on the residual branch is handled INSIDE
        # _AddLayerNorm (in-kernel on the fused train path, nn.Dropout
        # otherwise) — same semantics as the previous drop(...) wrapping
        x = add_ln("layer_norm")(
            x,
            attn(x, key_mask, train=train, position_bias=position_bias),
            train=train,
            dropout_rate=cfg.hidden_dropout,
        )
        y = _Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        y = gelu(y, self.dtype)
        y = _Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(y)
        return add_ln("final_layer_norm")(x, y, train=train, dropout_rate=cfg.hidden_dropout)


class Wav2Vec2Encoder(nn.Module):
    """Waveform -> transformer hidden states, with length threading.

    Drop-in encoder for ``CTCModel`` (same ``(x, lengths, train)`` contract as
    the conv encoders).
    """

    config: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    mask_input: bool = True
    dtype: jnp.dtype = jnp.float32
    #: rematerialize each transformer layer in the backward pass
    #: (jax.checkpoint per layer — the standard TPU HBM/FLOPs trade)
    remat: bool = False
    #: stop gradients at the conv feature-extractor output.  This is the
    #: functional form of HF ``freeze_feature_encoder()`` — which the
    #: reference adapter calls unconditionally on load
    #: (`huggingface/compatibility.py:27-28`) — and, unlike masking updates
    #: in the optimizer, lets XLA dead-code-eliminate the entire extractor
    #: backward pass (the extractor has no trainable inputs upstream of it).
    freeze_feature_extractor: bool = False

    @property
    def final_dimension(self) -> int:
        if self.config.add_adapter:
            return self.config.output_hidden_size
        return self.config.hidden_size

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        feats = _FeatureExtractor(cfg, dtype=self.dtype, name="feature_extractor")(
            x, lengths, train=train
        )
        if self.freeze_feature_extractor:
            feats = jax.lax.stop_gradient(feats)
        out_lengths = feat_extract_output_lengths(
            lengths.astype(jnp.int32), cfg.conv_kernel, cfg.conv_stride
        )

        if cfg.sew_style:
            return self._sew_encode(feats, out_lengths, train)

        # feature projection (HuBERT can omit the LayerNorm,
        # HF ``feat_proj_layer_norm=False``)
        h = feats
        if cfg.feat_proj_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="fp_layer_norm")(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fp_projection")(h)
        h = nn.Dropout(rate=cfg.feat_proj_dropout, deterministic=not train)(h)

        # Padding is always masked out of attention and zeroed before the
        # transformer.  The reference only does this when the HF feature
        # extractor requests attention masks (`huggingface/compatibility.py:
        # 32-37`) because its collate pads to the batch max; with static
        # bucket padding an unmasked model would attend bucket fill.  For
        # unpadded inputs (the reference's regime) this is a no-op, so logit
        # parity with HF is preserved (tests/wav2vec2).
        mask = lengths_to_mask(out_lengths, h.shape[1])
        h = jnp.where(mask[:, :, None], h, 0.0)
        key_mask = mask

        if cfg.pos_conv_stack:
            # data2vec-audio: a stack of plain grouped convs, each followed
            # by a parameter-free LayerNorm + GELU
            # (`modeling_data2vec_audio.Data2VecAudioPositionalConvLayer`)
            k = cfg.conv_pos_kernel_size
            pos = h
            for i in range(cfg.num_conv_pos_embeddings):
                pos = nn.Conv(
                    features=cfg.hidden_size,
                    kernel_size=(k,),
                    padding=[(k // 2, k // 2)],
                    feature_group_count=cfg.num_conv_pos_embedding_groups,
                    dtype=self.dtype,
                    name=f"pos_conv{i}",
                )(pos)
                if k % 2 == 0:
                    pos = pos[:, : h.shape[1], :]
                pos = nn.LayerNorm(
                    epsilon=1e-5, use_scale=False, use_bias=False, dtype=self.dtype
                )(pos)
                pos = gelu(pos, self.dtype)
        else:
            # convolutional positional embedding (weight-normed conv in HF;
            # the importer folds g*v/||v|| into a plain kernel)
            k = cfg.num_conv_pos_embeddings
            pos = nn.Conv(
                features=cfg.hidden_size,
                kernel_size=(k,),
                padding=[(k // 2, k // 2)],
                feature_group_count=cfg.num_conv_pos_embedding_groups,
                dtype=self.dtype,
                name="pos_conv",
            )(h)
            if k % 2 == 0:  # HF SamePad removes the trailing frame for even kernels
                pos = pos[:, : h.shape[1], :]
            pos = gelu(pos, self.dtype)

        if not cfg.do_stable_layer_norm:
            h = _AddLayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="enc_layer_norm")(
                h, pos, train=train
            )
        else:
            h = h + pos
        # HF applies encoder-level dropout here, after pos-conv (+ LN)
        h = nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(h)

        # On the flash path, pad frames to a 128-multiple ONCE here instead of
        # per attention call: _flash_mha otherwise pads q/k/v and slices the
        # output every layer (8 HBM copies/layer at 30 s audio).  Padded
        # frames carry key_mask=False so every valid-frame output is
        # unchanged (masked attention, per-frame LN/FFN); the pad is sliced
        # off after the layer stack.
        t_real = h.shape[1]
        pad_frames = 0
        if (
            not cfg.rel_pos_buckets
            and (
                _use_flash_attention(self.dtype, train, t_real, cfg.attention_dropout)
                or _use_train_attn(self.dtype, train, t_real, cfg)
            )
            and t_real % 128
        ):
            pad_frames = -(-t_real // 128) * 128 - t_real
            h = jnp.pad(h, ((0, 0), (0, pad_frames), (0, 0)))
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_frames)))
        position_bias = None
        if cfg.rel_pos_buckets:
            # WavLM: T5-style bucketed relative position bias, computed once
            # from the layer-0 embedding table and shared by every layer
            # (each layer applies its own gate inside _Attention)
            embed = self.param(
                "rel_attn_embed",
                nn.initializers.normal(stddev=1.0),
                (cfg.rel_pos_buckets, cfg.num_attention_heads),
            )
            position_bias = _wavlm_position_bias(
                jnp.asarray(embed, jnp.float32),
                h.shape[1],
                cfg.rel_pos_buckets,
                cfg.rel_pos_max_distance,
            )
        layer_cls = nn.remat(_EncoderLayer, static_argnums=(3,)) if self.remat else _EncoderLayer
        for i in range(cfg.num_hidden_layers):
            h = layer_cls(cfg, dtype=self.dtype, name=f"layer{i}")(h, key_mask, train, position_bias)
        if pad_frames:
            h = h[:, :t_real]
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="enc_layer_norm")(h)
        if cfg.add_adapter:
            h, out_lengths = self._adapter(h, out_lengths)
        return h, out_lengths

    def _adapter(self, h: jax.Array, out_lengths: jax.Array):
        """HF ``Wav2Vec2Adapter``: optional down-projection + LayerNorm, then
        ``num_adapter_layers`` strided GLU convs.  The returned lengths use
        HF's ``_get_feat_extract_output_lengths(add_adapter=True)`` formula
        (kernel treated as 1 — exact for the default k=3/pad=1)."""
        cfg = self.config
        if cfg.output_hidden_size != cfg.hidden_size:
            h = nn.Dense(cfg.output_hidden_size, dtype=self.dtype, name="adapter_proj")(h)
            # HF constructs this LayerNorm with the torch default eps (1e-5),
            # not config.layer_norm_eps
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="adapter_proj_ln")(h)
        for i in range(cfg.num_adapter_layers):
            y = nn.Conv(
                features=2 * cfg.output_hidden_size,
                kernel_size=(cfg.adapter_kernel_size,),
                strides=(cfg.adapter_stride,),
                padding=[(1, 1)],
                dtype=self.dtype,
                name=f"adapter_conv{i}",
            )(h)
            a, b = jnp.split(y, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)  # torch glu(dim=channels)
            out_lengths = (out_lengths - 1) // cfg.adapter_stride + 1
        return h, out_lengths

    def _sew_encode(self, feats: jax.Array, out_lengths: jax.Array, train: bool):
        # plain helper invoked from the compact __call__ (flax allows only
        # one @nn.compact method; submodules defined here still register)
        """SEW head (`modeling_sew.SEWModel/SEWEncoder`): LayerNorm on the
        extractor output (+ projection when dims differ), avg-pool squeeze by
        ``squeeze_factor`` added to a stride-``squeeze_factor`` positional
        conv, a standard post-norm transformer on the short sequence, then a
        linear upsample back to the extractor frame rate (zero-padded tail).
        CTC frame count (``out_lengths``) stays the extractor's."""
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="sew_extract_ln")(feats)
        if cfg.conv_dim[-1] != cfg.hidden_size:
            h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fp_projection")(h)
        h = nn.Dropout(rate=cfg.feat_proj_dropout, deterministic=not train)(h)
        mask = lengths_to_mask(out_lengths, h.shape[1])
        h = jnp.where(mask[:, :, None], h, 0.0)

        s, k = cfg.squeeze_factor, cfg.num_conv_pos_embeddings
        t_in = h.shape[1]
        pos = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            strides=(s,),
            padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="pos_conv",
        )(h)
        if k % 2 == 0:  # HF SamePad removes the trailing frame for even kernels
            pos = pos[:, :-1]
        pos = gelu(pos, self.dtype)
        pooled = nn.avg_pool(h, window_shape=(s,), strides=(s,))
        m = min(pos.shape[1], pooled.shape[1])
        hq = pooled[:, :m] + pos[:, :m]

        sq_lengths = out_lengths // s
        key_mask = lengths_to_mask(sq_lengths, hq.shape[1])
        hq = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="enc_layer_norm")(hq)
        hq = nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(hq)
        layer_cls = nn.remat(_EncoderLayer, static_argnums=(3,)) if self.remat else _EncoderLayer
        for i in range(cfg.num_hidden_layers):
            hq = layer_cls(cfg, dtype=self.dtype, name=f"layer{i}")(hq, key_mask, train, None)

        up = nn.Dense(cfg.hidden_size * s, dtype=self.dtype, name="upsample_projection")(hq)
        up = gelu(up, self.dtype)
        up = up.reshape(up.shape[0], up.shape[1] * s, cfg.hidden_size)
        if up.shape[1] < t_in:
            up = jnp.pad(up, ((0, 0), (0, t_in - up.shape[1]), (0, 0)))
        return up[:, :t_in], out_lengths
