"""Optimized inference engine: the serving-side executor.

Where the reference exports to TorchScript for deployment
(`/root/reference/src/thunder/module.py:88`, SURVEY.md §3.5), this engine
compiles a hand-scheduled fast path straight from a ``CTCModule``'s
variables:

- batchnorm folded into per-channel scale/bias at build time (eval-mode
  running stats — `quartznet/blocks.py:222` semantics);
- conv stack on XLA in the compute dtype with bf16 epilogues and cached
  0/1 multiply masks; sub-128 stem channels zero-padded to a full lane
  tile on the bf16 path (measured fastest on v5e — the fused Pallas repeat
  kernels in :mod:`thunder_tpu.kernels` tie XLA's depthwise emitter and
  stay opt-in via ``use_pallas``);
- compute in bf16 on TPU (f32 accumulation in the MXU), f32 elsewhere.

Numerics are validated against the flax ``model.apply`` path in
tests/test_engine.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.kernels.separable_conv import fused_separable_conv
from thunder_tpu.models.citrinet import CitrinetEncoder
from thunder_tpu.models.layers import BN_EPS
from thunder_tpu.models.quartznet import QuartznetEncoder
from thunder_tpu.module import _BEAM_UNSET, CTCModule, check_beam_args, pad_to_bucket
from thunder_tpu.ops.conv import conv1d, conv_output_length, get_same_padding
from thunder_tpu.ops.ctc import collapse_ctc
from thunder_tpu.ops.masking import apply_mask, lengths_to_mask
from thunder_tpu.quantization import quantize_array

__all__ = ["InferenceEngine"]


def _fold_bn(bn_params, bn_stats):
    scale = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_stats["var"]) + BN_EPS)
    bias = np.asarray(bn_params["bias"]) - np.asarray(bn_stats["mean"]) * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _q8_kernel(w):
    q, scale = quantize_array(w)
    return {"kernel_q8": jnp.asarray(q), "kernel_scale": jnp.asarray(scale)}


def _deq_kernel(d, dtype):
    if "kernel_q8" in d:
        # the convert+scale fuses into the consuming matmul's operand load
        return d["kernel_q8"].astype(dtype) * d["kernel_scale"].astype(dtype)
    return d["kernel"]


@dataclass
class _RepeatPlan:
    kind: str  # "separable" | "dense"
    kernel_size: int
    stride: int
    dilation: int
    relu: bool
    dw: Any = None  # (k, C)
    pw: Any = None  # (C_in, C_out) — dense conv uses kernel (k, C_in, C_out)
    kernel: Any = None
    scale: Any = None
    bias: Any = None
    fuse: bool = False
    #: per-output-channel dequant scale when the matmul weight (``pw`` or a
    #: 1x1 ``kernel``) is stored int8 (serving int8 mode); None = compute dtype
    q_scale: Any = None


@dataclass
class _BlockPlan:
    repeats: List[_RepeatPlan]
    res: Optional[_RepeatPlan]
    se: Optional[Dict[str, Any]]


# plans travel as jit ARGUMENTS (weights as pytree leaves), never as traced
# constants — closure-captured weights get baked into the HLO payload, which
# breaks large models (and bloats every compile)
jax.tree_util.register_dataclass(
    _RepeatPlan,
    data_fields=["dw", "pw", "kernel", "scale", "bias", "q_scale"],
    meta_fields=["kind", "kernel_size", "stride", "dilation", "relu", "fuse"],
)
jax.tree_util.register_dataclass(_BlockPlan, data_fields=["repeats", "res", "se"], meta_fields=[])


class InferenceEngine:
    """Compile-once greedy-CTC inference over a CTCModule's weights."""

    def __init__(
        self,
        module: CTCModule,
        compute_dtype=None,
        use_pallas: Optional[bool] = None,
        pad_multiple: int = 16000,
        mesh=None,
        int8_weights: bool = False,
        int8_compute: bool = False,
        posconv_dense: Optional[bool] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — batches shard over its
        ``data`` axis for multi-chip serving (SPMD; batch must divide the
        data-axis size, ``predict`` pads as needed).

        ``int8_weights``: serve from int8 matmul weights (reference parity:
        torch dynamic quantization, `huggingface/compatibility.py:128-132`).
        Dense / pointwise-conv kernels stay int8 + per-channel scale in
        device HBM (4x less weight memory than f32, 2x less than bf16);
        the dequant fuses into each matmul's operand load inside the jit.

        ``int8_compute``: wav2vec2 only — run the transformer's four big
        GEMMs (qkv/out projections, FFN up/down) as int8 x int8 -> int32 MXU
        matmuls with dynamic per-row activation quantization (W8A8; measured
        330 vs 233 TFLOPS bf16 at the FFN-up shape on v5e —
        scripts/bench_int8_matmul.py) and the wide feature-extractor convs
        as int8 convs (380 TOPS vs 194 TFLOPS bf16 at k=3/C=512).  Composes
        with ``int8_weights`` (which then covers the remaining matmul
        weights storage-only).  End-to-end this is a memory-footprint mode,
        not a throughput mode: the isolated-op wins don't survive the extra
        dynamic-quantize HBM passes at serving batch (interleaved A/B at
        B=64x15 s: bf16 7,615 RTF, int8 GEMMs 6,851, +extractor 5,466).

        ``posconv_dense``: fold the grouped positional conv into a
        block-diagonal dense conv.  Default OFF: the fold wins in a
        chain-slope microbench (4.76 -> 3.23 ms at B=32xT=768) but LOSES
        ~31 ms end-to-end at B=64x15 s (7,615 -> 6,100 RTF, interleaved
        A/B) — kept as an experiment knob and a numerics-pinned record."""
        from thunder_tpu.models.wav2vec2 import Wav2Vec2Encoder

        self.mesh = mesh
        self.int8_weights = bool(int8_weights)
        self.int8_compute = bool(int8_compute)
        if self.int8_compute and not isinstance(module.model.encoder, Wav2Vec2Encoder):
            raise ValueError("int8_compute is a wav2vec2 serving mode")

        encoder = module.model.encoder
        on_tpu = jax.default_backend() == "tpu"
        self.dtype = compute_dtype or (jnp.bfloat16 if on_tpu else jnp.float32)
        # measured on v5e: XLA's depthwise conv beats the fused Pallas repeat
        # kernel (sublane-shifted reads per tap dominate), so the kernel is
        # opt-in; BN folding + bf16 is where the engine's win comes from
        self.use_pallas = False if use_pallas is None else use_pallas
        self.module = module
        self.pad_multiple = pad_multiple
        self.frontend = module.model.audio_transform

        if isinstance(encoder, Wav2Vec2Encoder):
            # no batchnorm to fold: re-instantiate in the compute dtype over
            # the same variables and jit end-to-end
            enc_cfg = encoder.config
            enc_params = module.variables["params"]["encoder"]
            if (
                bool(posconv_dense)
                and not enc_cfg.pos_conv_stack
                and enc_cfg.num_conv_pos_embedding_groups > 1
            ):
                # fold the grouped positional conv (k=128, 768ch, groups=16)
                # into a block-diagonal DENSE conv.  Off-block zeros
                # contribute exactly 0, so outputs match the grouped conv.
                # Measured: wins the chain-slope microbench (4.76 -> 3.23 ms
                # at B=32xT=768, scripts/bench_posconv.py) but LOSES ~31 ms
                # end-to-end at B=64x15 s — default off, see __init__ doc
                import copy

                import flax.traverse_util as _tu

                flat = _tu.flatten_dict(enc_params)
                key = ("pos_conv", "kernel")
                if key in flat:
                    w = np.asarray(flat[key])  # (K, gs, H)
                    k_, gs_, h_ = w.shape
                    g_ = enc_cfg.num_conv_pos_embedding_groups
                    if g_ * gs_ == h_:
                        dense = np.zeros((k_, h_, h_), w.dtype)
                        for g in range(g_):
                            dense[:, g * gs_ : (g + 1) * gs_, g * gs_ : (g + 1) * gs_] = w[
                                :, :, g * gs_ : (g + 1) * gs_
                            ]
                        flat[key] = dense
                        enc_params = _tu.unflatten_dict(flat)
                        enc_cfg = copy.copy(enc_cfg)
                        enc_cfg.num_conv_pos_embedding_groups = 1
            fast_encoder = Wav2Vec2Encoder(
                config=enc_cfg,
                mask_input=encoder.mask_input,
                dtype=self.dtype,
            )
            dec_params = module.variables["params"].get("decoder")
            if dec_params is not None:
                dec_params = {
                    "kernel": np.asarray(dec_params["dense"]["kernel"]),
                    "bias": jnp.asarray(dec_params["dense"]["bias"], jnp.float32),
                }
            int8 = self.int8_weights
            if self.int8_compute:
                # W8A8 GEMMs: the _Dense layers see kernel_q8/kernel_scale
                # leaves and switch to the dynamic int8 MXU path; applying
                # quantize_tree afterwards (int8_weights) covers the
                # remaining matmul kernels storage-only.
                from thunder_tpu.quantization import quantize_tree_compute

                enc_params = quantize_tree_compute(enc_params)
            if int8:
                from thunder_tpu.quantization import quantize_tree

                enc_params = quantize_tree(enc_params)
            if self.int8_compute or int8:
                enc_params = jax.tree_util.tree_map(jnp.asarray, enc_params)
                if dec_params is not None:
                    # pop BEFORE the dict display: {**dec_params, ...} would
                    # otherwise unpack the still-present f32 kernel first and
                    # keep a dead full-precision copy riding every call
                    kernel = dec_params.pop("kernel")
                    dec_params = {**dec_params, **_q8_kernel(kernel)}
            else:
                # pre-cast weights to the compute dtype once: the flax
                # modules promote f32 params per call inside the jit, which
                # reads 2x the weight bytes from HBM every batch (wav2vec2-
                # base: 380 MB f32 vs 190 MB bf16).  The in-jit promote then
                # no-ops, so the math is bit-identical.  The masked instance
                # norm ("gn") applies its params at f32 — leave those alone.
                import flax.traverse_util as _tu

                flat = _tu.flatten_dict(enc_params)
                enc_params = _tu.unflatten_dict(
                    {
                        p: (
                            jnp.asarray(v, self.dtype)
                            if np.issubdtype(np.asarray(v).dtype, np.floating) and "gn" not in p
                            else jnp.asarray(v)
                        )
                        for p, v in flat.items()
                    }
                )
                if dec_params is not None:
                    dec_params["kernel"] = jnp.asarray(dec_params["kernel"], self.dtype)

            @jax.jit
            def forward(enc_params, dec_params, audio, lengths):
                if int8:
                    from thunder_tpu.quantization import dequantize_tree_jax

                    enc_params = dequantize_tree_jax(enc_params, self.dtype)
                feats, flens = self.frontend.apply({}, audio, lengths, train=False)
                h, out_lengths = fast_encoder.apply({"params": enc_params}, feats, flens, train=False)
                if dec_params is None:
                    logits = h.astype(jnp.float32)
                else:
                    kernel = _deq_kernel(dec_params, self.dtype)
                    logits = (
                        jnp.matmul(h, kernel, preferred_element_type=jnp.float32)
                        + dec_params["bias"]
                    )
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return logits, preds, out_lengths

            self._infer = lambda audio, lengths: forward(enc_params, dec_params, audio, lengths)
            self._weights = (enc_params, dec_params)
            return

        if not isinstance(encoder, (QuartznetEncoder, CitrinetEncoder)):
            # generic fallback: any (x, lengths, train)-contract encoder gets
            # the module's jitted eval fn (shared compile cache), so the
            # serving API (predict/warmup/predict_long/mesh placement) still
            # works — only the BN-folding/bf16 fast path is skipped
            self._infer = lambda audio, lengths: module._eval_fn()(
                module.variables, audio, lengths
            )
            return

        self._feat_pad = 0  # set by _build_plan when the stem channels are padded
        self._plan = self._build_plan(encoder, module.variables)
        dec = module.variables["params"]["decoder"]["conv"]
        dec_k = np.asarray(dec["kernel"])[0]  # (C, V)
        self._dec_kernel = (
            _q8_kernel(dec_k) if self.int8_weights else {"kernel": jnp.asarray(dec_k, self.dtype)}
        )
        self._dec_bias = jnp.asarray(dec["bias"], dtype=jnp.float32)
        jitted = jax.jit(self._forward_with)
        self._infer = lambda audio, lengths: jitted(
            self._plan, self._dec_kernel, self._dec_bias, audio, lengths
        )
        self._weights = (self._plan, self._dec_kernel, self._dec_bias)

    # ------------------------------------------------------------------
    # planning
    # ------------------------------------------------------------------

    def _block_configs(self, encoder):
        cfgs = []
        if isinstance(encoder, QuartznetEncoder):
            cfgs.append(dict(repeat=1, kernel_size=33, stride=2, dilation=1, separable=True, residual=False, se=False))
            for f, k in zip(encoder.filters, encoder.kernel_sizes):
                for _ in range(encoder.repeat_blocks):
                    cfgs.append(dict(repeat=encoder.repeat, kernel_size=k, stride=1, dilation=1, separable=True, residual=True, se=False))
            cfgs.append(dict(repeat=1, kernel_size=87, stride=1, dilation=2, separable=True, residual=False, se=False))
            cfgs.append(dict(repeat=1, kernel_size=1, stride=1, dilation=1, separable=False, residual=False, se=False))
        else:
            cfgs.append(dict(repeat=1, kernel_size=5, stride=1, dilation=1, separable=True, residual=False, se=True))
            for f, k, s in zip(encoder.filters, encoder.kernel_sizes, encoder.strides):
                cfgs.append(dict(repeat=encoder.repeat, kernel_size=k, stride=s, dilation=1, separable=True, residual=True, se=True, stride_last_only=True, res_stride=s))
            cfgs.append(dict(repeat=1, kernel_size=41, stride=1, dilation=1, separable=True, residual=False, se=True))
        return cfgs

    def _build_plan(self, encoder, variables) -> List[_BlockPlan]:
        params = variables["params"]["encoder"]
        stats = variables["batch_stats"]["encoder"]
        plan: List[_BlockPlan] = []
        for b, cfg in enumerate(self._block_configs(encoder)):
            bp = params[f"block{b}"]
            bs = stats[f"block{b}"]
            repeats = []
            for r in range(cfg["repeat"]):
                last = r == cfg["repeat"] - 1
                stride_r = cfg["stride"] if (not cfg.get("stride_last_only") or last) else 1
                rp, rs = bp[f"rep{r}"], bs[f"rep{r}"]
                scale, bias = _fold_bn(rp["bn"], rs["bn"])
                if cfg["separable"]:
                    dw = np.asarray(rp["depthwise"]["conv"]["kernel"])[:, 0, :]  # (k, C)
                    pw = np.asarray(rp["pointwise"]["conv"]["kernel"])[0]  # (C, C_out)
                    c_in, c_out = pw.shape
                    if b == 0 and r == 0 and c_in < 128 and self.dtype == jnp.bfloat16:
                        # ONLY the stem's first repeat reads the (padded)
                        # frontend features; interior sub-128 repeats must
                        # stay unpadded — their inputs are previous repeats'
                        # outputs at the true channel count.
                        # (bf16 fast path only: f32 keeps the module's exact
                        # summation order for bitwise-stable comparisons)
                        # stem-like repeats: sub-128 input channels leave VPU
                        # lanes idle in XLA's depthwise emitter (standalone:
                        # ~1.9 ms -> ~0.45 ms at batch 64x15 s when padded to
                        # C=128; end-to-end the 15x5 flagship is neutral
                        # within bench noise, smaller encoders benefit more).
                        # Zero-pad the channel dim to a full lane tile —
                        # padded channels multiply zero taps, so the result
                        # is exact; the engine pads the features once.
                        dw = np.pad(dw, ((0, 0), (0, 128 - c_in)))
                        pw = np.pad(pw, ((0, 128 - c_in), (0, 0)))
                        self._feat_pad = 128 - c_in
                        c_in = 128
                    fuse = (
                        self.use_pallas
                        and stride_r == 1
                        and cfg["dilation"] == 1
                        and c_in % 128 == 0
                        and c_out % 128 == 0
                    )
                    # fold BN scale into the pointwise weights
                    pw_folded = pw * scale[None, :]
                    q_scale = None
                    if self.int8_weights:
                        pw_folded, q_scale = quantize_array(pw_folded)
                        q_scale = jnp.asarray(q_scale)
                        pw_arr = jnp.asarray(pw_folded)
                    else:
                        pw_arr = jnp.asarray(pw_folded, self.dtype)
                    repeats.append(
                        _RepeatPlan(
                            kind="separable",
                            kernel_size=cfg["kernel_size"],
                            stride=stride_r,
                            dilation=cfg["dilation"],
                            relu=not last,
                            dw=jnp.asarray(dw, self.dtype),
                            pw=pw_arr,
                            scale=jnp.ones((pw.shape[1],), jnp.float32),
                            bias=jnp.asarray(bias, jnp.float32),
                            fuse=fuse,
                            q_scale=q_scale,
                        )
                    )
                else:
                    kernel = np.asarray(rp["conv"]["conv"]["kernel"])  # (k, C_in, C_out)
                    folded = kernel * scale[None, None, :]
                    q_scale = None
                    if self.int8_weights and folded.shape[0] == 1:
                        folded, q_scale = quantize_array(folded)
                        q_scale = jnp.asarray(q_scale)
                        kernel_arr = jnp.asarray(folded)
                    else:
                        kernel_arr = jnp.asarray(folded, self.dtype)
                    repeats.append(
                        _RepeatPlan(
                            kind="dense",
                            kernel_size=cfg["kernel_size"],
                            stride=stride_r,
                            dilation=cfg["dilation"],
                            relu=not last,
                            kernel=kernel_arr,
                            bias=jnp.asarray(bias, jnp.float32),
                            q_scale=q_scale,
                        )
                    )
            res = None
            if cfg.get("residual"):
                scale, bias = _fold_bn(bp["res"]["bn"], bs["res"]["bn"])
                kernel = np.asarray(bp["res"]["conv"]["conv"]["kernel"])
                folded = kernel * scale[None, None, :]
                q_scale = None
                if self.int8_weights:
                    folded, q_scale = quantize_array(folded)
                    q_scale = jnp.asarray(q_scale)
                    kernel_arr = jnp.asarray(folded)
                else:
                    kernel_arr = jnp.asarray(folded, self.dtype)
                res = _RepeatPlan(
                    kind="dense",
                    kernel_size=1,
                    stride=cfg.get("res_stride", 1),
                    dilation=1,
                    relu=False,
                    kernel=kernel_arr,
                    bias=jnp.asarray(bias, jnp.float32),
                    q_scale=q_scale,
                )
            se = None
            if cfg.get("se"):
                se = {
                    "fc1": jnp.asarray(bp["se"]["fc1"]["kernel"], self.dtype),
                    "fc2": jnp.asarray(bp["se"]["fc2"]["kernel"], self.dtype),
                }
            plan.append(_BlockPlan(repeats=repeats, res=res, se=se))
        return plan

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _apply_repeat(self, rp: _RepeatPlan, x, lengths, mask_cache=None):
        """One conv repeat.  Input is assumed already zero beyond ``lengths``
        (the reference's MaskedConv1d contract); the output mask is fused
        into the scale/bias/relu epilogue rather than spent as a separate
        memory pass before the next conv.

        The epilogue runs in the compute dtype (bf16 on TPU) with a cached
        0/1 multiply mask: measured on v5e this saves ~10% of a QuartzNet15x5
        batch vs an f32 epilogue + boolean-select mask (identical argmax
        predictions; logits differ at bf16 rounding level)."""
        if rp.kind == "separable" and rp.fuse:
            pw = rp.pw if rp.q_scale is None else rp.pw.astype(self.dtype) * rp.q_scale.astype(self.dtype)
            y = fused_separable_conv(
                x.astype(self.dtype), rp.dw, pw, rp.scale, rp.bias, kernel_size=rp.kernel_size, relu=rp.relu
            )
            return apply_mask(y, lengths), lengths
        pad = get_same_padding(rp.kernel_size, rp.stride, rp.dilation)
        if rp.kind == "separable":
            c = x.shape[-1]
            y = conv1d(x.astype(self.dtype), rp.dw[:, None, :], stride=rp.stride, padding=pad, dilation=rp.dilation, groups=c)
            # int8 serving: weights live in HBM as int8; the per-channel
            # dequant fuses into this matmul's operand load
            pw = rp.pw if rp.q_scale is None else rp.pw.astype(self.dtype) * rp.q_scale.astype(self.dtype)
            y = jnp.matmul(y, pw, preferred_element_type=jnp.float32)
            y = y.astype(self.dtype) * rp.scale.astype(self.dtype) + rp.bias.astype(self.dtype)
        else:
            kernel = rp.kernel if rp.q_scale is None else rp.kernel.astype(self.dtype) * rp.q_scale.astype(self.dtype)
            y = conv1d(x.astype(self.dtype), kernel, stride=rp.stride, padding=pad, dilation=rp.dilation)
            y = y + rp.bias.astype(self.dtype)
        new_lengths = conv_output_length(lengths, rp.kernel_size, rp.stride, pad, rp.dilation)
        if rp.relu:
            y = jnp.maximum(y, jnp.zeros((), self.dtype))
        # fused output masking: a 0/1 multiply folds into the same elementwise
        # pass as bias/relu, so padding stays exactly zero for the next conv.
        # within one forward the valid lengths are a pure function of the time
        # dimension, so masks are cached per T across repeats.
        if mask_cache is None:
            mask_cache = {}
        t = y.shape[1]
        if t not in mask_cache:
            mask_cache[t] = lengths_to_mask(new_lengths, t).astype(self.dtype)[:, :, None]
        return y * mask_cache[t], new_lengths

    def _apply_se(self, se, x, lengths):
        mask = lengths_to_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None]
        pooled = (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
        y = jnp.maximum(jnp.matmul(pooled, se["fc1"], preferred_element_type=jnp.float32), 0.0)
        y = jnp.matmul(y.astype(self.dtype), se["fc2"], preferred_element_type=jnp.float32)
        return x * jax.nn.sigmoid(y).astype(x.dtype)[:, None, :]

    def _forward_with(self, plan, dec_kernel, dec_bias, audio, lengths):
        feats, feat_lengths = self.frontend.apply({}, audio, lengths, train=False)
        x = feats.astype(self.dtype)
        if self._feat_pad:
            # stem channels zero-padded to a full 128 lane tile (see plan)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, self._feat_pad)))
        out_lengths = feat_lengths
        mask_cache: Dict[int, Any] = {}
        for block in plan:
            inp, inp_lengths = x, out_lengths
            for rp in block.repeats:
                x, out_lengths = self._apply_repeat(rp, x, out_lengths, mask_cache)
            if block.se is not None:
                x = self._apply_se(block.se, x, out_lengths)
            if block.res is not None:
                res, _ = self._apply_repeat(block.res, inp, inp_lengths, mask_cache)
                x = x + res
            x = jnp.maximum(x, 0.0)
        logits = jnp.matmul(x, _deq_kernel(dec_kernel, self.dtype), preferred_element_type=jnp.float32) + dec_bias
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits, preds, out_lengths

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def weight_bytes(self) -> int:
        """Total bytes of the weight arrays this engine keeps resident on
        device — the serving HBM footprint (int8 mode roughly halves the
        bf16 figure / quarters f32 for the matmul-dominated models)."""
        weights = getattr(self, "_weights", None)
        if weights is None:
            weights = (self.module.variables,)
        # .nbytes is shape/dtype metadata — no device->host transfer
        return int(sum(x.nbytes for x in jax.tree_util.tree_leaves(weights)))

    def _place(self, audio, lengths):
        if self.mesh is None:
            return jnp.asarray(audio), jnp.asarray(lengths)
        from thunder_tpu.parallel.mesh import batch_sharding

        shard = batch_sharding(self.mesh)
        return jax.device_put(np.asarray(audio), shard), jax.device_put(np.asarray(lengths), shard)

    def __call__(self, audio, lengths):
        logits, preds, out_lengths = self._infer(*self._place(audio, lengths))
        return logits, out_lengths

    def warmup(self, batch_sizes, durations_s, sample_rate: int = 16000) -> int:
        """Precompile executables for the serving shape grid.

        Call once at deployment startup so no live request pays a compile:
        every (batch_size, bucketed duration) pair gets traced and compiled.
        Returns the number of executables warmed.
        """
        n = 0
        for b in batch_sizes:
            for s in durations_s:
                samples = pad_to_bucket(int(s * sample_rate), self.pad_multiple)
                audio = np.zeros((b, samples), dtype=np.float32)
                lengths = np.full((b,), samples, dtype=np.int32)
                _, preds, _ = self._infer(*self._place(audio, lengths))
                np.asarray(preds)  # force execution end-to-end
                n += 1
        return n

    def predict_long(
        self,
        audio,
        chunk_seconds: float = 20.0,
        overlap_seconds: float = 2.0,
        sample_rate: int = 16000,
        beam_width: Optional[int] = None,
        **beam_kwargs,
    ) -> str:
        """Chunked long-audio transcription on the optimized engine path.

        ``beam_width`` beam-decodes each chunk's trimmed frame window (see
        :func:`thunder_tpu.module.chunked_transcribe`)."""
        from thunder_tpu.module import chunked_transcribe

        if self.module.text_transform is None:
            raise ValueError("predict_long requires a text_transform")
        check_beam_args(beam_width, beam_kwargs)
        if "nbest" in beam_kwargs:
            raise TypeError(
                "nbest is not supported by predict_long (the chunked beam "
                "yields one continuous search; use predict for n-best)"
            )

        def infer(padded, lengths):
            _, preds, out_lengths = self._infer(*self._place(padded, lengths))
            return preds, out_lengths

        def logits_fn(padded, lengths):
            logits, _, out_lengths = self._infer(*self._place(padded, lengths))
            return logits, out_lengths

        return chunked_transcribe(
            infer,
            self.module.text_transform,
            audio,
            chunk_seconds=chunk_seconds,
            overlap_seconds=overlap_seconds,
            sample_rate=sample_rate,
            short_path=lambda a: self.predict(a, beam_width=beam_width, **beam_kwargs)[0],
            logits_fn=logits_fn,
            blank_idx=self.module.blank_idx,
            beam_width=beam_width,
            beam_kwargs=beam_kwargs or None,
        )

    def predict(self, audio, lengths=None, beam_width: Optional[int] = None, prune_logp: float = _BEAM_UNSET, lm=None, lm_weight: float = _BEAM_UNSET, nbest: Optional[int] = None, beam_backend: Optional[str] = None, **beam_kwargs) -> List[str]:
        """Greedy decode by default; ``beam_width`` switches to CTC prefix
        beam search over the logits — ``beam_backend="host"`` (default, see
        ops/ctc_beam.py; in-search LM shallow fusion) or ``"device"`` (jitted
        on-accelerator search, logits never leave the chip; an ``lm``
        LM-ranks the surviving beam on the host — on-the-fly rescoring).

        With ``nbest=k``, returns per sample the top-k ``(text, log_prob)``
        pairs instead of one string (hypothesis scores include any
        end-of-utterance fusion bonus — comparable for rescoring)."""
        if nbest is not None and not beam_width:
            raise TypeError("beam-search arguments without beam_width: ['nbest']")
        if beam_backend is not None and not beam_width:
            raise TypeError("beam-search arguments without beam_width: ['beam_backend']")
        check_beam_args(beam_width, beam_kwargs, prune_logp=prune_logp, lm=lm, lm_weight=lm_weight)
        if prune_logp is _BEAM_UNSET:
            prune_logp = -12.0
        if lm_weight is _BEAM_UNSET:
            lm_weight = 0.5
        audio = np.asarray(audio, dtype=np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        n = audio.shape[0]
        if lengths is None:
            lengths = np.full((n,), audio.shape[-1], dtype=np.int32)
        lengths = np.asarray(lengths, dtype=np.int32)
        bucket = pad_to_bucket(audio.shape[-1], self.pad_multiple)
        if bucket != audio.shape[-1]:
            audio = np.pad(audio, ((0, 0), (0, bucket - audio.shape[-1])))
        if self.mesh is not None:
            from thunder_tpu.parallel.mesh import DATA_AXIS

            d = self.mesh.shape[DATA_AXIS]
            if n % d:
                extra = -(-n // d) * d - n
                audio = np.pad(audio, ((0, extra), (0, 0)))
                lengths = np.pad(lengths, (0, extra), constant_values=1)
        logits, preds, out_lengths = self._infer(*self._place(audio, lengths))
        tt = self.module.text_transform
        if beam_width:
            from thunder_tpu.module import run_beam_decode

            if beam_backend == "device" and self.mesh is not None:
                # decode the FULL mesh-padded batch under shard_map (each
                # device searches its own rows; padding rows are length-1
                # throwaways) and drop the padding from the result
                from thunder_tpu.parallel.mesh import DATA_AXIS

                return run_beam_decode(
                    logits,
                    out_lengths,
                    blank=self.module.blank_idx,
                    text_transform=tt,
                    beam_width=beam_width,
                    nbest=nbest,
                    prune_logp=prune_logp,
                    lm=lm,
                    lm_weight=lm_weight,
                    backend=beam_backend,
                    beam_kwargs=beam_kwargs,
                    mesh=self.mesh,
                    data_axis=DATA_AXIS,
                )[:n]
            return run_beam_decode(
                logits[:n],
                out_lengths[:n],
                blank=self.module.blank_idx,
                text_transform=tt,
                beam_width=beam_width,
                nbest=nbest,
                prune_logp=prune_logp,
                lm=lm,
                lm_weight=lm_weight,
                backend=beam_backend,
                beam_kwargs=beam_kwargs,
            )
        collapsed = collapse_ctc(np.asarray(preds)[:n], np.asarray(out_lengths)[:n])
        # repeats already collapsed on ids; decode must not re-collapse
        return [tt.decode_prediction(c[None], remove_repeated=False)[0] for c in collapsed]
