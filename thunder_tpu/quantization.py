"""Int8 weight-only quantization.

Parity item for the reference's dynamic-int8 export option
(`/root/reference/src/thunder/huggingface/compatibility.py:128-132`, which
quantizes the wav2vec2 Linears).  Dynamic quantization = int8 weights +
float activations; the TPU-native equivalent here:

- :func:`quantize_variables`: per-output-channel symmetric int8 for every
  matmul-bearing kernel (Dense and 1x1/pointwise convs by default) — a 4x
  smaller checkpoint / HBM footprint;
- :func:`dequantize_variables`: reconstruct float params for the standard
  apply path (weights dequantize once at load, matching torch's dynamic-quant
  numerics where the matmul consumes dequantized weights).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "quantize_array",
    "quantize_variables",
    "dequantize_variables",
    "quantize_tree",
    "quantize_tree_compute",
    "dequantize_tree_jax",
    "dynamic_int8_matmul",
    "dynamic_int8_conv",
    "quantization_summary",
]


def _should_quantize(path: Tuple[str, ...], x) -> bool:
    if path[-1] != "kernel" or x.ndim < 2:
        return False
    # quantize matmul weights: Dense kernels (2-D) and pointwise conv kernels
    # (k=1); leave wide time-convs (frontend-critical) in float
    if x.ndim == 2:
        return True
    return x.ndim == 3 and x.shape[0] == 1


def quantize_array(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: ``(int8 values, f32 scale)``.

    The single quantization recipe shared by :func:`quantize_tree` and the
    serving engine's decoder-kernel path (engine.py), so both stay
    numerically identical.
    """
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Param subtree -> same tree with matmul kernels as int8 + f32 scales.

    Per-output-channel symmetric quantization; a kernel leaf ``k`` becomes
    ``k/__q8_values`` (int8) + ``k/__q8_scale`` (f32).  The serving engine
    keeps this tree resident on device (4x less weight HBM than f32, 2x less
    than bf16) and reconstructs compute-dtype weights inside the jitted step
    (:func:`dequantize_tree_jax`).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, x in flat.items():
        x = np.asarray(x)
        if _should_quantize(tuple(str(p) for p in path), x):
            q, scale = quantize_array(x)
            out[path + ("__q8_values",)] = q
            out[path + ("__q8_scale",)] = scale
        else:
            out[path] = x
    return flax.traverse_util.unflatten_dict(out)


def dequantize_tree_jax(params: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Reconstruct compute-dtype kernels from an int8 tree — traceable.

    Called INSIDE the serving jit: the int8 values are what lives in HBM
    between calls; the per-channel dequant (convert + scale multiply) fuses
    into the consuming matmul's operand load, so the float weights are
    transient.
    """
    import flax
    import jax.numpy as jnp

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, x in flat.items():
        if path and path[-1] == "__q8_values":
            scale = flat[path[:-1] + ("__q8_scale",)]
            out[path[:-1]] = x.astype(dtype) * jnp.asarray(scale, dtype)
        elif path and path[-1] == "__q8_scale":
            continue
        else:
            out[path] = x
    return flax.traverse_util.unflatten_dict(out)


#: Dense submodule names whose GEMMs run in int8 under ``int8_compute``
#: serving (the transformer's four big matmuls; everything else — convs,
#: LayerNorms, the small fp_projection and the decoder head — stays in the
#: engine's compute dtype).
INT8_COMPUTE_DENSE_NAMES = ("qkv_proj", "out_proj", "intermediate_dense", "output_dense")


def quantize_tree_compute(params: Dict[str, Any], extractor_convs: bool = True) -> Dict[str, Any]:
    """Param subtree -> int8-COMPUTE serving tree.

    For each Dense in :data:`INT8_COMPUTE_DENSE_NAMES`, replaces
    ``{kernel: W}`` with ``{kernel_q8: int8 (K, N), kernel_scale: f32 (N,)}``
    (per-output-channel symmetric, same recipe as :func:`quantize_array`).
    The model's ``_Dense`` layers detect these leaves and run the matmul as
    int8 x int8 -> int32 on the MXU (measured 330 vs 233 TFLOPS bf16 on
    v5e incl. the dynamic-quantize pass, scripts/bench_int8_matmul.py)
    with dynamic per-row activation quantization — W8A8, vs the weight-only
    ``quantize_tree`` where the dequantized matmul runs at the bf16 rate.

    ``extractor_convs``: also quantize the wav2vec2 feature-extractor's wide
    time convs (3-D kernels with >=64 input channels under
    ``feature_extractor`` — layers 1..6; layer 0's cin=1 conv stays float).
    XLA's int8 conv emitter measured 380 TOPS vs 194 TFLOPS bf16 at the
    k=3/C=512 extractor shape (scripts/ — probe recorded in
    docs/benchmarks.md); ``_ExtractorConv`` consumes these leaves with
    dynamic per-sample activation quantization (:func:`dynamic_int8_conv`).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, x in flat.items():
        names = tuple(str(p) for p in path)
        dense_hit = (
            names[-1] == "kernel"
            and len(names) >= 2
            and names[-2] in INT8_COMPUTE_DENSE_NAMES
            and np.ndim(x) == 2
        )
        conv_hit = (
            extractor_convs
            and names[-1] == "kernel"
            and "feature_extractor" in names
            and np.ndim(x) == 3
            and x.shape[1] >= 64
        )
        if dense_hit or conv_hit:
            q, scale = quantize_array(np.asarray(x))
            out[path[:-1] + ("kernel_q8",)] = q
            out[path[:-1] + ("kernel_scale",)] = scale.reshape(-1)
        else:
            out[path] = np.asarray(x)
    return flax.traverse_util.unflatten_dict(out)


def dynamic_int8_matmul(x, kernel_q8, kernel_scale):
    """``x @ dequant(kernel)`` computed as an int8 MXU matmul -> f32.

    ``x``: float ``(..., K)``; ``kernel_q8``: int8 ``(K, N)``;
    ``kernel_scale``: f32 ``(N,)`` per-output-channel.  Activations are
    quantized per row (symmetric absmax/127 — torch dynamic-quant's scheme,
    `/root/reference/src/thunder/huggingface/compatibility.py:128-132`), so
    ``|x/s| <= 127`` by construction and no clip is needed.  The quantize
    chain fuses into one pass over ``x``; the dot runs int8 x int8 -> int32.
    """
    import jax.numpy as jnp
    from jax import lax

    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.round(xf / s).astype(jnp.int8)
    acc = lax.dot_general(
        xq,
        kernel_q8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * kernel_scale


def dynamic_int8_conv(x, kernel_q8, kernel_scale, stride: int):
    """VALID 1-D conv computed int8 x int8 -> int32 on the MXU.

    ``x``: float ``(B, T, Cin)``; ``kernel_q8``: int8 ``(K, Cin, Cout)``;
    ``kernel_scale``: f32 ``(Cout,)``.  Activations quantize dynamically with
    ONE symmetric absmax scale per sample (the conv contracts across taps
    and channels, so the scale must be constant over the whole receptive
    field; per-sample is the finest legal granularity without requantizing
    overlaps).  Returns f32 ``(B, T_out, Cout)``.
    """
    import jax.numpy as jnp
    from jax import lax

    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=(1, 2), keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.round(xf / s).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq,
        kernel_q8,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * kernel_scale


def quantize_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """params -> pytree where selected kernels become {values:int8, scale:f32}."""
    quantized = dict(variables)
    quantized["params"] = quantize_tree(variables["params"])
    return quantized


def dequantize_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`quantize_variables` (float32 kernels restored)."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    out = {}
    for path, x in flat.items():
        if path and path[-1] == "__q8_values":
            scale = flat[path[:-1] + ("__q8_scale",)]
            out[path[:-1]] = (np.asarray(x, dtype=np.float32) * np.asarray(scale)).astype(np.float32)
        elif path and path[-1] == "__q8_scale":
            continue
        else:
            out[path] = x
    restored = dict(variables)
    restored["params"] = flax.traverse_util.unflatten_dict(out)
    return restored


def quantization_summary(variables: Dict[str, Any]) -> Dict[str, float]:
    """Bytes before/after for the quantizable subset."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    f32 = q8 = 0
    for path, x in flat.items():
        x = np.asarray(x)
        if path[-1] in ("__q8_values", "__q8_scale"):
            q8 += x.nbytes
        else:
            f32 += x.nbytes
    return {"float_bytes": float(f32), "quantized_bytes": float(q8)}
