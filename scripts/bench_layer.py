"""Transformer encoder-layer component attribution at serving shapes.

Chain-slope timing (relay dispatch floor cancels) of the full _EncoderLayer
and its sub-pieces, so the per-layer overhead beyond the GEMM/flash floor
falls out.

    python scripts/bench_layer.py --batch 16 --frames 768
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def slope(chain, args_, reps=(2, 10), iters=5):
    import jax.numpy as jnp

    res = {}
    for n in reps:
        out = chain(*args_, n=n)
        float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = chain(*args_, n=n)
            float(jnp.sum(out[:1, :1, :4].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        res[n] = best / iters
    ns = sorted(res)
    return (res[ns[-1]] - res[ns[0]]) / (ns[-1] - ns[0]) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/thunder_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, _Attention, _EncoderLayer, _flash_mha, gelu

    import flax.linen as nn

    cfg = Wav2Vec2Config()
    B, T, H = args.batch, args.frames, cfg.hidden_size
    heads, dh = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32) * 0.1, jnp.bfloat16)
    key_mask = jnp.ones((B, T), bool)

    layer = _EncoderLayer(cfg, dtype=jnp.bfloat16)
    lvars = layer.init(jax.random.PRNGKey(0), x, key_mask)

    @functools.partial(jax.jit, static_argnames=("n",))
    def full_layer(x, n):
        y = x
        for _ in range(n):
            y = layer.apply(lvars, y * (1 + 1e-6), key_mask)
        return y

    attn = _Attention(cfg, dtype=jnp.bfloat16)
    avars = attn.init(jax.random.PRNGKey(0), x, key_mask)

    @functools.partial(jax.jit, static_argnames=("n",))
    def attn_only(x, n):
        y = x
        for _ in range(n):
            y = attn.apply(avars, y * (1 + 1e-6), key_mask)
        return y

    ffn_up = nn.Dense(cfg.intermediate_size, dtype=jnp.bfloat16)
    ffn_dn = nn.Dense(cfg.hidden_size, dtype=jnp.bfloat16)
    uvars = ffn_up.init(jax.random.PRNGKey(0), x)
    dvars = ffn_dn.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, cfg.intermediate_size), jnp.bfloat16))

    @functools.partial(jax.jit, static_argnames=("n",))
    def ffn_only(x, n):
        y = x
        for _ in range(n):
            y = ffn_dn.apply(dvars, gelu(ffn_up.apply(uvars, y * (1 + 1e-6)), jnp.bfloat16))
        return y

    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.bfloat16)
    nvars = ln.init(jax.random.PRNGKey(0), x)

    @functools.partial(jax.jit, static_argnames=("n",))
    def ln_only(x, n):
        y = x
        for _ in range(n):
            y = ln.apply(nvars, y * (1 + 1e-6))
        return y

    wqkv = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.02, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def qkv_flash(x, n):
        # qkv GEMM + split + scale + flash (no out_proj): isolates the
        # attention block minus the output projection
        y = x
        for _ in range(n):
            qkv = (y * (1 + 1e-6)) @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q * (dh**-0.5)
            s = lambda t: t.reshape(B, T, heads, dh)
            o = _flash_mha(s(q), s(k), s(v), key_mask)
            y = o.reshape(B, T, H)
        return y

    @functools.partial(jax.jit, static_argnames=("n",))
    def flash_only(x, n):
        y = x
        s = lambda t: t.reshape(B, T, heads, dh)
        for _ in range(n):
            o = _flash_mha(s(y * (1 + 1e-6)), s(y), s(y), key_mask)
            y = o.reshape(B, T, H)
        return y

    for name, fn in (
        ("full_layer", full_layer),
        ("attn_only", attn_only),
        ("qkv_flash", qkv_flash),
        ("flash_only", flash_only),
        ("ffn_only", ffn_only),
        ("ln_only", ln_only),
    ):
        try:
            ms = slope(fn, (x,))
            print(json.dumps({"piece": name, "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"piece": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
