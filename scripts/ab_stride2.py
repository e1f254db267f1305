# On-chip A/B: wav2vec2 encoder forward with fused_stride2 False vs True.
# Methodology per .claude/skills/verify/SKILL.md: N dispatches queued, ONE
# small fetch syncs the chain; the ~3 ms/dispatch relay floor amortizes
# identically in both arms.
import time

import jax
import jax.numpy as jnp
import numpy as np

from thunder_tpu.models import wav2vec2 as w2v

cfg = w2v.Wav2Vec2Config()  # wav2vec2-base
rng = np.random.default_rng(0)

print("devices:", jax.devices(), flush=True)

# init once (params shared by both arms; input length does not affect shapes)
init_enc = w2v.Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16, fused_stride2=False)
small = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
params = jax.jit(init_enc.init)(jax.random.PRNGKey(0), small, jnp.array([16000], jnp.int32))
jax.block_until_ready(params)
print("init done", flush=True)

B, N = 8, 20
results = {}
for fused in (False, True):
    enc = w2v.Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16, fused_stride2=fused)
    fwd = jax.jit(lambda p, a, l: enc.apply(p, a, l))
    for seconds in (15, 30):
        T = seconds * 16000
        audio = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
        lengths = jnp.full((B,), T, jnp.int32)
        y = fwd(params, audio, lengths)  # compile + warmup
        _ = np.asarray(y[0][0, 0, :4])
        for loop in range(2):  # best-of-2
            t0 = time.time()
            for _ in range(N):
                y = fwd(params, audio, lengths)
            _ = np.asarray(y[0][0, 0, :4])  # small fetch syncs the chain
            wall = (time.time() - t0) / N
            results.setdefault((fused, seconds), []).append(wall)
        best = min(results[(fused, seconds)])
        rtf = B * seconds / best
        print(f"fused={fused} {seconds}s: {best*1e3:.1f} ms/iter  RTF {rtf:,.0f}", flush=True)

for seconds in (15, 30):
    off = min(results[(False, seconds)])
    on = min(results[(True, seconds)])
    print(
        f"{seconds}s: fused {'WINS' if on < off else 'loses'} "
        f"({off*1e3:.1f} -> {on*1e3:.1f} ms, {100*(off-on)/off:+.1f}%)",
        flush=True,
    )
