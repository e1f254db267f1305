"""Analytic FLOPs counters vs XLA's cost analysis of the compiled HLO.

The analytic numbers (conv + matmul only) must sit just below XLA's count
(which adds elementwise/normalization work) — close enough that the MFU
lines in bench output are trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.flops import (
    citrinet_forward_flops,
    citrinet_forward_flops_split,
    citrinet_train_flops,
    conv1d_flops,
    dense_flops,
    filterbank_flops,
    mfu,
    quartznet_forward_flops,
    quartznet_forward_flops_split,
    quartznet_train_flops,
    wav2vec2_forward_flops,
    xla_flops,
)


def test_primitive_counts():
    # dense: 2 * d_in * d_out * tokens
    assert dense_flops(64, 128, 10) == 2 * 64 * 128 * 10
    # grouped conv divides the input-channel fan-in
    assert conv1d_flops(3, 64, 64, 100, groups=64) == 2 * 3 * 1 * 64 * 100
    assert conv1d_flops(1, 256, 512, 50, batch=4) == 4 * 2 * 256 * 512 * 50


def test_primitive_vs_xla():
    """The conv/dense formulas match XLA's cost analysis exactly."""
    x = jnp.zeros((2, 100, 64))
    w = jnp.zeros((3, 64, 128))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
        )

    got = xla_flops(f, x, w)
    if got is None:
        pytest.skip("backend reports no cost analysis")
    # XLA doesn't count the padding taps at the edges; the formula does
    assert got == pytest.approx(conv1d_flops(3, 64, 128, 100, batch=2), rel=0.01)

    a, b = jnp.zeros((50, 64)), jnp.zeros((64, 32))
    got = xla_flops(lambda a, b: a @ b, a, b)
    assert got == dense_flops(64, 32, 50)


def _xla_forward_flops(model, variables, audio, lengths):
    def fwd(v, a, l):
        return model.apply(v, a, l, train=False)

    return xla_flops(fwd, variables, audio, lengths)


def test_quartznet_analytic_vs_xla():
    from thunder_tpu.audio import FilterbankFeatures
    from thunder_tpu.models import Conv1dDecoder, QuartznetEncoder
    from thunder_tpu.module import CTCModel

    model = CTCModel(
        audio_transform=FilterbankFeatures(dither=0.0),
        encoder=QuartznetEncoder(repeat_blocks=1),  # 5x5 keeps the test fast
        decoder=Conv1dDecoder(num_classes=29),
    )
    batch, samples = 2, 16000
    audio = jnp.zeros((batch, samples), jnp.float32)
    lengths = jnp.full((batch,), samples, jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, audio, lengths, train=False)

    got = _xla_forward_flops(model, variables, audio, lengths)
    if got is None:
        pytest.skip("backend reports no cost analysis")

    frames = samples // 160 + 1
    analytic = quartznet_forward_flops(
        frames, repeat_blocks=1, batch=batch
    ) + filterbank_flops(samples, batch=batch)
    # analytic excludes elementwise (BN, relu, masking, normalize): it must
    # lower-bound XLA's count but capture the vast majority of it
    assert analytic <= got * 1.001
    assert analytic >= 0.85 * got


def test_wav2vec2_analytic_vs_xla():
    from thunder_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(
        hidden_size=192,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=384,
        conv_dim=(64,) * 7,
    )
    enc = Wav2Vec2Encoder(cfg, mask_input=True)
    batch, samples = 2, 16000
    audio = jnp.zeros((batch, samples), jnp.float32)
    lengths = jnp.full((batch,), samples, jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), audio, lengths)

    def fwd(p, a, l):
        return enc.apply(p, a, l)

    got = xla_flops(fwd, params, audio, lengths)
    if got is None:
        pytest.skip("backend reports no cost analysis")

    analytic = wav2vec2_forward_flops(
        samples,
        hidden_size=192,
        num_hidden_layers=2,
        intermediate_size=384,
        conv_dim=(64,) * 7,
        num_classes=0,  # bare encoder, no CTC head here
        batch=batch,
    )
    assert analytic <= got * 1.001
    assert analytic >= 0.80 * got


def test_citrinet_analytic_vs_xla():
    from thunder_tpu.models import CitrinetEncoder

    # bare encoder, reduced config: the CPU cost analysis counts standalone
    # conv ops reliably but loses matmuls inside loop fusions (the mel/DFT
    # frontend), so the cross-check gates the encoder counter only — the
    # frontend term is covered by test_quartznet_analytic_vs_xla's model-level
    # proportions and the shared filterbank_flops formula
    filters, kernels, strides, repeat = (64, 64, 128), (11, 13, 15), (2, 1, 2), 2
    enc = CitrinetEncoder(
        filters=filters, kernel_sizes=kernels, strides=strides,
        repeat=repeat, feat_in=80,
    )
    batch, frames = 2, 101
    feats = jnp.zeros((batch, frames, 80), jnp.float32)
    flens = jnp.full((batch,), frames, jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, flens, train=False)

    got = xla_flops(lambda v, a, l: enc.apply(v, a, l, train=False), variables, feats, flens)
    if got is None:
        pytest.skip("backend reports no cost analysis")

    analytic = citrinet_forward_flops(
        frames, filters=filters, kernel_sizes=kernels, strides=strides,
        repeat=repeat, num_classes=0, batch=batch,
    )
    # XLA's conv count includes the edge padding taps, so it sits above the
    # analytic number on these small-T shapes
    assert analytic <= got * 1.001
    assert analytic >= 0.80 * got


def test_citrinet_split_pinned_constants():
    # the Citrinet-256 bench point (B=16 x 15 s -> 1501 mel frames)
    dw, mxu = citrinet_forward_flops_split(1501, num_classes=29, batch=16)
    assert dw + mxu == citrinet_forward_flops(1501, num_classes=29, batch=16)
    assert 0 < dw < mxu
    t = citrinet_train_flops(240000, num_classes=29, batch=16)
    assert t == 3 * citrinet_forward_flops(1501, num_classes=29, batch=16) + filterbank_flops(
        240000, nfilt=80, batch=16
    )


def test_forward_flops_split_sums_to_total():
    for frames, batch, rb in ((1501, 64, 3), (751, 16, 1)):
        dw, mxu = quartznet_forward_flops_split(frames, batch=batch, repeat_blocks=rb)
        assert dw + mxu == quartznet_forward_flops(frames, batch=batch, repeat_blocks=rb)
        # depthwise is the small-FLOPs / slow-rate term (k taps vs C-wide
        # contractions): it must be well under the matmul term
        assert 0 < dw < mxu
    # pin the default 15x5 bench-point terms to precomputed constants so a
    # future edit to either term is caught (the sum assertion alone is
    # tautological now that the total is implemented as dw + mxu)
    dw, mxu = quartznet_forward_flops_split(1501, batch=64, repeat_blocks=3)
    assert dw == 169_339_084_800, dw
    assert mxu == 1_642_389_176_320, mxu


def test_train_flops_rule():
    f = quartznet_forward_flops(1501, repeat_blocks=3)
    fb = filterbank_flops(240000 // 160 * 160)  # any samples
    t = quartznet_train_flops(240000, repeat_blocks=3)
    assert t == 3 * quartznet_forward_flops(240000 // 160 + 1, repeat_blocks=3) + filterbank_flops(240000)
    assert f > 0 and fb > 0


def test_mfu_helper(monkeypatch):
    monkeypatch.setenv("THUNDER_PEAK_TFLOPS", "100")
    # 50 TFLOPs of work in 1 s on a 100 TFLOPS chip -> 0.5
    assert mfu(50e12, 1.0) == pytest.approx(0.5)
    monkeypatch.delenv("THUNDER_PEAK_TFLOPS")
