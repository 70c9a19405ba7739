"""Speech-like corpus (tools/speech_corpus.py) + the silence-gradient
guard in the power-law loss (esc_tpu/modules/losses.py GRAD_FLOOR).

Round-4 finding: a corpus with true digital silence sat on the
power-law compression's gradient singularity — generator gradnorm
1e11 vs 1e5 on a silence-free corpus — and global clipping then erased
every step (the speechlike smoke trained completely flat). Pinned here:
the forward is bit-identical to the reference formula, the derivative
is bounded at zero, the corpus carries a recording floor instead of
exact zeros, and a tiny model actually LEARNS on the corpus.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from esc_tpu.modules.losses import GRAD_FLOOR, POWER, power_law


def test_power_law_forward_matches_reference_formula(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    ref = jnp.sign(x) * (jnp.abs(x) + 1e-10) ** POWER
    np.testing.assert_array_equal(np.asarray(power_law(x)),
                                  np.asarray(ref))
    # including exact zeros: forward value is eps**p, sign 0
    z = jnp.zeros((3,), jnp.float32)
    np.testing.assert_array_equal(np.asarray(power_law(z)),
                                  np.zeros(3, np.float32))


def test_power_law_gradient_bounded_at_silence():
    g = jax.grad(lambda x: power_law(x).sum())
    bound = POWER * (GRAD_FLOOR + 1e-10) ** (POWER - 1.0)
    got0 = float(g(jnp.zeros((), jnp.float32)))
    assert np.isfinite(got0) and got0 <= bound * 1.001, got0
    # ...and matches the analytic derivative away from the floor
    x = jnp.asarray(0.5, jnp.float32)
    want = POWER * (0.5 + 1e-10) ** (POWER - 1.0)
    assert float(g(x)) == pytest.approx(want, rel=1e-5)


def test_corpus_has_floor_not_zeros(tmp_path):
    from esc_tpu.train.data import load_wav
    from tools.speech_corpus import make_speech_corpus
    make_speech_corpus(str(tmp_path), n_clips=3)
    for i in range(3):
        x = load_wav(str(tmp_path / f"speech_{i:02d}.wav"))
        assert x.shape == (8000,)
        assert np.abs(x).max() <= 1.0
        # syllabic structure: meaningful low-energy fraction, but the
        # recording floor keeps every sample off exact zero
        e = np.convolve(x ** 2, np.ones(160) / 160, "same")
        assert (e < e.max() * 0.01).mean() > 0.05
        # PCM16 quantizes sub-LSB dither to scattered zeros (realistic);
        # what must not exist is SUSTAINED digital silence (a zero run
        # longer than a 10 ms frame)
        z = (x == 0.0).astype(np.int32)
        runs = np.diff(np.flatnonzero(np.diff(np.pad(z, 1))))[::2] \
            if z.any() else np.array([0])
        assert runs.max() < 160, runs.max()


def test_tiny_model_learns_on_speech_corpus(tmp_path, rng):
    """30 steps on the speechlike corpus: finite sane gradients and a
    decreasing loss (the r4 smoke-failure regression)."""
    import optax

    from esc_tpu.models import make_model
    from esc_tpu.modules.losses import (complex_stft_loss,
                                        mel_spectrogram_loss)
    from esc_tpu.train.data import make_dataloader
    from tools.speech_corpus import make_speech_corpus
    from tests.test_model_shapes import TINY_CONFIG

    make_speech_corpus(str(tmp_path), n_clips=8)
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=7920)
    dl = make_dataloader(str(tmp_path), 4, shuffle=False, pad_eval=False,
                         pad_fn=model.pad_length)
    batches = [jnp.asarray(b) for b in dl]
    module = model.module
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(4e-4))

    def loss_fn(p, x):
        out = module.apply({"params": p}, x, None,
                           jnp.asarray(6, jnp.int32), False, True)
        stft = complex_stft_loss(out["raw_feat"], out["recon_feat"])
        mel = mel_spectrogram_loss(out["raw_audio"], out["recon_audio"])
        return (stft + 0.25 * mel + out["cb_loss"]
                + 0.25 * out["cm_loss"]).mean()

    @jax.jit
    def step(p, o, x):
        l, g = jax.value_and_grad(loss_fn)(p, x)
        gn = optax.global_norm(g)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l, gn

    p = model.variables["params"]
    o = tx.init(p)
    losses, gnorms = [], []
    for i in range(30):
        p, o, l, gn = step(p, o, batches[i % len(batches)])
        losses.append(float(l))
        gnorms.append(float(gn))
    assert all(np.isfinite(losses)) and all(np.isfinite(gnorms))
    # no silence-singularity explosion...
    assert max(gnorms) < 1e6, max(gnorms)
    # ...and actual learning (the stuck smoke moved <0.1% in 40 steps)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.95 * first, (first, last)
