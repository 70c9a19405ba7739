"""DNS-style DAC trainers (adversarial and non-adversarial).

Re-design of baselines/descript/scripts/train_customize{,_no_adv}.py on
the SPMD DP mesh: iteration-based loop over an infinite shuffled loader,
AdamW betas (0.8, 0.99) with per-step exponential decay gamma=0.999996,
per-sample quantizer dropout, periodic validation + latest/best/Nk
checkpoint tags (train_customize.py:346-460, conf/16khz_dns_9k.yml).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...checkpoint import save_checkpoint
from ...metrics import PESQ, MelSpectrogramDistance, SISDR
from ...models.discriminator import Discriminator
from ...modules.gan_loss import discriminator_loss, generator_loss
from ...parallel import DataParallel, process_is_main
from ...train.data import make_dataloader
from .losses import l1_loss, mel_spectrogram_loss, multi_scale_stft_loss
from .model import DAC

__all__ = ["DACTrainer"]

# jitted step closures shared across DACTrainer instances (see
# DACTrainer._make_step); values pin the owning trainer so closed-over
# optimizer objects stay alive
_DAC_STEP_CACHE: dict = {}

DEFAULT_LAMBDAS = {"mel/loss": 15.0, "adv/feat_loss": 2.0,
                   "adv/gen_loss": 1.0, "vq/commitment_loss": 0.25,
                   "vq/codebook_loss": 1.0, "stft/loss": 1.0,
                   "waveform/loss": 0.0}


class DACTrainer:
    """Iteration-based DAC trainer (adv optional)."""

    def __init__(self, config: Dict, adversarial: bool = True,
                 devices=None):
        self.cfg = config
        self.adversarial = adversarial
        self.dp = DataParallel(devices)
        self.lambdas = {**DEFAULT_LAMBDAS, **config.get("lambdas", {})}
        self.rng = np.random.default_rng(config.get("seed", 53))
        self.best_perf = float("-inf")  # see trainer.py: fallback scores can be negative

    def print0(self, *a):
        if process_is_main():
            print(*a)

    def load(self):
        cfg = self.cfg
        self.model = DAC(seed=cfg.get("seed", 0), **cfg["DAC"])
        self.model.init_params()
        self.print0(f"DAC #params: {self.model.num_params() / 1e6:.2f}M")

        lr = cfg.get("AdamW", {}).get("lr", 1e-4)
        betas = cfg.get("AdamW", {}).get("betas", [0.8, 0.99])
        gamma = cfg.get("ExponentialLR", {}).get("gamma", 0.999996)
        sched = lambda step: lr * gamma ** step  # noqa: E731
        self.tx = optax.chain(
            optax.clip_by_global_norm(1e3),
            optax.adamw(sched, b1=betas[0], b2=betas[1], eps=1e-8,
                        weight_decay=0.01))
        if self.adversarial:
            disc_cfg = dict(cfg.get("Discriminator", {}))
            disc_cfg = {k: (tuple(map(tuple, v)) if k == "bands"
                            else tuple(v) if isinstance(v, list) else v)
                        for k, v in disc_cfg.items()}
            self.disc_module = Discriminator(**disc_cfg)
            self.disc_params = self.disc_module.init(
                jax.random.PRNGKey(cfg.get("seed", 53) + 1),
                jnp.zeros((1, 7920), jnp.float32))["params"]
            self.tx_disc = optax.chain(
                optax.clip_by_global_norm(10.0),
                optax.adamw(sched, b1=betas[0], b2=betas[1], eps=1e-8,
                            weight_decay=0.01))

        bs = cfg.get("batch_size", 16) * self.dp.num_devices
        self.train_dl = make_dataloader(cfg["data_path"] + "/train", bs,
                                        True, cfg.get("num_workers", 4))
        self.val_dl = make_dataloader(cfg["data_path"] + "/test",
                                      cfg.get("val_batch_size", 8), False)
        self.metrics = {"PESQ": PESQ(), "MelDistance": MelSpectrogramDistance(),
                        "SISDR": SISDR()}

    def _make_step(self):
        # Share the jitted step across trainer instances with identical
        # semantics (module, lambdas, optimizer hyperparams): a
        # train -> resume sequence then compiles ONE step graph. The
        # cached closure's tx objects belong to the first instance but
        # compute the same update (hyperparams are part of the key).
        aw = self.cfg.get("AdamW", {})
        key = (self.model.module, self.adversarial,
               self.disc_module if self.adversarial else None,
               tuple(sorted(self.lambdas.items())),
               aw.get("lr", 1e-4), tuple(aw.get("betas", [0.8, 0.99])),
               self.cfg.get("ExponentialLR", {}).get("gamma", 0.999996))
        hit = _DAC_STEP_CACHE.get(key)
        if hit is not None:
            return hit[0]
        fn = self._build_step()
        _DAC_STEP_CACHE[key] = (fn, self)
        return fn

    def _build_step(self):
        module = self.model.module
        lam = self.lambdas
        adv = self.adversarial
        disc_apply = (lambda p, x: self.disc_module.apply({"params": p}, x)) \
            if adv else None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, n_q):
            params, opt = state[0], state[1]

            def loss_fn(p):
                out = module.apply({"params": p}, batch, n_q, True)
                recon = out["audio"]
                mel = mel_spectrogram_loss(batch, recon)
                stft_l = multi_scale_stft_loss(batch, recon)
                wav = l1_loss(batch, recon)
                total = (lam["mel/loss"] * mel
                         + lam["stft/loss"] * stft_l
                         + lam["waveform/loss"] * wav
                         + lam["vq/commitment_loss"]
                         * out["vq/commitment_loss"]
                         + lam["vq/codebook_loss"] * out["vq/codebook_loss"])
                aux = {"mel/loss": mel, "stft/loss": stft_l,
                       "waveform/loss": wav,
                       "vq/commitment_loss": out["vq/commitment_loss"],
                       "vq/codebook_loss": out["vq/codebook_loss"]}
                if adv:
                    n = min(batch.shape[-1], recon.shape[-1])
                    gen, feat = generator_loss(disc_apply, state[2],
                                               recon[..., :n],
                                               batch[..., :n])
                    total = total + lam["adv/gen_loss"] * gen.mean() \
                        + lam["adv/feat_loss"] * feat.mean()
                    aux["adv/gen_loss"] = gen.mean()
                    aux["adv/feat_loss"] = feat.mean()
                    aux["recon"] = recon
                return total, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
            updates, opt = self.tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            if not adv:
                return (params, opt), aux

            d_params, d_opt = state[2], state[3]
            recon = jax.lax.stop_gradient(aux.pop("recon"))
            n = min(batch.shape[-1], recon.shape[-1])

            def d_loss_fn(dp):
                return discriminator_loss(disc_apply, dp, recon[..., :n],
                                          batch[..., :n]).mean()

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
            d_updates, d_opt = self.tx_disc.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            aux["adv/disc_loss"] = d_loss
            return (params, opt, d_params, d_opt), aux

        return step

    def train(self, num_iters: Optional[int] = None):
        self.load()
        cfg = self.cfg
        num_iters = num_iters or cfg.get("num_iters", 400000)
        valid_freq = cfg.get("valid_freq", 4000)
        log_every = cfg.get("log_every", 5)
        # N-thousand-iteration tagged snapshots (train_customize.py:355-358)
        self.save_iters = set(cfg.get("save_iters",
                                      [10000, 50000, 100000, 200000]))

        params = self.model.variables["params"]
        pieces = [params, self.tx.init(params)]
        if self.adversarial:
            pieces += [self.disc_params, self.tx_disc.init(self.disc_params)]
        start_it = 0
        if cfg.get("resume"):
            restored = self._resume(pieces)
            if restored is not None:
                pieces, start_it = restored
        state = self.dp.replicate(tuple(pieces))
        step_fn = self._make_step()
        n_codebooks = cfg["DAC"].get("n_codebooks", 9)
        qd = cfg["DAC"].get("quantizer_dropout", 0.0)

        it, t0 = start_it, time.time()
        stats = []
        while it < num_iters:
            for batch in self.train_dl:
                B = batch.shape[0]
                # per-sample quantizer dropout (quantize.py:166-171)
                n_q = np.full((B,), n_codebooks + 1, np.int32)
                nd = int(B * qd)
                n_q[:nd] = self.rng.integers(1, n_codebooks + 1, nd)
                state, aux = step_fn(state, self.dp.shard(batch),
                                     self.dp.shard(jnp.asarray(n_q)))
                stats.append({k: float(v) for k, v in aux.items()})
                it += 1
                if process_is_main() and it % log_every == 0:
                    mean = {k: np.mean([s[k] for s in stats])
                            for k in stats[-1]}
                    self.print0(f"[iter {it}/{num_iters} "
                                f"{time.time() - t0:.0f}s] " +
                                " | ".join(f"{k}: {v:.3f}"
                                           for k, v in mean.items()))
                    stats = []
                if it % valid_freq == 0 and process_is_main():
                    score = self._validate(state, it)
                    self._save_tagged(state, it, score)
                if it >= num_iters:
                    break
        self._save_tagged(state, it, score=None)
        return state

    _warned_pesq = False

    def _validate(self, state, it):
        """Full validation sweep (train_customize.py:324-345): mel/stft/
        waveform losses + PESQ averaged over the ENTIRE val set. The
        reference selects best checkpoints by PESQ; when the pesq C
        library is absent (NaN) we fall back to SISDR, loudly."""
        self.model.variables = {"params": jax.device_get(state[0])}
        agg: Dict[str, list] = {}
        for x in self.val_dl:
            out = self.model(x)
            recon = np.asarray(out["audio"])
            n = min(x.shape[-1], recon.shape[-1])
            xt, rt = x[..., :n], recon[..., :n]
            vals = {
                "mel/loss": float(np.mean(np.asarray(
                    mel_spectrogram_loss(xt, rt)))),
                "stft/loss": float(np.mean(np.asarray(
                    multi_scale_stft_loss(xt, rt)))),
                "waveform/loss": float(np.mean(np.asarray(
                    l1_loss(xt, rt)))),
                "pesq": float(np.nanmean(self.metrics["PESQ"](xt, rt))),
                "sisdr": float(np.mean(self.metrics["SISDR"](xt, rt))),
            }
            for k, v in vals.items():
                agg.setdefault(k, []).append(v)
        perf = {k: float(np.nanmean(v)) for k, v in agg.items()}
        self.print0(f"[iter {it}] " + " | ".join(
            f"test/{k}: {v:.3f}" for k, v in perf.items()))
        score = perf["pesq"]
        if np.isnan(score):
            if not self._warned_pesq:
                self.print0("WARNING: PESQ unavailable (pesq lib missing) "
                            "- selecting best checkpoint by SISDR")
                self._warned_pesq = True
            score = perf["sisdr"]
        return score

    def _save_tagged(self, state, it, score):
        """latest always; best on improvement; '<N>k' at save_iters
        (train_customize.py:347-377)."""
        tags = ["latest"]
        if score is not None and score > self.best_perf:
            self.best_perf = score
            tags.append("best")
        if it in getattr(self, "save_iters", ()):
            tags.append(f"{it // 1000}k")
        for tag in tags:
            self._checkpoint(state, it, tag)

    def _checkpoint(self, state, it, tag):
        import json
        extra = {}
        if self.adversarial:
            extra["model_disc_state_dict"] = jax.device_get(state[2])
            extra["optimizer_disc_state_dict"] = jax.device_get(state[3])
        save_checkpoint(self.cfg.get("save_path", "./dac_output"),
                        f"{tag}.ckpt", step=it,
                        model_state=jax.device_get(state[0]),
                        optimizer_state=jax.device_get(state[1]),
                        best_perf=self.best_perf,
                        rng_state=json.dumps(self.rng.bit_generator.state),
                        extra=extra)

    def _resume(self, pieces):
        """Restore the rolling 'latest' checkpoint (full training state)."""
        import json
        import os

        from ...checkpoint import restore_into
        path = os.path.join(self.cfg.get("save_path", "./dac_output"),
                            "latest.ckpt")
        if not os.path.exists(path):
            return None
        extra_targets = {}
        if self.adversarial:
            extra_targets = {
                "model_disc_state_dict": pieces[2],
                "optimizer_disc_state_dict": pieces[3],
            }
        payload = restore_into(path, pieces[0],
                               optimizer_state_target=pieces[1],
                               extra_targets=extra_targets)
        new = [payload["model_state_dict"],
               payload.get("optimizer_state_dict") or pieces[1]]
        if self.adversarial:
            new += [payload.get("model_disc_state_dict", pieces[2]),
                    payload.get("optimizer_disc_state_dict") or pieces[3]]
        self.model.variables = {"params": new[0]}
        self.best_perf = float(payload.get("best_perf", -1.0))
        if payload.get("rng_state"):
            self.rng.bit_generator.state = json.loads(payload["rng_state"])
        it = int(payload.get("step", 0))
        self.print0(f"Resumed DAC training from {path} at iter {it} "
                    f"(best {self.best_perf:.3f})")
        return new, it
