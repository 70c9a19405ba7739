"""Adversarial codec trainer (generator + DAC discriminator).

Re-design of scripts/trainer_adv.py on the SPMD DP mesh. One jitted
step runs the generator update (weighted mel/stft/cm/cb + LS-GAN gen +
feature-matching losses, clip 1e3) followed by the discriminator update
(LS-GAN disc loss on the detached reconstruction, clip 10.0) — the
reference's two backward passes fused into a single compiled program.
GAN terms are disabled during the codebook-freeze pretraining stage
(trainer_adv.py:75-80, 96-107); ``--pretrain_ckp`` switches to
post-adversarial finetuning at lr/10 (trainer_adv.py:41).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.discriminator import Discriminator
from ..modules.gan_loss import discriminator_loss, generator_loss
from ..modules.losses import complex_stft_loss, mel_spectrogram_loss
from ..parallel import process_is_main
from ..utils.config import namespace2dict
from .data import quantization_dropout
from .optim import make_optimizer
from .trainer import Trainer

__all__ = ["TrainerAdv"]


class TrainerAdv(Trainer):
    """Adversarial trainer: ESC generator + MPD/MRD discriminator."""

    def load(self):
        model, train_dl, val_dl = super().load()
        args, cfg = self.args, self.config

        if getattr(args, "pretrain_ckp", None):
            # post-adversarial finetuning runs the generator at lr/10
            # (trainer_adv.py:41); rebuild its optimizer.
            args.lr_disc = args.lr
            args.lr = args.lr / 10.0
            self.schedule = (lambda base: (lambda s: base(s) / 10.0))(
                self.schedule)
            self.tx = make_optimizer(self.schedule, clip_norm=1e3)
        else:
            args.lr_disc = args.lr
            self.tx = make_optimizer(self.schedule, clip_norm=1e3)

        disc_cfg = namespace2dict(cfg.discriminator) \
            if hasattr(cfg, "discriminator") else {}
        disc_cfg = {k: (tuple(map(tuple, v)) if k == "bands" else
                        tuple(v) if isinstance(v, list) else v)
                    for k, v in disc_cfg.items()}
        self.disc_module = Discriminator(**disc_cfg)
        rng = jax.random.PRNGKey(getattr(args, "seed", 53) + 1)
        L = 7920
        self.disc_params = self.disc_module.init(
            rng, jnp.zeros((1, L), jnp.float32))["params"]
        n_disc = sum(int(np.prod(np.shape(l)))
                     for l in jax.tree_util.tree_leaves(self.disc_params))
        self.print0(f"   Discriminator #Parameters: {n_disc / 1e6:.2f}M")
        self.tx_disc = make_optimizer(args.lr_disc, clip_norm=10.0)

        self.loss_weights.update(
            gen=float(cfg.loss.gen_weight), feat=float(cfg.loss.feat_weight))
        return model, train_dl, val_dl

    # ------------------------------------------------------------------
    def _make_step_fn(self, module):
        from .trainer import _STEP_FN_CACHE

        key = (module, self.disc_module,
               tuple(sorted(self.loss_weights.items())),
               id(self.tx), id(self.tx_disc))
        hit = _STEP_FN_CACHE.get(key)
        if hit is not None:
            return hit[0]
        fn = self._build_step_fn(module)
        _STEP_FN_CACHE[key] = (fn, self.tx, self.tx_disc)
        return fn

    def _build_step_fn(self, module):
        weights = self.loss_weights
        disc_module = self.disc_module
        tx, tx_disc = self.tx, self.tx_disc  # don't pin self in the cache

        def disc_apply(p, x):
            return disc_module.apply({"params": p}, x)

        @functools.partial(jax.jit, static_argnames=("freeze",),
                           donate_argnums=(0,))
        def train_step(state, batch, num_streams, freeze):
            params, opt_state, d_params, d_opt_state = state

            # ---- generator update -----------------------------------
            def gen_loss_fn(p):
                out = module.apply({"params": p}, batch, None, num_streams,
                                   freeze, True)
                mel = mel_spectrogram_loss(out["raw_audio"],
                                           out["recon_audio"])
                stft_l = complex_stft_loss(out["raw_feat"], out["recon_feat"])
                if freeze:  # GAN disabled in pretraining
                    gen = jnp.zeros_like(mel)
                    feat = jnp.zeros_like(mel)
                else:
                    gen, feat = generator_loss(disc_apply, d_params,
                                               out["recon_audio"],
                                               out["raw_audio"])
                total = (out["cm_loss"] * weights["cm"]
                         + out["cb_loss"] * weights["cb"]
                         + mel * weights["mel"]
                         + stft_l * weights["stft"]
                         + gen * weights["gen"]
                         + feat * weights["feat"])
                aux = {"cm_loss": out["cm_loss"].mean(),
                       "cb_loss": out["cb_loss"].mean(),
                       "mel_loss": mel.mean(), "stft_loss": stft_l.mean(),
                       "gen_loss": gen.mean(), "feat_loss": feat.mean(),
                       "recon": out["recon_audio"]}
                return total.mean(), aux

            (loss, aux), grads = jax.value_and_grad(gen_loss_fn,
                                                    has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            # ---- discriminator update -------------------------------
            recon = jax.lax.stop_gradient(aux.pop("recon"))
            if freeze:
                d_loss = jnp.zeros(())
            else:
                def disc_loss_fn(dp):
                    return discriminator_loss(disc_apply, dp, recon,
                                              batch).mean()

                d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(d_params)
                d_updates, d_opt_state = tx_disc.update(
                    d_grads, d_opt_state, d_params)
                d_params = optax.apply_updates(d_params, d_updates)

            aux["loss"] = loss
            aux["disc_loss"] = d_loss
            return (params, opt_state, d_params, d_opt_state), aux

        return train_step

    # ------------------------------------------------------------------
    def _restore_targets(self, params):
        return {
            "model_disc_state_dict": self.disc_params,
            "optimizer_disc_state_dict": self.tx_disc.init(self.disc_params),
        }

    def train(self):
        args = self.args
        model, train_dl, val_dl = self.load()
        self.model, self.val_dl = model, val_dl

        self.best_perf, self.start_step = float("-inf"), 0
        opt_state = None
        disc_opt_state = None
        if getattr(args, "resume", False):
            import os
            rolling = (f"{args.save_path}/{args.exp_name}/checkpoint.ckpt"
                       if getattr(args, "save_path", None) else None)
            if rolling and os.path.exists(rolling):
                self._load_resume(rolling, model)
                opt_state = self._resumed_opt_state
                disc_opt_state = self._apply_resumed_disc()
        if getattr(args, "pretrain_ckp", None):
            self._load_resume(args.pretrain_ckp, model)
            # Post-adversarial training restarts step counting but keeps
            # the generator optimizer moments when present
            # (trainer_adv.py:118-128).
            opt_state = self._resumed_opt_state
            disc_opt_state = self._apply_resumed_disc()
            self.start_step, self.best_perf = 0, float("-inf")

        params = model.variables["params"]
        state = self._state = self.dp.replicate((
            params,
            opt_state if opt_state is not None else self.tx.init(params),
            self.disc_params,
            disc_opt_state if disc_opt_state is not None
            else self.tx_disc.init(self.disc_params)))
        step_fn = self._make_step_fn(model.module)

        if getattr(args, "pretrain_ckp", None) and process_is_main():
            self.evaluate(-1)  # pre-eval (trainer_adv.py:133-135)

        step, t0, window_steps = self.start_step, time.time(), 0
        while step < args.max_train_steps:
            # Epoch-aligned iteration for exact resume (see Trainer.train).
            epoch, offset = divmod(step, args.train_steps)
            train_dl.set_epoch(epoch)
            for i, batch in enumerate(train_dl):
                if i < offset:
                    continue
                if args.pretraining_steps > 0 \
                        and step == args.pretraining_steps + 1:
                    params = state[0]
                    state = self._state = (
                        params, self.dp.replicate(self.tx.init(params)),
                        state[2], state[3])
                    self.print0("Pretraining done. Generator's Optimizer "
                                "Renewed")
                s = quantization_dropout(args.dropout_rate,
                                         model.max_streams, self.rng)
                freeze = step < args.pretraining_steps
                if window_steps == 0:
                    self.timer.tic()
                state, aux = step_fn(state, self.dp.shard(batch),
                                     jnp.int32(s), freeze=freeze)
                self._state = state
                window_steps += 1
                self._log_accumulate(aux)
                if (step + 1) % args.log_steps == 0:
                    # one sync per log window, as in Trainer.train —
                    # a real D2H fetch (block_until_ready can return
                    # early on remote-TPU tunnels)
                    np.asarray(aux["loss"])
                    self.timer.toc_window(window_steps)
                    window_steps = 0
                if process_is_main():
                    if step > args.pretraining_steps \
                            and step % args.train_steps == 0 and step > 0:
                        self._sync_model(state)
                        self.evaluate(step)
                    if (step + 1) % args.log_steps == 0:
                        self.log_step(step, time.time() - t0)
                    if step == args.pretraining_steps and step > 0:
                        self._sync_model(state)
                        self.save_ckp(state, step, tag="pretrained.ckpt")
                step += 1
                if step >= args.max_train_steps:
                    break
        self._sync_model(state)
        self.disc_params = jax.device_get(state[2])
        self.save_ckp(state, step - 1, tag="checkpoint.ckpt")
        return state

    def _apply_resumed_disc(self):
        """After ``_load_resume``, install restored discriminator weights
        and return its restored optimizer state (or None)."""
        payload = self._resumed_payload
        if not payload:
            return None
        if payload.get("model_disc_state_dict") is not None \
                and len(jax.tree_util.tree_leaves(
                    payload["model_disc_state_dict"])) > 0:
            self.disc_params = payload["model_disc_state_dict"]
        d_opt = payload.get("optimizer_disc_state_dict")
        return d_opt if d_opt and jax.tree_util.tree_leaves(d_opt) else None

    def save_ckp(self, state, step, tag):
        """Reference layout + disc state (scripts/trainer_adv.py:160-172):
        adds model_disc_state_dict / optimizer_disc_state_dict."""
        import json
        from ..checkpoint import save_checkpoint
        opt_state, extra = None, {}
        if state is not None:
            opt_state = jax.device_get(state[1])
            extra["model_disc_state_dict"] = jax.device_get(state[2])
            extra["optimizer_disc_state_dict"] = jax.device_get(state[3])
        save_checkpoint(
            f"{self.args.save_path}/{self.args.exp_name}", tag, step=step,
            model_state=self.model.variables["params"],
            optimizer_state=opt_state,
            scheduler_state={"type": self.args.scheduler_type, "step": step},
            best_perf=self.best_perf,
            rng_state=json.dumps(self.rng.bit_generator.state), extra=extra)
        self.print0(f"[Step {step + 1}] | checkpoint saved as {tag}")
