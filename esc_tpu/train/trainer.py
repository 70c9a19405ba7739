"""Non-adversarial codec trainer on an SPMD data-parallel mesh.

Re-design of scripts/trainer_no_adv.py for TPU. One jitted train step
per (num_streams, freeze) combination — at most 2 x max_streams compiled
variants, cached by jax.jit. The step runs under DP shardings
(:class:`esc_tpu.parallel.DataParallel`): batch sharded over the
``data`` axis, params/optimizer replicated; XLA inserts the gradient
psum over ICI (the reference's DDP allreduce,
scripts/trainer_no_adv.py:115). No explicit barriers are needed under
SPMD (the reference's per-step ``wait_for_everyone``).

Training-parity details preserved:
* quantization dropout sampled on host per step (scripts/utils.py:11-25)
* codebook-freeze pretraining stage, then **optimizer renewal** at the
  stage switch (trainer_no_adv.py:75-78)
* per-sample (B,) losses weighted then .mean() (trainer_no_adv.py:108-115)
* global-norm clip 0.5 before the step
* per-epoch main-process evaluation at max bitrate and best-PESQ
  checkpoint selection (trainer_no_adv.py:132-150)
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import save_checkpoint
from ..metrics import PESQ, EntropyCounter, MelSpectrogramDistance, SISDR
from ..models import make_model
from ..modules.losses import complex_stft_loss, mel_spectrogram_loss
from ..parallel import DataParallel, process_is_main
from .data import make_dataloader, quantization_dropout
from .evaluate import eval_epoch
from .optim import make_optimizer, make_schedule

__all__ = ["Trainer"]

# jitted train-step closures shared across Trainer instances (see
# Trainer._make_step_fn); values pin the optimizer objects so the
# id()-based keys stay valid
_STEP_FN_CACHE: dict = {}


class Trainer:
    """Distributed codec trainer (non-adversarial)."""

    def __init__(self, config, args, devices=None):
        self.config, self.args = config, args
        self.dp = DataParallel(devices)
        self.log_stats: Optional[Dict[str, list]] = None
        self.rng = np.random.default_rng(getattr(args, "seed", 53))
        self.bps_per_stream = 1.5
        self.wandb = None
        from ..utils.profiling import StepTimer
        self.timer = StepTimer()

    # ------------------------------------------------------------------
    def print0(self, *a, **k):
        if process_is_main():
            print(*a, **k)

    def load(self):
        cfg, args = self.config, self.args
        model = make_model(vars(cfg.model) if not isinstance(cfg.model, dict)
                           else cfg.model, cfg.model_name,
                           seed=getattr(args, "seed", 53))
        model.init_params()
        n_params = model.num_params()

        self.metrics = {"PESQ": PESQ(), "MelDistance": MelSpectrogramDistance(),
                        "SISDR": SISDR()}
        mcfg = model.config
        self.e_counter = EntropyCounter(mcfg["codebook_size"],
                                        mcfg["max_streams"],
                                        mcfg.get("group_size", 3))
        self.loss_weights = {
            "cm": float(cfg.loss.cm_weight), "cb": float(cfg.loss.cb_weight),
            "mel": float(cfg.loss.mel_weight),
            "stft": float(cfg.loss.stft_weight)}

        train_dl = make_dataloader(cfg.data.train_data_path,
                                   cfg.data.train_bs_per_device
                                   * self.dp.num_devices, True,
                                   cfg.data.num_workers)
        val_dl = make_dataloader(cfg.data.val_data_path,
                                 cfg.data.val_bs_per_device, False,
                                 cfg.data.num_workers)
        args.train_steps = len(train_dl)
        args.max_train_steps = args.train_steps * args.num_epochs
        args.pretraining_steps = args.train_steps * args.num_pretraining_epochs

        self.schedule = make_schedule(args.scheduler_type, args.lr,
                                      total_steps=args.max_train_steps,
                                      warmup_steps=args.num_warmup_steps)
        self.tx = make_optimizer(self.schedule, clip_norm=0.5)

        self.print0(f"<<<<Experimental Setup: {args.exp_name}>>>>")
        self.print0(f"   Devices: {self.dp.num_devices}  "
                    f"GlobalBatch: Train "
                    f"{cfg.data.train_bs_per_device * self.dp.num_devices} "
                    f"Val {cfg.data.val_bs_per_device}  LR: {args.lr}")
        self.print0(f"   Total_Training_Steps: {args.train_steps}*"
                    f"{args.num_epochs}={args.max_train_steps}")
        self.print0(f"   Pre-Training_Steps: {args.train_steps}*"
                    f"{args.num_pretraining_epochs}={args.pretraining_steps}")
        self.print0(f"   Optimizer: AdamW    Scheduler: {args.scheduler_type}")
        self.print0(f"   Quantization_Dropout: {args.dropout_rate}")
        self.print0(f"   Model #Parameters: {n_params / 1e6:.2f}M")
        self._save_config()
        return model, train_dl, val_dl

    def _save_config(self):
        """Write config.yaml into the experiment folder so the compress /
        test CLIs can load the run directly (the reference expects users
        to copy it by hand, scripts/test.py:66)."""
        if not process_is_main() or not getattr(self.args, "save_path", None):
            return
        import os
        import yaml
        from ..utils.config import namespace2dict
        d = f"{self.args.save_path}/{self.args.exp_name}"
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.yaml"), "w") as f:
            yaml.safe_dump(namespace2dict(self.config), f, sort_keys=False)

    # ------------------------------------------------------------------
    def _make_step_fn(self, module):
        # Shared across Trainer instances: the jitted closure is keyed by
        # (module, loss weights, optimizer identity) — make_optimizer
        # memoizes equal configs to the same tx object, so e.g. a
        # checkpoint-resume test's three Trainers compile ONE step.
        key = (module, tuple(sorted(self.loss_weights.items())),
               id(self.tx))
        hit = _STEP_FN_CACHE.get(key)
        if hit is not None:
            return hit[0]
        fn = self._build_step_fn(module)
        _STEP_FN_CACHE[key] = (fn, self.tx)  # pin tx: keeps id valid
        return fn

    def _build_step_fn(self, module):
        weights = self.loss_weights
        tx = self.tx  # close over the optimizer, not self: _STEP_FN_CACHE
        # must not pin the Trainer (and its model/loaders) for process life

        def step_core(state, batch, num_streams, freeze):
            """num_streams is a TRACED int32 scalar: stream masking is
            multiply-by-zero (reference csrvq.py:43-45 semantics), so one
            compilation covers every sampled bitrate — only the freeze
            flag forks the graph (2 variants total)."""
            params, opt_state = state

            def loss_fn(p):
                out = module.apply({"params": p}, batch, None, num_streams,
                                   freeze, True)
                mel = mel_spectrogram_loss(out["raw_audio"],
                                           out["recon_audio"])
                stft_l = complex_stft_loss(out["raw_feat"], out["recon_feat"])
                total = (out["cm_loss"] * weights["cm"]
                         + out["cb_loss"] * weights["cb"]
                         + mel * weights["mel"]
                         + stft_l * weights["stft"])
                aux = {"cm_loss": out["cm_loss"].mean(),
                       "cb_loss": out["cb_loss"].mean(),
                       "mel_loss": mel.mean(), "stft_loss": stft_l.mean()}
                return total.mean(), aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            return (params, opt_state), aux

        train_step = functools.partial(
            jax.jit, static_argnames=("freeze",), donate_argnums=(0,)
        )(step_core)
        # un-jitted core, for lax.scan multi-step composition
        # (make_multi_step): dispatch-bound small-model training runs K
        # steps per device dispatch instead of one.
        train_step.core = step_core
        return train_step


    # ------------------------------------------------------------------
    def train(self):
        args = self.args
        model, train_dl, val_dl = self.load()
        self.model, self.val_dl = model, val_dl

        params = model.variables["params"]
        opt_state = self.tx.init(params)
        # -inf, not the reference's -1.0: with the SISDR/MelDistance
        # fallback a negative score must still beat the sentinel.
        self.best_perf, self.start_step = float("-inf"), 0

        # Preemption-safe auto-resume (gap-fill over the reference, whose
        # restarts are manual via --pretrain_ckp, SURVEY §5): --resume
        # restores the rolling checkpoint.ckpt if one exists.
        if getattr(args, "resume", False):
            import os
            rolling = (f"{args.save_path}/{args.exp_name}/checkpoint.ckpt"
                       if getattr(args, "save_path", None) else None)
            if rolling and os.path.exists(rolling):
                self._load_resume(rolling, model)
                params = model.variables["params"]
                if self._resumed_opt_state is not None:
                    opt_state = self._resumed_opt_state
        if getattr(args, "pretrain_ckp", None):
            self._load_resume(args.pretrain_ckp, model)
            params = model.variables["params"]
            if self._resumed_opt_state is not None:
                opt_state = self._resumed_opt_state

        state = self._state = self.dp.replicate((params, opt_state))
        step_fn = self._make_step_fn(model.module)

        step = self.start_step
        t0, window_steps = time.time(), 0
        while step < args.max_train_steps:
            # Epoch-aligned iteration: a resumed run replays the exact
            # data order of the uninterrupted one (set_epoch + in-epoch
            # offset skip; the reference restarts its DataLoader from a
            # fresh shuffle on every resume).
            epoch, offset = divmod(step, args.train_steps)
            train_dl.set_epoch(epoch)
            for i, batch in enumerate(train_dl):
                if i < offset:
                    continue
                if args.pretraining_steps > 0 \
                        and step == args.pretraining_steps + 1:
                    # Optimizer renewal at the pretraining/main switch
                    # (trainer_no_adv.py:75-78).
                    params, _ = state
                    state = self._state = (
                        params, self.dp.replicate(self.tx.init(params)))
                    self.print0("Optimizer Renewed")

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
                    # ONE host sync per log window: dispatch overlaps
                    # compute between boundaries (VERDICT r2 item 8).
                    # np.asarray (a real D2H fetch), NOT block_until_ready
                    # — the latter can return early on remote-TPU
                    # tunnels, which silently fakes the step timer.
                    np.asarray(aux["loss"])
                    self.timer.toc_window(window_steps)
                    window_steps = 0
                if process_is_main():
                    if step > args.pretraining_steps \
                            and step % args.train_steps == 0 and step > 0:
                        self._sync_model(state)
                        self.evaluate(step)
                        # discard the open timing window: host-side
                        # evaluate() wall time must not inflate the
                        # per-step average (next iteration re-tics)
                        window_steps = 0
                    if (step + 1) % args.log_steps == 0:
                        self.log_step(step, time.time() - t0)
                    if step == args.pretraining_steps and step > 0:
                        self._sync_model(state)
                        self.save_ckp(state, step, tag="pretrained.ckpt")
                        window_steps = 0
                step += 1
                if step >= args.max_train_steps:
                    break
        self._sync_model(state)
        # step-1 = index of the last completed step, so a later run with
        # more epochs resumes at exactly `step` (no skipped batch).
        self.save_ckp(state, step - 1, tag="checkpoint.ckpt")
        return state

    # ------------------------------------------------------------------
    def _sync_model(self, state):
        self.model.variables = {"params": jax.device_get(state[0])}

    def _log_accumulate(self, aux):
        if self.log_stats is None:
            self.log_stats = {k: [] for k in aux}
        for k, v in aux.items():
            self.log_stats.setdefault(k, []).append(v)

    def log_step(self, step, elapsed):
        stats = {k: float(np.mean([np.asarray(x) for x in v]))
                 for k, v in self.log_stats.items()}
        self.log_stats = None
        if self.timer is not None:
            stats.update(self.timer.summary())
        msg = " | ".join(f"{k}: {v:.4f}" for k, v in stats.items())
        self.print0(f"[step {step + 1}/{self.args.max_train_steps} "
                    f"{elapsed:.0f}s] {msg}")
        if self.wandb is not None:
            self.wandb.log(stats, step=step)

    def evaluate(self, step):
        eval_streams = self.model.max_streams
        perf = eval_epoch(self.model, self.val_dl, self.metrics,
                          self.e_counter, self.bps_per_stream,
                          num_streams=eval_streams, verbose=False)
        perf = {k: v[0] for k, v in perf.items()}
        self.print0(f"[Step {step + 1}/{self.args.max_train_steps}] | "
                    f"Performance at "
                    f"{eval_streams * self.bps_per_stream:.2f}kbps: ",
                    " | ".join(f"{k}: {v:.4f}" for k, v in perf.items()))
        if self.wandb is not None:
            self.wandb.log(perf, step=step)
        metric_name = self.args.val_metric
        metric = perf.get(metric_name)
        if metric is None or np.isnan(metric):
            # e.g. PESQ without the pesq C library installed: fall back
            # loudly rather than silently never writing best.ckpt.
            for fallback in ("SISDR", "MelDistance"):
                v = perf.get(fallback)
                if v is not None and not np.isnan(v):
                    if not self._warned_val_metric:
                        self.print0(
                            f"WARNING: val_metric {metric_name} is "
                            f"unavailable (NaN) - selecting best.ckpt by "
                            f"{fallback} instead")
                        self._warned_val_metric = True
                    metric_name, metric = fallback, v
                    break
        if metric is not None and not np.isnan(metric):
            # MelDistance is lower-is-better; compare on a signed score.
            score = -metric if metric_name == "MelDistance" else metric
            if score > self.best_perf:
                self.best_perf = score
                self.save_ckp(self._state, step, tag="best.ckpt")
        self.save_ckp(self._state, step, tag="checkpoint.ckpt")

    def save_ckp(self, state, step, tag):
        """Persist the FULL training state (reference layout,
        scripts/trainer_no_adv.py:152-162): weights, optimizer moments +
        schedule count, scheduler descriptor, best_perf, host RNG."""
        import json
        opt_state = jax.device_get(state[1]) if state is not None else None
        save_checkpoint(
            f"{self.args.save_path}/{self.args.exp_name}", tag, step=step,
            model_state=self.model.variables["params"],
            optimizer_state=opt_state,
            scheduler_state={"type": self.args.scheduler_type, "step": step},
            best_perf=self.best_perf,
            rng_state=json.dumps(self.rng.bit_generator.state))
        self.print0(f"[Step {step + 1}] | checkpoint saved as {tag}")

    _resumed_opt_state = None
    _resumed_payload = None
    _warned_val_metric = False
    _state = None

    def _restore_targets(self, params):
        """Payload-key -> live target pytrees for optimizer-state restore
        (subclasses add discriminator state)."""
        return {}

    def _load_resume(self, path, model):
        from ..checkpoint import restore_into
        self._resumed_opt_state = None
        self._resumed_payload = None
        if path.endswith(".pth"):
            from ..convert import load_torch_checkpoint
            load_torch_checkpoint(path, model)
            self.print0(f"Loaded reference torch checkpoint {path}")
            return
        payload = restore_into(
            path, model.variables["params"],
            optimizer_state_target=self.tx.init(model.variables["params"]),
            extra_targets=self._restore_targets(model.variables["params"]))
        model.variables = {"params": payload["model_state_dict"]}
        if payload.get("optimizer_state_dict"):
            self._resumed_opt_state = payload["optimizer_state_dict"]
        if payload.get("rng_state"):
            import json
            self.rng.bit_generator.state = json.loads(payload["rng_state"])
        self._resumed_payload = payload
        self.start_step = int(payload.get("step", 0)) + 1
        self.best_perf = float(payload.get("best_perf", -1.0))
        self.print0(f"Loaded checkpoint {path}: step {self.start_step}, "
                    f"best {self.best_perf}"
                    + (" (full optimizer state restored)"
                       if self._resumed_opt_state is not None else ""))

def make_multi_step(step_core, freeze: bool):
    """K train steps in ONE device dispatch via ``lax.scan``.

    For dispatch-bound regimes (small models, or a remote-dispatch
    tunnel) the per-step host round-trip dominates compute; scanning K
    steps amortizes it to 1/K. ``step_core`` is the un-jitted core from
    ``Trainer._make_step_fn(...).core``.

    The returned fn takes ``(state, batches (K, B, L), num_streams (K,))``
    and returns ``(state, aux-of-(K,)-arrays)``. ``freeze`` is baked per
    compilation (same 2-variant budget as the single-step path).
    """
    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batches, num_streams):
        def body(carry, inp):
            b, ns = inp
            carry, aux = step_core(carry, b, ns, freeze)
            return carry, aux

        return jax.lax.scan(body, state, (batches, num_streams))

    return multi_step
