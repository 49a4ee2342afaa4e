"""Trainer: the jit'd training loop with eval, checkpointing, callbacks, and resume.

First-party replacement for the reference's Composer Trainer (train.py:103-123,
SURVEY.md #3.1), TPU-first:
  * ONE compiled train step per stage: microbatch grad accumulation, optimizer update,
    EMA - all inside jit; host work is batch staging + windowed metric fetches
  * sharding via NamedShardings over a (data, fsdp, tensor) mesh (parallel/), donated
    state buffers
  * orbax checkpoints carrying train state + dataloader position + rng, with the
    reference's stage-chaining semantics: `load_path` (orbax dir or torch .pt),
    `load_weights_only`, `load_ignore_keys` (lr-state keys and dit.pos_embed are
    structural no-ops here - the schedule derives from step+config and pos_embed is a
    computed constant)
  * Composer-block config compatibility: max_duration/eval_interval/save_interval in
    'ba' units, device_train_microbatch_size, save_num_checkpoints_to_keep
"""

import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.diffusion import LatentDiffusion
from ..parallel import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
)
from .callbacks import Callback, Logger
from .optim import build_optimizer, build_schedule
from .train_step import (
    HostComputeEMA,
    TrainState,
    create_train_state,
    make_apply_step,
    make_ema_step,
    make_eval_step,
    make_grad_step,
    make_train_step,
    zero_grad_accumulator,
)


def parse_duration(v: Any) -> int:
    """'250000ba' -> 250000 (batches are the only supported unit, like the recipes)."""
    if isinstance(v, int):
        return v
    s = str(v)
    assert s.endswith("ba"), f"only 'ba' durations supported, got {v}"
    return int(s[:-2])


class Trainer:
    def __init__(
        self,
        model: LatentDiffusion,
        optimizer: Dict[str, Any],
        schedulers: Dict[str, Any],
        train_dataloader: Any,
        eval_dataloader: Any = None,
        max_duration: Any = "1000ba",
        eval_interval: Any = 0,
        save_interval: Any = 0,
        save_folder: Optional[str] = None,
        save_num_checkpoints_to_keep: int = 1,
        save_overwrite: bool = True,
        device_train_microbatch_size: Optional[int] = None,
        run_name: str = "run",
        seed: int = 18,
        load_path: Optional[str] = None,
        load_ignore_keys: Optional[Sequence[str]] = None,
        load_weights_only: bool = False,
        load_strict_model_weights: bool = True,
        loggers: Optional[List[Logger]] = None,
        callbacks: Optional[List[Callback]] = None,
        algorithms: Optional[Dict[str, Any]] = None,
        ema: Optional[Dict[str, Any]] = None,
        mesh_shape: Optional[Dict[str, int]] = None,
        metric_window: int = 10,
        device: str = "tpu",  # accepted for config parity; jax picks the backend
        autoresume: bool = False,
        accum_mode: str = "scan",  # 'scan' (one fused step) | 'dispatch' (k small
        # grad graphs + one apply graph - for toolchains that reject the scanned
        # whole-step program; semantics identical, see train_step.py)
        grad_accum_dtype: str = "float32",  # accumulator storage for the scan
        # mode; 'bfloat16' halves the params-sized carry (the single-chip XL
        # configuration - see make_train_step / configs/tpu_v5e_1chip)
        param_flow_dtype: Optional[str] = None,  # 'bfloat16': cast the fp32
        # master params once per step OUTSIDE the remat regions so the remat
        # backward re-moves no param bytes and grads leave the backward in
        # bf16 (fp32 update math unchanged) - see make_train_step
        **_: Any,
    ):
        self.model = model
        self.train_loader = train_dataloader
        self.eval_loader = eval_dataloader
        self.max_steps = parse_duration(max_duration)
        self.eval_interval = parse_duration(eval_interval) if eval_interval else 0
        self.save_interval = parse_duration(save_interval) if save_interval else 0
        self.save_folder = save_folder
        self.keep = save_num_checkpoints_to_keep
        self.microbatch_size = device_train_microbatch_size
        self.run_name = run_name
        self.seed = seed
        self.loggers = loggers or []
        self.callbacks = callbacks or []
        self.metric_window = metric_window
        self.autoresume = autoresume

        algorithms = algorithms or {}
        clip_norm = None
        if "gradient_clipping" in algorithms:
            clip_norm = float(algorithms["gradient_clipping"]["clip_norm"])
        # low_precision_layernorm: native behavior (bf16 LN with fp32 stats)

        ema = ema or (algorithms.get("ema") if "ema" in algorithms else None)
        self.ema_cfg = None
        if ema:
            placement = str(ema.get("placement", "in_state"))
            assert placement in ("in_state", "host_cadence", "hostcompute"), (
                placement)
            self.ema_cfg = {
                "smoothing": float(ema.get("smoothing", 0.9999)),
                "ema_start": parse_duration(ema.get("ema_start", 0)),
                "update_interval": max(
                    1, parse_duration(ema.get("update_interval", 1))
                ),
                # storage dtype for the EMA param copy; 'bfloat16' is the
                # single-chip XL configuration (a second fp32 copy does not fit
                # next to params + moments on 16GB; decay math stays fp32 -
                # optim.ema_update). Multi-chip recipes shard and keep fp32.
                "dtype": jnp.dtype(ema["dtype"]) if ema.get("dtype") else None,
                # EMA PLACEMENT (round-4 measured ladder, PERF.md §2; wired
                # into the trainer so train.py runs what bench.py measures -
                # VERDICT r4 missing #4):
                #   in_state     - EMA tree in the TrainState, decayed inside
                #                  the step/apply graph (reference Composer-EMA
                #                  semantics; the default).
                #   host_cadence - EMA tree in the TrainState, but the decay is
                #                  its OWN host-dispatched graph (make_ema_step)
                #                  run every update_interval steps; the train
                #                  step carries no EMA op. For HBM-edge K=1
                #                  configs: folding the interval skip into the
                #                  step as lax.cond costs ~49MB of cond buffers
                #                  (measured OOM at stage-4 mb8). The stage-4
                #                  single-chip lead (23.9 img/s).
                #   hostcompute  - fp32 EMA chunks in pinned TPU-host RAM,
                #                  decay annotated compute_on('device_host')
                #                  (HostComputeEMA): zero HBM residency between
                #                  updates, one-way bf16 params D2H per update.
                "placement": placement,
            }

        # ---------------- mesh + model state
        mesh_shape = mesh_shape or {}
        self.mesh = make_mesh(
            data=mesh_shape.get("data"),
            fsdp=mesh_shape.get("fsdp", 1),
            tensor=mesh_shape.get("tensor", 1),
        )
        self.num_chips = self.mesh.devices.size
        self.global_batch_size = (
            getattr(self.train_loader, "global_batch_size", None)
            or getattr(self.train_loader, "batch_size", 0)
        )

        base_lr = float(optimizer["lr"])
        self.lr_schedule = build_schedule(schedulers, base_lr, self.max_steps)
        params = model.init(jax.random.PRNGKey(seed))
        # low_precision_moments / mu_dtype: bf16 Adam moments (fp32 update math) -
        # the single-chip XL configs in configs/tpu_v5e_1chip need this to fit
        # 1.16B params + AdamW in 16GB HBM (PERF.md). Multi-chip recipes shard the
        # optimizer state instead and can keep fp32 moments.
        _mu = optimizer.get("mu_dtype")
        self.tx = build_optimizer(
            params,
            self.lr_schedule,
            weight_decay=float(optimizer.get("weight_decay", 0.1)),
            betas=tuple(optimizer.get("betas", (0.9, 0.999))),
            eps=float(optimizer.get("eps", 1e-8)),
            clip_norm=clip_norm,
            low_precision_moments=bool(
                optimizer.get("low_precision_moments", False)
            ),
            mu_dtype=jnp.dtype(_mu) if _mu else None,
        )

        self._p_sh = param_shardings(params, self.mesh)
        params = jax.tree.map(jax.device_put, params, self._p_sh)
        self._ema_placement = (
            self.ema_cfg["placement"] if self.ema_cfg else "in_state"
        )
        # hostcompute: the EMA lives OFF the TrainState (HostComputeEMA chunks
        # in pinned host RAM), created at the first post-ema_start update
        self._hc_ema = None
        state_carries_ema = (
            self.ema_cfg is not None and self._ema_placement != "hostcompute"
        )
        state = create_train_state(
            params, self.tx, use_ema=state_carries_ema,
            ema_dtype=self.ema_cfg["dtype"] if self.ema_cfg else None,
        )
        self._o_sh = opt_state_shardings(state.opt_state, self.mesh)
        state = state.replace(
            opt_state=jax.tree.map(jax.device_put, state.opt_state, self._o_sh)
        )
        self.state = state
        self._state_sh = TrainState(
            step=jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec()),
            params=self._p_sh,
            opt_state=self._o_sh,
            ema_params=self._p_sh if state_carries_ema else None,
        )
        self._b_sh = batch_sharding(self.mesh)

        # EMA in the compiled step graph only for the in_state placement; the
        # host placements decay via their own dispatches (below / fit loop)
        in_graph_ema = self.ema_cfg if self._ema_placement == "in_state" else None
        self._ema_decay_fn = self._ema_mirror_fn = None
        if self._ema_placement == "host_cadence":
            self._ema_decay_fn = jax.jit(
                make_ema_step(self.ema_cfg["smoothing"]), donate_argnums=(0,)
            )

            def _mirror(state):
                # pre-ema_start semantics: the EMA tracks the params
                # (optim.ema_update's mirror branch), at interval cadence
                return state.replace(ema_params=jax.tree.map(
                    lambda p, e: p.astype(e.dtype),
                    state.params, state.ema_params,
                ))

            self._ema_mirror_fn = jax.jit(_mirror, donate_argnums=(0,))

        assert accum_mode in ("scan", "dispatch"), accum_mode
        self.accum_mode = accum_mode
        self.accum_dtype = jnp.dtype(grad_accum_dtype)
        self.param_flow_dtype = (
            jnp.dtype(param_flow_dtype) if param_flow_dtype else None
        )
        self._grad_fn = self._apply_fn = None
        if accum_mode == "dispatch" and self.microbatch_size:
            self._grad_fn = jax.jit(
                make_grad_step(model, param_flow_dtype=self.param_flow_dtype),
                donate_argnums=(1,),
            )
            # grad_accum_dtype applies to BOTH accumulation modes; one jitted
            # dispatch for the zeroed tree - eager per-tensor zeros cost
            # ~0.15ms each through the device relay (~10^3 tensors, PERF.md)
            self._zero_fn = jax.jit(
                lambda p: zero_grad_accumulator(p, self.accum_dtype)
            )
            self._apply_fn = jax.jit(
                make_apply_step(
                    self.tx,
                    self.lr_schedule,
                    ema_smoothing=in_graph_ema["smoothing"] if in_graph_ema else None,
                    ema_start=in_graph_ema["ema_start"] if in_graph_ema else 0,
                    ema_update_interval=(
                        in_graph_ema["update_interval"] if in_graph_ema else 1
                    ),
                ),
                static_argnums=(2,),
                # donate the accumulator too (consumed by the apply): keeping
                # its 2.33GB (bf16, XL) alive as a read-only input denies XLA
                # that space for optimizer temps - measured runtime
                # RESOURCE_EXHAUSTED at stage-3 mb32 K=8 (bench, 2026-08-18)
                donate_argnums=(0, 1),
            )
        self._step_fn = jax.jit(
            make_train_step(
                model,
                self.tx,
                self.lr_schedule,
                microbatch_size=self.microbatch_size,
                ema_smoothing=in_graph_ema["smoothing"] if in_graph_ema else None,
                ema_start=in_graph_ema["ema_start"] if in_graph_ema else 0,
                ema_update_interval=(
                    in_graph_ema["update_interval"] if in_graph_ema else 1
                ),
                accum_dtype=self.accum_dtype,
                param_flow_dtype=self.param_flow_dtype,
            ),
            in_shardings=(self._state_sh, self._b_sh, None),
            out_shardings=(self._state_sh, None),
            donate_argnums=(0,),
        )
        self._eval_fn = jax.jit(make_eval_step(model))

        # ---------------- checkpointing
        self._ckpt_mgr = None
        if self.save_folder:
            import orbax.checkpoint as ocp

            path = os.path.abspath(
                os.path.join(self.save_folder.format(run_name=run_name))
            )
            os.makedirs(path, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.keep, create=True
                ),
            )

        if load_path:
            self.load(load_path, load_weights_only, load_ignore_keys,
                      load_strict_model_weights)
        elif self.autoresume and self._ckpt_mgr is not None:
            latest = self._ckpt_mgr.latest_step()
            if latest is not None:
                self.load_orbax_step(latest)

        # Host-side mirror of state.step: reading int(self.state.step) every loop
        # iteration would force a device sync per step (a relay round trip here),
        # serializing dispatch with execution.
        self._py_step = int(self.state.step)

    # ------------------------------------------------------------------ utils

    @property
    def global_step(self) -> int:
        if getattr(self, "_py_step", None) is not None:
            return self._py_step
        return int(self.state.step)

    def print(self, msg: str) -> None:
        if jax.process_index() == 0:
            print(f"[trainer:{self.run_name}] {msg}", flush=True)

    def log(self, scalars: Dict[str, float]) -> None:
        step = self.global_step
        for logger in self.loggers:
            logger.log_scalars(scalars, step)

    def eval_params(self) -> Any:
        """Params used for eval/generation: EMA weights when enabled."""
        if self._ema_placement == "hostcompute":
            if self._hc_ema is not None:
                return self._hc_ema.materialize()
            return self.state.params  # pre-ema_start: EMA would mirror params
        return (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )

    def _maybe_host_ema(self, step: int) -> None:
        """Host-placement EMA dispatch after an optimizer update at (pre-
        increment) ``step``: the recipe cadence is one EMA per optimizer
        update against POST-update params (reference Composer EMA,
        update_interval 1ba - /root/reference/configs/res_512_pretrain.yaml:
        4-9); single-chip overlays raise update_interval so one EMA covers
        256 per-rank images (bench.py's measured host-cadence leg)."""
        if self.ema_cfg is None or self._ema_placement == "in_state":
            return
        if step % self.ema_cfg["update_interval"] != 0:
            return
        start = self.ema_cfg["ema_start"]
        if self._ema_placement == "host_cadence":
            if step < start:
                self.state = self._ema_mirror_fn(self.state)
            else:
                self.state = self._ema_decay_fn(self.state)
            return
        # hostcompute: before ema_start the EMA would mirror the params, so
        # creating the chunks at the FIRST post-start update (init: ema =
        # params through the bf16 wire) is the mirror - and free until then
        if step < start:
            return
        if self._hc_ema is None:
            self._hc_ema = HostComputeEMA(
                self.state.params, self.ema_cfg["smoothing"],
                offload=jax.default_backend() != "cpu",
            )
        else:
            self._hc_ema.update(self.state.params)

    # ------------------------------------------------------------------ ckpt

    def _state_to_save(self) -> Dict[str, Any]:
        d = {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        if self.state.ema_params is not None:
            d["ema_params"] = self.state.ema_params
        elif self._hc_ema is not None:
            # hostcompute placement: reassemble the pinned-host chunks into
            # the checkpoint HOST-side (params dtypes) - the device
            # materialize would transiently cost ~a chunk + the full tree of
            # HBM next to the live train state (round-5 review finding)
            d["ema_params"] = self._hc_ema.materialize_numpy()
        return d

    def _restore_template(self) -> Dict[str, Any]:
        t = jax.tree.map(np.asarray, self._state_to_save())
        if self._ema_placement == "hostcompute" and "ema_params" not in t:
            # resuming before _hc_ema exists: the checkpoint may still carry
            # an EMA tree (params-shaped) - include it in the template; the
            # no-EMA retry in load() covers checkpoints without one
            t["ema_params"] = jax.tree.map(np.asarray, self.state.params)
        return t

    def save(self) -> None:
        if self._ckpt_mgr is None:
            return
        if self._ckpt_mgr.latest_step() == self.global_step:
            return  # already saved at this step (interval save == final save)
        import orbax.checkpoint as ocp

        loader_state = getattr(self, "_save_loader_state", None)
        if loader_state is None:
            loader_state = (
                self.train_loader.state_dict()
                if hasattr(self.train_loader, "state_dict")
                else {}
            )
        self._ckpt_mgr.save(
            self.global_step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(self._state_to_save()),
                loader=ocp.args.JsonSave(loader_state),
            ),
        )
        self._ckpt_mgr.wait_until_finished()
        self.print(f"saved checkpoint at step {self.global_step}")

    def load_orbax_step(self, step: int) -> None:
        import orbax.checkpoint as ocp

        template = self._restore_template()
        try:
            restored = self._ckpt_mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    loader=ocp.args.JsonRestore(),
                ),
            )
        except Exception as exc:
            if "ema_params" not in template:
                raise
            # structure mismatch (checkpoint saved without EMA): retry
            # without - but SAY so, and keep the original error visible if
            # the retry fails too (a corrupt checkpoint must not surface as
            # a confusing second-order structure error)
            self.print(
                f"restore with EMA template failed ({str(exc)[:120]}); "
                "retrying without ema_params"
            )
            template.pop("ema_params", None)
            try:
                restored = self._ckpt_mgr.restore(
                    step,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardRestore(template),
                        loader=ocp.args.JsonRestore(),
                    ),
                )
            except Exception:
                raise exc
        self._apply_restored(restored["state"], weights_only=False)
        if hasattr(self.train_loader, "load_state_dict") and restored.get("loader"):
            self.train_loader.load_state_dict(restored["loader"])
        self.print(f"resumed from checkpoint step {self.global_step}")

    def load(
        self,
        load_path: str,
        weights_only: bool = False,
        ignore_keys: Optional[Sequence[str]] = None,
        strict: bool = True,
    ) -> None:
        """Load a checkpoint: torch .pt (reference released checkpoints / Composer
        state) or an orbax directory produced by this trainer."""
        for key in ignore_keys or []:
            # Reference stage-chaining ignore keys are structural no-ops here:
            # lr/scheduler state is derived from (step, config); dit.pos_embed is a
            # computed constant. Record them for transparency.
            self.print(f"load_ignore_keys: '{key}' (structural no-op in this trainer)")
        if load_path.endswith((".pt", ".pth", ".bin")):
            from ..models.interop import load_torch_checkpoint, validate_params_match

            converted = load_torch_checkpoint(load_path, strict=strict)
            if strict:
                validate_params_match(converted, jax.tree.map(np.asarray,
                                                              self.state.params))
            params = jax.tree.map(
                lambda s, x: jax.device_put(jnp.asarray(x), s.sharding)
                if hasattr(s, "sharding")
                else jnp.asarray(x),
                self.state.params,
                converted,
            )
            self.state = self.state.replace(params=params)
            self.print(f"loaded torch weights from {load_path}")
            return
        # orbax directory: either a manager dir (pick latest) or a step dir
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(load_path))
        step = mgr.latest_step()
        assert step is not None, f"no checkpoints under {load_path}"
        template = self._restore_template()
        try:
            restored = mgr.restore(
                step,
                args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
            )
        except Exception as exc:
            if "ema_params" not in template:
                raise
            # structure mismatch (e.g. checkpoint saved without EMA, loading into an
            # EMA-enabled stage): retry with the non-EMA template - logged, and the
            # original error is preserved if the retry fails too
            self.print(
                f"restore with EMA template failed ({str(exc)[:120]}); "
                "retrying without ema_params"
            )
            template.pop("ema_params", None)
            try:
                restored = mgr.restore(
                    step,
                    args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
                )
            except Exception:
                raise exc
        self._apply_restored(restored["state"], weights_only=weights_only)
        self.print(
            f"loaded {'weights' if weights_only else 'full state'} from "
            f"{load_path} step {step}"
        )

    def _apply_restored(self, restored: Dict[str, Any], weights_only: bool) -> None:
        put = lambda tree, sh: jax.tree.map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), tree, sh
        )
        params = put(restored["params"], self._p_sh)
        if weights_only:
            self.state = self.state.replace(params=params)
            if self.state.ema_params is not None:
                self.state = self.state.replace(
                    ema_params=jax.tree.map(jnp.copy, params)
                )
            self._hc_ema = None  # hostcompute EMA restarts at ema_start
            return
        if self._ema_placement == "hostcompute":
            if "ema_params" in restored:
                # rebuild the pinned-host chunks from the checkpointed EMA
                # tree (the params contribution of every update rides the
                # bf16 wire, so the restore wire's bf16 rounding matches the
                # placement's documented numerics - PARITY.md EMA-storage row)
                self._hc_ema = HostComputeEMA(
                    put(restored["ema_params"], self._p_sh),
                    self.ema_cfg["smoothing"],
                    offload=jax.default_backend() != "cpu",
                )
            else:
                # restored checkpoint carries no EMA (pre-ema_start save):
                # drop any chunks from the abandoned trajectory - they restart
                # fresh at ema_start
                self._hc_ema = None
        if self.state.ema_params is None:
            ema = None
        elif "ema_params" in restored:
            ema = put(restored["ema_params"], self._p_sh)
        else:
            # checkpoint has no EMA (e.g. stage 2 -> stage 3 chaining where EMA starts
            # fresh): mirror the loaded params, not the stale init
            ema = jax.tree.map(jnp.copy, params)
        self.state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=params,
            opt_state=put(restored["opt_state"], self._o_sh),
            ema_params=ema,
        )
        # keep the host-side step mirror fresh for loads issued AFTER
        # __init__ (the in-init load is overwritten by the same value)
        self._py_step = int(self.state.step)

    # ------------------------------------------------------------------ eval

    def _stage_batch(self, batch: Any) -> Any:
        """Place a PER-HOST batch onto the global batch sharding. Multi-host: each
        host's local array is one shard of the global batch
        (jax.make_array_from_process_local_data); plain device_put would treat each
        host's local rows as the whole global array."""
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(self._b_sh, x),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(x, self._b_sh), batch)

    def evaluate(self) -> Optional[float]:
        if self.eval_loader is None:
            return None
        rng = jax.random.PRNGKey(self.seed + 1)
        total, count = 0.0, 0
        loader = self.eval_loader
        params = self.eval_params()
        it = enumerate(self._one_eval_epoch(loader))
        pending = None  # dispatched loss whose value fetch is deferred one
        # batch, so the next batch's H2D rides the running eval step (same
        # double-buffering as the train loop's _stage_next)
        for i, batch in it:
            batch = self._stage_batch(batch)
            loss = self._eval_fn(params, batch, jax.random.fold_in(rng, i))
            if pending is not None:
                total += float(pending)
                count += 1
            pending = loss
        if pending is not None:
            total += float(pending)
            count += 1
        if count == 0:
            return None
        eval_loss = total / count
        self.log({"metrics/eval/loss": eval_loss})
        for cb in self.callbacks:
            cb.eval_end(self, eval_loss)
        return eval_loss

    @staticmethod
    def _one_eval_epoch(loader):
        if hasattr(loader, "_batches"):
            # our LatentsDataLoader: iterate exactly one epoch from the start
            saved = loader.state_dict()
            loader.load_state_dict({"epoch": 0, "step_in_epoch": 0})
            old_epochs = loader.num_epochs
            loader.num_epochs = 1
            try:
                yield from loader
            finally:
                loader.num_epochs = old_epochs
                loader.load_state_dict(saved)
        else:
            yield from loader

    def _train_one_batch(self, batch: Any, rng: jax.Array):
        if self._grad_fn is None:
            return self._step_fn(self.state, batch, rng)
        # dispatch-mode accumulation: k per-microbatch grad graphs + one apply
        b = jax.tree.leaves(batch)[0].shape[0]
        mb = self.microbatch_size
        n = max(1, b // mb)
        r = jax.random.fold_in(rng, self.global_step)
        acc = self._zero_fn(self.state.params)
        for idx in range(n):
            micro = jax.tree.map(lambda x: x[idx * mb:(idx + 1) * mb], batch)
            acc = self._grad_fn(self.state.params, acc, micro, r, idx)
        return self._apply_fn(self.state, acc, n)

    # ------------------------------------------------------------------ fit

    def _timed_batches(self):
        """Iterate the train loader, accumulating host time spent WAITING on
        it (input-pipeline stalls: decode, shuffle, IO) into
        ``self.data_wait_s``. The device step is dispatched async, so with a
        healthy pipeline this is ~0 even when the loader's raw rate is only
        slightly above the step rate."""
        it = iter(self.train_loader)
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                return
            self.data_wait_s += time.perf_counter() - t0
            yield batch

    def _stage_next(self, batches) -> Any:
        """Pull + stage the next batch, or None at loader exhaustion. Called
        right AFTER dispatching a step so the host->device transfer of batch
        i+1 overlaps step i's device execution (double-buffering). Staging
        immediately before the consuming step instead serializes the full
        batch transfer into every cycle - measured on the real chip at
        stage-3 512px: 5.55 s/step (46 img/s) vs the 3.7 s compute (69 img/s
        benched with resident batches); the ~48 MB fp16 batch crosses this
        deployment's client tunnel at ~0.026 GB/s (= the whole 1.86 s gap).
        On a co-located host the same overlap hides PCIe transfer time."""
        # Snapshot the loader position BEFORE pulling the prefetch batch: the
        # pull marks batch i+1 consumed in the loader, but the trainer hasn't
        # trained on it - a checkpoint written after step i must record the
        # pre-pull position or resume would skip the staged batch.
        self._save_loader_state = (
            self.train_loader.state_dict()
            if hasattr(self.train_loader, "state_dict") else {}
        )
        try:
            batch = next(batches)
        except StopIteration:
            return None
        return self._stage_batch(batch)

    def fit(self) -> None:
        for cb in self.callbacks:
            cb.fit_start(self)
        rng = jax.random.PRNGKey(self.seed)
        pending_metrics = None
        t_start = time.time()
        self.data_wait_s = 0.0
        last_wait, last_wait_step = 0.0, self.global_step
        self.print(
            f"training to {self.max_steps}ba from step {self.global_step} on "
            f"{self.num_chips} chip(s), global batch {self.global_batch_size}, "
            f"microbatch {self.microbatch_size}"
        )

        while self.global_step < self.max_steps:
            made_progress = False
            batches = self._timed_batches()
            staged = self._stage_next(batches)
            while staged is not None:
                made_progress = True
                step = self.global_step
                if step >= self.max_steps:
                    break
                batch = staged
                self.state, metrics = self._train_one_batch(batch, rng)
                self._maybe_host_ema(step)
                self._py_step = step + 1
                pending_metrics = metrics
                # prefetch: enqueue the NEXT batch's transfer while the
                # dispatched step executes (see _stage_next)
                staged = self._stage_next(batches)

                next_step = step + 1
                if next_step % self.metric_window == 0 or next_step >= self.max_steps:
                    host_metrics = {
                        k: float(v) for k, v in jax.tree.map(np.asarray,
                                                             pending_metrics).items()
                    }
                    wait_ms = (self.data_wait_s - last_wait) * 1e3 / max(
                        1, next_step - last_wait_step)
                    last_wait, last_wait_step = self.data_wait_s, next_step
                    self.log({f"loss/train/total": host_metrics["loss"],
                              "trainer/data_wait_ms_per_step": wait_ms,
                              **{f"trainer/{k}": v for k, v in host_metrics.items()
                                 if k != "loss"}})
                    for cb in self.callbacks:
                        cb.step_end(self, host_metrics)

                if self.eval_interval and next_step % self.eval_interval == 0:
                    self.evaluate()
                if self.save_interval and next_step % self.save_interval == 0:
                    self.save()
            else:
                if not made_progress:
                    # finite loader exhausted (e.g. num_epochs set) before
                    # max_duration: stop instead of spinning on an empty iterator
                    self.print(
                        f"train loader exhausted at step {self.global_step} "
                        f"(before max_duration {self.max_steps}ba); stopping"
                    )
                    break
                continue
            break

        self.save()
        for cb in self.callbacks:
            cb.fit_end(self)
        self.print(
            f"fit complete: {self.global_step} steps in "
            f"{(time.time() - t_start) / 60:.1f} min"
        )
