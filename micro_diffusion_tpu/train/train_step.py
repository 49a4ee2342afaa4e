"""The jit'd train step: grad accumulation via lax.scan, AdamW update, EMA.

TPU-first equivalents of the reference's Composer internals (SURVEY.md #3.1):
  * Composer device_train_microbatch_size loop  -> lax.scan over microbatches inside ONE
    compiled step, accumulating fp32 grads (no per-microbatch dispatch overhead)
  * FSDP SHARD_GRAD_OP + NCCL                   -> NamedShardings (parallel/) + XLA
    collectives; the step function itself is sharding-agnostic
  * amp_bf16 autocast                           -> bf16 module compute dtype with fp32
    params/grads/optimizer state
  * per-op torch RNG                            -> explicit key folding: rng = fold_in
    (base, step) then fold_in(rng, microbatch_idx); sigma/noise/mask keys split inside
    the loss
"""

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(
    params: Any, tx: optax.GradientTransformation, use_ema: bool = False,
    ema_dtype: Optional[Any] = None,
) -> TrainState:
    """``ema_dtype``: storage dtype for the EMA copy (default: same as params).
    bf16 EMA is the single-chip HBM compromise for XL - a second fp32 param
    copy (4.66GB) does not fit next to params + moments on 16GB; multi-chip
    recipes shard the state and keep fp32."""
    if use_ema:
        ema = jax.tree.map(
            (lambda p: p.astype(ema_dtype)) if ema_dtype is not None
            else jnp.copy,
            params,
        )
    else:
        ema = None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=ema,
    )


def _split_microbatches(batch: Any, microbatch_size: Optional[int]):
    """Reshape every batch leaf (B, ...) -> (n_micro, microbatch, ...)."""
    b = jax.tree.leaves(batch)[0].shape[0]
    if microbatch_size is None or microbatch_size >= b:
        microbatch_size = b
    assert b % microbatch_size == 0, (b, microbatch_size)
    n = b // microbatch_size
    return jax.tree.map(
        lambda x: x.reshape((n, microbatch_size) + x.shape[1:]), batch
    ), n


def make_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    microbatch_size: Optional[int] = None,
    ema_smoothing: Optional[float] = None,
    ema_start: int = 0,
    ema_update_interval: int = 1,
    accum_dtype: Any = jnp.float32,
    param_flow_dtype: Optional[Any] = None,
    grad_shardings: Optional[Any] = None,
) -> Callable:
    """Build the train step fn(state, batch, base_rng) -> (state, metrics).

    ``model`` is a LatentDiffusion (models/diffusion.py); its ``forward`` computes the
    EDM loss with the configured train_mask_ratio.

    ``accum_dtype``: storage dtype of the microbatch gradient accumulator. The
    fp32 default matches Composer's fp32 grad accumulation exactly; bf16 halves
    the accumulator to 2.33GB for XL, which is what lets the full 256-sample
    per-rank batch accumulate on ONE 16GB chip next to fp32 params + bf16
    moments (+ bf16 EMA). The mean/clip/AdamW update math stays fp32 either
    way; only the running sum is stored rounded (grads themselves are bf16
    products upstream, and the K<=32 partial sums stay well inside bf16's
    8-bit mantissa - see tests/test_train_step.py for the tolerance proof).

    ``param_flow_dtype``: optional dtype (bf16) the fp32 master params are cast
    to ONCE per step, OUTSIDE the per-block remat regions, before entering the
    loss. Default (None) keeps the reference-parity amp_bf16 scheme: fp32
    params enter the model and every module casts at its use site - which a
    remat backward re-runs (2x the param bytes moved per step) and which makes
    the parameter cotangents fp32 (a params-sized fp32 tree at the bwd/update
    boundary). With bf16 flow the cast happens once (the remat regions see
    bf16 inputs, nothing to recompute), gradients leave the backward in bf16
    (halving grad write+read traffic and the grad-tree HBM peak by 2.33GB for
    XL), and the mean/clip/AdamW update math stays fp32 exactly as with the
    bf16 accumulator. Deviation from the reference: parameter values and
    parameter cotangents are bf16-rounded once per step (torch amp keeps fp32
    grads); opt-in per config, trajectory-equivalence covered in
    tests/test_train.py.

    ``grad_shardings``: optional pytree of NamedShardings (params-shaped). When
    set, the microbatch gradient accumulator is pinned to those shardings with
    ``lax.with_sharding_constraint`` - the true ZeRO-2 / FSDP SHARD_GRAD_OP
    semantics (reference configs/res_256_pretrain.yaml:117-118): XLA
    reduce-scatters each microbatch's gradients into the sharded accumulator
    instead of all-reducing into a replicated one, so the params-sized carry
    costs 1/fsdp of the replicated footprint per device and the grad traffic
    rides ICI as reduce-scatter. Pass parallel.opt_state-style shardings (shard
    the largest divisible axis); single-device configs leave this None (no-op).
    """
    from .optim import ema_update

    def _constrain(grads):
        if grad_shardings is None:
            return grads
        return jax.tree.map(jax.lax.with_sharding_constraint, grads,
                            grad_shardings)

    def loss_fn(params, rng, microbatch):
        loss, _, _ = model.forward(params, rng, microbatch, train=True)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, batch: Any, base_rng: jax.Array):
        rng = jax.random.fold_in(base_rng, state.step)
        micro, n = _split_microbatches(batch, microbatch_size)
        flow_params = (
            jax.tree.map(lambda p: p.astype(param_flow_dtype), state.params)
            if param_flow_dtype is not None else state.params
        )

        def micro_step(acc, inp):
            idx, mb = inp
            loss, grads = grad_fn(flow_params, jax.random.fold_in(rng, idx), mb)
            acc_loss, acc_grads = acc
            return (
                acc_loss + loss,
                _constrain(jax.tree.map(
                    lambda a, g: a + g.astype(accum_dtype), acc_grads, grads
                )),
            ), None

        zero_grads = _constrain(jax.tree.map(
            lambda p: jnp.zeros(p.shape, accum_dtype), state.params
        ))
        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro_step,
            (jnp.zeros((), jnp.float32), zero_grads),
            (jnp.arange(n), micro),
        )
        loss = loss_sum / n
        grads = _constrain(
            jax.tree.map(lambda g: g.astype(jnp.float32) / n, grad_sum)
        )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_smoothing is not None:
            new_ema = ema_update(
                state.ema_params, new_params, state.step, ema_smoothing, ema_start,
                ema_update_interval,
            )

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "lr": lr_schedule(state.step),
        }
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
            ),
            metrics,
        )

    return train_step


def make_grad_step(model: Any, param_flow_dtype: Optional[Any] = None) -> Callable:
    """Split-dispatch gradient accumulation, part 1: one microbatch's grads added
    into an accumulator (donate the accumulator for in-place update; its dtype is
    set by zero_grad_accumulator - fp32, or bf16 to fit single-chip XL).

    Semantically identical to the lax.scan accumulation in make_train_step, but each
    dispatch compiles a much smaller graph - the robust path on toolchains that
    struggle with the scanned whole-step program, and the natural shape when
    microbatches stream from the host.

    ``param_flow_dtype``: see make_train_step - here the cast runs once per
    dispatch (the master tree is the dispatch input), still outside the remat
    regions, so the remat backward re-moves no param bytes and the cotangents
    leave the backward in bf16."""

    def loss_fn(params, rng, microbatch):
        loss, _, _ = model.forward(params, rng, microbatch, train=True)
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def grad_step(params, acc, microbatch, rng, idx):
        if param_flow_dtype is not None:
            params = jax.tree.map(lambda p: p.astype(param_flow_dtype), params)
        loss, grads = grad_fn(params, jax.random.fold_in(rng, idx), microbatch)
        acc_loss, acc_grads = acc
        return (
            acc_loss + loss,
            jax.tree.map(lambda a, g: a + g.astype(a.dtype), acc_grads, grads),
        )

    return grad_step


def make_apply_step(
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    ema_smoothing: Optional[float] = None,
    ema_start: int = 0,
    ema_update_interval: int = 1,
) -> Callable:
    """Split-dispatch part 2: consume the accumulated (loss_sum, grad_sum) over
    n microbatches and apply the optimizer + EMA, producing the next TrainState."""
    from .optim import ema_update

    def apply_step(state: TrainState, acc, n: int):
        loss_sum, grad_sum = acc
        loss = loss_sum / n
        # fp32 update math regardless of accumulator storage dtype - mirrors the
        # scan path's `g.astype(f32) / n` exactly so both modes are equivalent
        grads = jax.tree.map(lambda g: g.astype(jnp.float32) / n, grad_sum)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None and ema_smoothing is not None:
            new_ema = ema_update(
                state.ema_params, new_params, state.step, ema_smoothing, ema_start,
                ema_update_interval,
            )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "lr": lr_schedule(state.step),
        }
        return (
            TrainState(step=state.step + 1, params=new_params,
                       opt_state=new_opt_state, ema_params=new_ema),
            metrics,
        )

    return apply_step


def make_ema_step(smoothing: float) -> Callable:
    """Standalone EMA apply: state -> state with ema <- s*ema + (1-s)*params
    (fp32 decay math via optim.ema_update, any storage dtype).

    Host-cadence EMA for HBM-edge K=1 configs: the recipe applies EMA once per
    optimizer update over 256 per-rank images (update_interval 1ba,
    res_512_pretrain.yaml:4-9), so a K=1 fallback at microbatch mb owes one EMA
    per 256/mb steps. Folding that skip into the step graph as a lax.cond costs
    ~49MB of cond buffers - measured OOM at stage-4 mb8 (15.79G vs 15.75G,
    2026-08-18) where the plain no-EMA step graph fits. Dispatching this
    function every k-th step from the host keeps the train-step graph exactly
    the fitting one; relay dispatch overhead is measured-zero (PERF.md round 2).
    """
    from .optim import ema_update

    def ema_step(state: TrainState) -> TrainState:
        new_ema = ema_update(
            state.ema_params, state.params, state.step, smoothing,
            ema_start=0, update_interval=1,
        )
        return state.replace(ema_params=new_ema)

    return ema_step


def host_memory_sharding(device: Optional[Any] = None):
    """Sharding that parks an array in the accelerator HOST's RAM (pinned_host
    memory kind) instead of HBM. Transfers ride the host PCIe DMA link
    (measured on this v5e through the axon relay: H2D ~11.6 GB/s, D2H ~2.9
    GB/s at 1GB - scripts/probe_hostmem.py, 2026-08-19)."""
    device = device or jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(device, memory_kind="pinned_host")


def offload_to_host(tree: Any, device: Optional[Any] = None) -> Any:
    """Move a pytree of device arrays to pinned host memory."""
    s_host = host_memory_sharding(device)
    return jax.device_put(tree, jax.tree.map(lambda _: s_host, tree))


def make_host_offload_ema_step(
    smoothing: float, ema_tree: Any, device: Optional[Any] = None,
) -> Callable:
    """EMA update with the EMA tree RESIDENT in TPU-host memory (pinned_host):
    fn(ema_host, params) -> new ema_host (donated in place).

    This is the single-chip stage-4 unlock (VERDICT round-3 item 1): the bf16
    EMA buffer (2.33GB for XL) is only touched once per recipe optimizer
    update (update_interval 1ba = once per 256 per-rank images), yet resident
    in HBM it blocks the bf16 grad accumulator. Parked in host RAM it costs
    one H2D read + one D2H write per recipe update (~1.0s for XL at the
    measured link rates, amortized over the K-microbatch cycle) and frees the
    2.33GB for the accumulator.

    The decay math runs on device in fp32 (exactly optim.ema_update) and the
    result is written back to host storage. The jit declares EXPLICIT host
    in/out shardings: this environment's AOT compile helper 500s on any graph
    whose host-memory operands are left to sharding inference ("layout for
    this output is not set to host memory", scripts/probe_hostmem.py).

    ``ema_tree`` is the live EMA pytree: the returned jit pins its in/out
    shardings to wherever those leaves actually reside, so the same factory
    serves the pinned-host mode (TPU) and a plain device-memory mode (CPU
    tests - XLA:CPU's runtime has no annotate_device_placement custom call,
    so host-memory graphs cannot EXECUTE there; the pinned-host path is
    exercised on real hardware by scripts/probe_hostmem.py and bench.py).
    """
    device = device or jax.devices()[0]
    s_dev = jax.sharding.SingleDeviceSharding(device)
    ema_sh = jax.tree.map(lambda l: l.sharding, ema_tree)
    dev_tree = jax.tree.map(lambda _: s_dev, ema_tree)
    host_mode = any(
        getattr(s, "memory_kind", "device") == "pinned_host"
        for s in jax.tree.leaves(ema_sh)
    )

    def ema_fn(ema, params):
        # Host-memory operands are explicitly staged into device memory space
        # before compute (XLA rejects mixed-memory-space elementwise ops);
        # out_shardings moves the result back to pinned_host.
        stage = (lambda e: jax.device_put(e, s_dev)) if host_mode else (
            lambda e: e)
        return jax.tree.map(
            lambda e, p: (
                smoothing * stage(e).astype(jnp.float32)
                + (1.0 - smoothing) * p.astype(jnp.float32)
            ).astype(e.dtype),
            ema, params,
        )

    return jax.jit(
        ema_fn,
        in_shardings=(ema_sh, dev_tree),
        out_shardings=ema_sh,
        donate_argnums=(0,),
    )


def zero_grad_accumulator(params: Any, dtype: Any = jnp.float32):
    """Fresh (loss_sum, grad_sum) accumulator for make_grad_step.

    dtype=bf16 halves the accumulator's HBM (params-sized): on one 16GB chip the
    XL state (fp32 params + bf16 moments + bf16 EMA) leaves no room for an fp32
    carry, and the bwd-transient grads it replaces were bf16 anyway - same
    storage precision as the scan path's accum_dtype=bf16. Loss sum stays fp32."""
    return (
        jnp.zeros((), jnp.float32),
        jax.tree.map(lambda p: jnp.zeros(p.shape, dtype), params),
    )


def make_eval_step(model: Any) -> Callable:
    """Eval loss on a batch, mask_ratio = eval_mask_ratio (0) - reference model.py:217-222."""

    def eval_step(params: Any, batch: Any, rng: jax.Array):
        loss, _, _ = model.forward(params, rng, batch, train=False)
        return loss

    return eval_step
