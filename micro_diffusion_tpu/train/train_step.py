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
    """
    from .optim import ema_update

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
                jax.tree.map(
                    lambda a, g: a + g.astype(accum_dtype), acc_grads, grads
                ),
            ), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, accum_dtype), state.params
        )
        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro_step,
            (jnp.zeros((), jnp.float32), zero_grads),
            (jnp.arange(n), micro),
        )
        loss = loss_sum / n
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
