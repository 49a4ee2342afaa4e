"""Optimizer, LR schedules, and EMA for MicroDiT training.

Reproduces the reference training components:
  * AdamW with decoupled weight decay (train.py:29-39, configs optimizer block)
  * MoE-parameter lr/2 grouping (train.py:29-37). NOTE the reference matches the
    substring 'moe' against torch parameter names - which never occurs (MoE modules are
    named 'mlp'), so the branch is dead there. We reproduce the same mechanism against
    flax paths with the same default matcher, i.e. the same (no-op) behavior, but the
    machinery is live for configs that set a real matcher.
  * Composer LR schedule semantics in optax form: CosineAnnealingWithWarmupScheduler
    (linear warmup 0->1 then cosine to alpha_f), ConstantScheduler,
    ConstantWithWarmupScheduler (configs/*: scheduler block)
  * gradient clipping by global norm (Composer GradientClipping algorithm, train.py:85-86)
  * EMA with configurable smoothing/start step (the reference imports EMA from the
    external mosaicml `diffusion` repo - a dependency gap (SURVEY.md #2.2); ours is
    first-party).
"""

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


# ----------------------------------------------------------------------- schedules


def cosine_with_warmup(
    base_lr: float, t_warmup: int, t_max: int, alpha_f: float = 0.0
) -> Callable:
    """Composer CosineAnnealingWithWarmupScheduler: linear warmup then cosine to
    alpha_f * base_lr at t_max."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(t_warmup, 1)
        tau = (step - t_warmup) / jnp.maximum(t_max - t_warmup, 1)
        tau = jnp.clip(tau, 0.0, 1.0)
        cos = alpha_f + (1.0 - alpha_f) * 0.5 * (1.0 + jnp.cos(math.pi * tau))
        return base_lr * jnp.where(step < t_warmup, warm, cos)

    return schedule


def constant_schedule(base_lr: float, alpha: float = 1.0) -> Callable:
    def schedule(step):
        return jnp.full((), base_lr * alpha, jnp.float32)

    return schedule


def constant_with_warmup(base_lr: float, t_warmup: int, alpha: float = 1.0) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(t_warmup, 1)
        return base_lr * alpha * jnp.minimum(warm, 1.0)

    return schedule


def build_schedule(cfg: dict, base_lr: float, t_max: int) -> Callable:
    """Build a schedule from a reference-style scheduler config block.

    Accepts the reference `_target_` names (composer.optim.*) or short names.
    """
    target = cfg.get("_target_", cfg.get("name", "constant"))
    name = target.split(".")[-1].lower()

    def parse_t(v):  # '2500ba' -> 2500
        if isinstance(v, str):
            assert v.endswith("ba"), f"only 'ba' units supported, got {v}"
            return int(v[:-2])
        return int(v)

    if "cosineannealingwithwarmup" in name:
        return cosine_with_warmup(
            base_lr, parse_t(cfg["t_warmup"]), t_max, float(cfg.get("alpha_f", 0.0))
        )
    if "constantwithwarmup" in name:
        return constant_with_warmup(
            base_lr, parse_t(cfg["t_warmup"]), float(cfg.get("alpha", 1.0))
        )
    if "constant" in name:
        return constant_schedule(base_lr, float(cfg.get("alpha", 1.0)))
    raise ValueError(f"unknown scheduler {target}")


# ----------------------------------------------------------------------- optimizer


def scale_by_adam_low_precision(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Any = jnp.bfloat16,
    nu_dtype: Any = jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam scaling with BOTH moments stored in reduced precision (update math in
    fp32). Cuts optimizer-state HBM (and update traffic) ~2x vs fp32 moments - the
    single-chip memory lever beyond optax's mu_dtype (which only covers mu).

    Note: bf16 nu loses ~3 decimal digits on the second moment; appropriate for
    throughput benchmarking and large-batch training, opt-in for convergence-critical
    runs.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=mu_dtype), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=nu_dtype), params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        b1c = 1 - b1**count.astype(jnp.float32)
        b2c = 1 - b2**count.astype(jnp.float32)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu32 = b1 * mu.astype(jnp.float32) + (1 - b1) * g32
            nu32 = b2 * nu.astype(jnp.float32) + (1 - b2) * g32 * g32
            out = (mu32 / b1c) / (jnp.sqrt(nu32 / b2c) + eps)
            return out, mu32.astype(mu_dtype), nu32.astype(nu_dtype)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        outs = [upd(g, m, v) for g, m, v in zip(flat_u, flat_mu, flat_nu)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return new_updates, optax.ScaleByAdamState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _label_params(params: Any, moe_matcher: str = "moe") -> Any:
    """Label each param 'moe' or 'rest' by path substring (train.py:29-30 semantics)."""

    def label(path, _leaf):
        p = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        ).lower()
        return "moe" if moe_matcher in p else "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    params: Any,
    lr_schedule: Callable,
    weight_decay: float = 0.1,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
    clip_norm: Optional[float] = None,
    moe_lr_factor: float = 0.5,
    moe_matcher: str = "moe",
    mu_dtype: Any = None,
    low_precision_moments: bool = False,
) -> optax.GradientTransformation:
    """AdamW (+ global-norm clip) with optional reduced-lr group for MoE params.

    ``mu_dtype`` can be jnp.bfloat16 to halve first-moment memory;
    ``low_precision_moments`` stores BOTH Adam moments in bf16 (fp32 math) - the
    aggressive single-chip memory/bandwidth option.
    """

    def adamw(factor):
        if low_precision_moments:
            return optax.chain(
                scale_by_adam_low_precision(betas[0], betas[1], eps),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_learning_rate(
                    lambda step: lr_schedule(step) * factor
                ),
            )
        return optax.adamw(
            learning_rate=lambda step: lr_schedule(step) * factor,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )

    labels = _label_params(params, moe_matcher)
    has_moe = any(l == "moe" for l in jax.tree.leaves(labels))
    if has_moe and moe_lr_factor != 1.0:
        tx = optax.multi_transform(
            {"rest": adamw(1.0), "moe": adamw(moe_lr_factor)}, labels
        )
    else:
        tx = adamw(1.0)

    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


# ----------------------------------------------------------------------- EMA


def ema_update(
    ema_params: Any,
    params: Any,
    step: jax.Array,
    smoothing: float,
    ema_start: int,
    update_interval: int = 1,
) -> Any:
    """EMA with start gating: mirror params before ema_start, decay after
    (reference recipe: smoothing 0.99975 from 25000ba at stage 3, 0.9975 from 1000ba at
    stage 4 - configs/res_512_pretrain.yaml:4-9). ``update_interval`` k applies the
    decay only every k-th step after ema_start (the reference EMA's update_interval;
    before ema_start the mirror runs every step).

    For k > 1 the skip is a ``lax.cond`` around the whole tree update, NOT an
    elementwise where: a where still streams the full param + EMA trees through
    HBM on every step (~9.3GB for XL - the entire cost of EMA), whereas the
    cond's identity branch moves nothing. k == 1 keeps the original unconditional
    jaxpr bit-for-bit (compile-cache stability for every existing config)."""
    decay = jnp.where(step >= ema_start, smoothing, 0.0)
    if update_interval <= 1:
        # Original unconditional form, kept jaxpr-identical (persistent
        # compile-cache stability for every existing interval-1 config).
        do = jnp.logical_or(step < ema_start, step % max(1, update_interval) == 0)
        # fp32 decay math regardless of the EMA storage dtype: a bf16-stored EMA
        # (the single-chip HBM compromise - a second fp32 param copy does not fit
        # next to params + moments on 16GB) still accumulates at fp32 precision
        # within each update before rounding back.
        return jax.tree.map(
            lambda e, p: jnp.where(
                do,
                (decay * e.astype(jnp.float32)
                 + (1.0 - decay) * p.astype(jnp.float32)).astype(e.dtype),
                e,
            ),
            ema_params, params,
        )

    def upd(operands):
        e_tree, p_tree = operands
        return jax.tree.map(
            lambda e, p: (decay * e.astype(jnp.float32)
                          + (1.0 - decay) * p.astype(jnp.float32)).astype(e.dtype),
            e_tree, p_tree,
        )

    do = jnp.logical_or(step < ema_start, step % update_interval == 0)
    return jax.lax.cond(do, upd, lambda ops: ops[0], (ema_params, params))
