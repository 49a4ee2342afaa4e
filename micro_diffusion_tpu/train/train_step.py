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

        if n == 1:
            # Single-microbatch fast path: no scan, no params-sized zero
            # accumulator carry (fp32 = 4.66GB for XL) in the graph - real
            # HBM pressure for the K=1 configs at the 16GB edge (the stage-4
            # lead family). Numerics identical to the scan below: same rng
            # fold (idx 0), same accum_dtype round-trip of the grads, same
            # fp32 mean math.
            mb = jax.tree.map(lambda x: x[0], micro)
            loss, grads = grad_fn(flow_params, jax.random.fold_in(rng, 0), mb)
            grads = _constrain(jax.tree.map(
                lambda g: g.astype(accum_dtype).astype(jnp.float32), grads
            ))
        else:
            def micro_step(acc, inp):
                idx, mb = inp
                loss, grads = grad_fn(
                    flow_params, jax.random.fold_in(rng, idx), mb)
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


class HostEMA:
    """EMA of the params, stored as flat reduced-precision CHUNKS in the TPU
    host's pinned RAM - zero HBM residency between updates.

    The single-chip stage-4 unlock (VERDICT round-3 item 1): the bf16 EMA
    buffer (2.33GB for XL) is touched only once per recipe optimizer update
    (update_interval 1ba = once per 256 per-rank images), yet resident in HBM
    it blocks the bf16 grad accumulator and caps the microbatch. Parked in
    host RAM it costs one H2D read + one D2H write of the EMA bytes per
    recipe update (~1.0s for XL at the measured link rates: H2D ~11.6 GB/s,
    D2H ~2.9 GB/s) and frees the 2.33GB.

    Hard-won constraints of this environment's AOT compile helper
    (scripts/probe_hosttree.py, 2026-08-19): a jit graph touching pinned_host
    memory compiles ONLY with single-array arguments and a single-array
    result - any pytree/tuple operand or result 500s the helper ("layout for
    this output is not set to host memory"), and host arrays created by plain
    ``jax.device_put`` poison later traces with mixed-memory-space avals.
    Hence the design here:

      * the EMA lives as N flat chunks, each a SINGLE host array created by a
        single-in/single-out jit;
      * a device-only flatten jit (pytree params in, flat chunks out - no
        host memory involved, so trees are fine) produces the params chunks;
      * each chunk updates through its own single-in/single-out jitted decay
        e' = s*e + (1-s)*p with explicit host in/out shardings (fp32 math,
        chunk dtype storage - same numerics as optim.ema_update).

    AND one more real-hardware bug (bisected 2026-08-19, scripts/
    probe_decay_corruption.py + probe_ema_fix.py): a 16-BIT pinned_host
    buffer written by one executable reads back PERMUTED in another (a host
    layout mismatch XLA only hits for sub-32-bit host buffers; round-trips
    through matching movers are exact, fp32 is exact). Fix: bf16 numerics are
    stored BIT-PACKED two-per-uint32, so every host buffer is 32-bit.
    probe_ema_fix.py measured the packed chain bit-exact vs the pure-device
    decay chain on the real chip; the raw-bf16 control fails (err ~0.1).

    ``offload=False`` keeps the chunks in device memory through the identical
    pack/decay/unpack path - the CPU-testable mode (XLA:CPU cannot execute
    memory-space-annotated graphs: no annotate_device_placement runtime).
    """

    def __init__(self, params: Any, smoothing: float,
                 dtype: Any = jnp.bfloat16,
                 chunk_bytes: int = 384 * 1024 * 1024,
                 offload: bool = True,
                 device: Optional[Any] = None):
        self.smoothing = float(smoothing)
        self.dtype = jnp.dtype(dtype)
        device = device or jax.devices()[0]
        self._s_dev = jax.sharding.SingleDeviceSharding(device)
        self._s_store = (host_memory_sharding(device) if offload
                         else self._s_dev)
        self.offload = offload

        if self.dtype.itemsize != 2:
            raise ValueError("HostEMA stores 16-bit numerics (bit-packed "
                             f"two-per-uint32 for host safety); got {dtype}")

        leaves, self._treedef = jax.tree_util.tree_flatten(params)
        self._shapes = [l.shape for l in leaves]
        self._dtypes = [l.dtype for l in leaves]
        total = sum(int(jnp.size(l)) for l in leaves)
        self.total_elems = total
        total_padded = total + (total % 2)  # pack pairs -> even length
        self._total_padded = total_padded
        per_chunk = max(2, (chunk_bytes // self.dtype.itemsize) & ~1)
        self._bounds = []
        start = 0
        while start < total_padded:
            self._bounds.append((start, min(start + per_chunk, total_padded)))
            start += per_chunk

        store_dtype = self.dtype

        def flatten(tree):
            flat = jnp.concatenate(
                [jnp.ravel(l).astype(store_dtype)
                 for l in jax.tree_util.tree_leaves(tree)]
            )
            if total_padded != total:
                flat = jnp.pad(flat, (0, total_padded - total))
            return tuple(flat[a:b] for a, b in self._bounds)

        def pack(c):
            # (2m,) 16-bit -> (m,) uint32, HALF-SPLIT: chunk's low half in the
            # low 16 bits, high half in the high bits. Everything stays
            # contiguous 1D (T(1024) linear tiling) - the natural pairwise
            # bitcast route needs an (m, 2) intermediate whose TPU tile pads
            # the minor dim 2 -> 128 lanes, a measured 64x HBM expansion
            # (16GB temp for a 256MB chunk, scripts/probe_hostema_scaling.py).
            u = jax.lax.bitcast_convert_type(c, jnp.uint16).astype(jnp.uint32)
            m = u.shape[0] // 2
            return u[:m] | (u[m:] << 16)

        def unpack(u):  # (m,) uint32 -> (2m,) store_dtype, inverse of pack
            lo = (u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
            hi = (u >> 16).astype(jnp.uint16)
            return jax.lax.bitcast_convert_type(
                jnp.concatenate([lo, hi]), store_dtype)

        # device-only: pytree in, flat device chunks out (host memory never
        # appears in this graph, so the tree operands are fine)
        self._flatten = jax.jit(flatten)
        # single-in/single-out host mover + decay (the proven patterns)
        self._to_store = jax.jit(
            pack, in_shardings=(self._s_dev,), out_shardings=self._s_store,
        )
        s = self.smoothing
        self._decay = jax.jit(
            lambda e, p: pack((
                s * unpack(e).astype(jnp.float32)
                + (1.0 - s) * p.astype(jnp.float32)
            ).astype(store_dtype)),
            in_shardings=(self._s_store, self._s_dev),
            out_shardings=self._s_store,
            donate_argnums=(0,),
        )
        self._to_dev = jax.jit(
            unpack, in_shardings=(self._s_store,), out_shardings=self._s_dev,
        )
        # probe = proven host->dev mover + a device-only slice (a fused
        # unpack-and-index graph with a host operand trips the AOT helper:
        # "Could not find a corresponding buffer for value ... constant")
        self._probe = jax.jit(lambda c: c.astype(jnp.float32)[0])
        self.chunks = [self._to_store(c) for c in self._flatten(params)]

    def update(self, params: Any) -> None:
        """ema <- s*ema + (1-s)*params, against POST-update params (reference
        EMA cadence: once per optimizer update)."""
        dev_chunks = self._flatten(params)
        self.chunks = [self._decay(e, p)
                       for e, p in zip(self.chunks, dev_chunks)]

    def materialize(self) -> Any:
        """Reassemble the EMA pytree on device (for eval/checkpointing)."""
        flat = jnp.concatenate([self._to_dev(c) for c in self.chunks])
        out, pos = [], 0
        for shape, dt in zip(self._shapes, self._dtypes):
            n = 1
            for d in shape:
                n *= d
            out.append(flat[pos:pos + n].reshape(shape).astype(dt))
            pos += n
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def block(self) -> float:
        """Value-fetch barrier on the newest chunk (through the axon relay,
        block_until_ready does not reliably block)."""
        return float(self._probe(self._to_dev(self.chunks[-1])))


class AsyncHostEMA:
    """EMA stored in HOST RAM as fp32 numpy, decayed on a worker CPU thread.

    The round-4 stage-3/4 unlock, v2. HostEMA (above) parks the EMA in pinned
    host memory but its decay graphs execute ON the device, streaming the EMA
    chunks H2D and back D2H on the device execution stream every update -
    measured ~2.6s per recipe cycle at stage 4 (tune_results 2026-08-19),
    which erases the accumulation win. This class moves the DECAY MATH to the
    host CPU:

      * device work per update: one jitted flatten (params tree -> flat bf16
        chunks in HBM, ~2.33GB for XL) + async D2H enqueue - no decay graph,
        no H2D return leg, nothing params-sized resident between updates;
      * a worker thread fetches each chunk (np.asarray rides the transfer
        engine, overlapping the next accumulation cycle's grad dispatches)
        and applies e <- s*e + (1-s)*p in fp32 numpy.

    Numerics: the EMA accumulator is fp32 (BETTER than the in-state bf16
    tree); the params contribution is rounded to bf16 for the wire - the same
    quantization the in-state bf16 EMA applies to the whole accumulator.
    Recorded in PARITY.md. The reference cadence is preserved: one update per
    optimizer step, against post-update params (Composer EMA,
    /root/reference/micro_diffusion/models/model.py ema block semantics).

    Works on any backend (no pinned_host memory kinds involved), so the CPU
    suite tests it bit-exactly (tests/test_train.py)."""

    def __init__(self, params: Any, smoothing: float,
                 chunk_bytes: int = 384 * 1024 * 1024):
        import queue
        import threading

        import numpy as np

        self.smoothing = float(smoothing)
        leaves, self._treedef = jax.tree_util.tree_flatten(params)
        self._shapes = [l.shape for l in leaves]
        self._dtypes = [l.dtype for l in leaves]
        total = sum(int(jnp.size(l)) for l in leaves)
        self.total_elems = total
        per_chunk = max(1, chunk_bytes // 2)  # bf16 wire bytes
        self._bounds = []
        start = 0
        while start < total:
            self._bounds.append((start, min(start + per_chunk, total)))
            start += per_chunk

        def flatten(tree):
            flat = jnp.concatenate(
                [jnp.ravel(l).astype(jnp.bfloat16)
                 for l in jax.tree_util.tree_leaves(tree)]
            )
            return tuple(flat[a:b] for a, b in self._bounds)

        self._flatten = jax.jit(flatten)

        # init: ema = params, exact fp32 (one-time fetch; updates ride bf16)
        self._ema = np.empty((total,), np.float32)
        pos = 0
        for l in leaves:
            n = int(jnp.size(l))
            self._ema[pos:pos + n] = np.asarray(l, np.float32).ravel()
            pos += n

        self._q = queue.Queue()
        self._exc = None

        def worker():
            while True:
                item = self._q.get()
                try:
                    if item is None:
                        return
                    for (a, b), c in zip(self._bounds, item):
                        p = np.asarray(c).astype(np.float32)
                        e = self._ema[a:b]
                        e *= self.smoothing
                        e += (1.0 - self.smoothing) * p
                except Exception as exc:  # noqa: BLE001 - re-raised in block()
                    self._exc = exc
                finally:
                    self._q.task_done()

        self._worker = threading.Thread(target=worker, daemon=True)
        self._worker.start()

    def update(self, params: Any) -> None:
        """ema <- s*ema + (1-s)*params (post-update params, recipe cadence).
        Returns immediately: the D2H fetch + fp32 decay run on the worker
        thread, overlapped with subsequently dispatched device work."""
        if self._exc is not None:
            raise self._exc
        dev_chunks = self._flatten(params)
        for c in dev_chunks:
            c.copy_to_host_async()
        self._q.put(dev_chunks)

    def block(self) -> None:
        """Drain pending updates (joins the fetch+decay queue)."""
        self._q.join()
        if self._exc is not None:
            raise self._exc

    def close(self) -> None:
        self._q.put(None)

    def ema_tree(self) -> Any:
        """The EMA pytree as host numpy arrays in the params' dtypes (for
        checkpointing/eval). Call block() first if updates are in flight."""
        import numpy as np

        out, pos = [], 0
        for shape, dt in zip(self._shapes, self._dtypes):
            n = 1
            for d in shape:
                n *= d
            out.append(
                self._ema[pos:pos + n].reshape(shape).astype(np.dtype(dt)))
            pos += n
        return jax.tree_util.tree_unflatten(self._treedef, out)


class HostComputeEMA:
    """EMA as fp32 chunks in pinned TPU-host RAM, decayed ON THE HOST CPU via
    XLA host-offloaded compute (``compute_on('device_host')``).

    The third EMA placement, and the missing cell of the round-4 stage-4
    ledger (PERF.md round 4 §2). The other off-HBM placements both pay more:
    HostEMA's decay graphs execute on the DEVICE, streaming the EMA chunks
    H2D and back D2H every update (~2.6 s/cycle measured); AsyncHostEMA's
    numpy decay is sound but its client-side fetch crosses this deployment's
    network tunnel at 0.03 GB/s. Here the decay e' = s*e + (1-s)*p runs
    inside the XLA program but annotated for the TPU host's CPU, so the only
    device-link traffic per recipe update is the ONE-WAY bf16 params D2H -
    measured 1.67 s drained for the full XL tree, and the dispatches overlap
    subsequently enqueued device compute (scripts/probe_hostcompute_ema.py).
    Zero HBM residency between updates, same as HostEMA.

    Numerics: the EMA accumulator is fp32 (finer than the in-state bf16
    tree); the params contribution rides the wire in bf16 - the same
    quantization the in-state bf16 EMA applies to its whole buffer. Host fp32
    FMA contraction differs from the TPU's fp32 rounding by a few ulp per
    decay (measured rel ~1e-6 over 5 chained decays on the real chip);
    recorded in PARITY.md. fp32 host buffers round-trip EXACTLY through the
    relay - the cross-executable permutation bug is sub-32-bit only (see
    HostEMA) - so no bit-packing is needed here.

    Reference cadence preserved: one update per optimizer step, against
    post-update params (Composer EMA, update_interval 1ba -
    /root/reference/configs/res_512_finetune.yaml ema block).

    ``offload=False``: identical chunking/decay math with device buffers and
    no host annotation - the CPU-testable mode (XLA:CPU executes neither
    memory-space-annotated graphs nor device_host computations).
    """

    def __init__(self, params: Any, smoothing: float,
                 chunk_bytes: int = 768 * 1024 * 1024,
                 offload: bool = True,
                 device: Optional[Any] = None):
        from jax.experimental.compute_on import compute_on

        self.smoothing = float(smoothing)
        self.offload = offload
        device = device or jax.devices()[0]
        s_dev = jax.sharding.SingleDeviceSharding(device)
        s_store = host_memory_sharding(device) if offload else s_dev
        self._s_dev, self._s_store = s_dev, s_store

        leaves, self._treedef = jax.tree_util.tree_flatten(params)
        self._shapes = [l.shape for l in leaves]
        self._dtypes = [l.dtype for l in leaves]
        total = sum(int(jnp.size(l)) for l in leaves)
        self.total_elems = total
        per_chunk = max(1, chunk_bytes // 4)  # fp32 host storage
        self._bounds = []
        start = 0
        while start < total:
            self._bounds.append((start, min(start + per_chunk, total)))
            start += per_chunk

        def flatten(tree):
            flat = jnp.concatenate(
                [jnp.ravel(l).astype(jnp.bfloat16)
                 for l in jax.tree_util.tree_leaves(tree)]
            )
            return tuple(flat[a:b] for a, b in self._bounds)

        # device-only: pytree in, flat bf16 device chunks out (trees are fine
        # in graphs that never touch host memory - see HostEMA)
        self._flatten = jax.jit(flatten)

        s = self.smoothing

        def decay_fn(e, p):
            if offload:
                with compute_on("device_host"):
                    return s * e + (1.0 - s) * p.astype(jnp.float32)
            return s * e + (1.0 - s) * p.astype(jnp.float32)

        # single-array-in/single-array-out graphs wherever host memory is
        # involved (the relay's AOT constraint - HostEMA docstring)
        self._decay = jax.jit(decay_fn, in_shardings=(s_store, s_dev),
                              out_shardings=s_store, donate_argnums=(0,))
        self._to_store = jax.jit(lambda c: c.astype(jnp.float32),
                                 in_shardings=(s_dev,), out_shardings=s_store)
        self._to_dev = jax.jit(lambda c: c, in_shardings=(s_store,),
                               out_shardings=s_dev)
        self._probe = jax.jit(lambda c: c[0])

        # init: ema = params through the same bf16 wire as updates (one
        # bf16-rounding of the initial copy, same as the in-state bf16 EMA's
        # init). A full-fp32 device flatten here would materialize a second
        # 4.3GiB fp32 tree next to the live train state - the bf16 chunks
        # peak at half that and are freed per-chunk by _to_store.
        self.chunks = [self._to_store(c) for c in self._flatten(params)]

    def update(self, params: Any) -> None:
        """ema <- s*ema + (1-s)*params, POST-update params (recipe cadence).
        Device cost: one flatten (bf16 params copy) + the one-way D2H inside
        each decay; dispatches return immediately and overlap later-enqueued
        device work."""
        for run in self.begin_update(params):
            run()

    def _chunk_flatten_fns(self):
        """Per-chunk flatten jits: chunk i's bf16 wire slice computed from
        ONLY the param leaves overlapping [a_i, b_i) - so a lazily-staged
        update never materializes the full 2.33GB (XL) bf16 params copy.
        Built on first use (n_chunks small graphs)."""
        if getattr(self, "_chunk_fns", None) is not None:
            return self._chunk_fns
        sizes = []
        for shape in self._shapes:
            n = 1
            for d in shape:
                n *= d
            sizes.append(n)
        fns = []
        for a, b in self._bounds:
            pieces, pos = [], 0
            for li, n in enumerate(sizes):
                lo, hi = max(a, pos), min(b, pos + n)
                if lo < hi:
                    pieces.append((li, lo - pos, hi - pos))
                pos += n
            def fn(tree, pieces=tuple(pieces)):
                leaves = jax.tree_util.tree_leaves(tree)
                return jnp.concatenate([
                    jax.lax.slice(
                        jnp.ravel(leaves[li]).astype(jnp.bfloat16), (s,), (e,)
                    )
                    for li, s, e in pieces
                ])
            fns.append(jax.jit(fn))
        self._chunk_fns = fns
        return fns

    def begin_update(self, params: Any, lazy: bool = False):
        """Stage one EMA update and return its per-chunk decay dispatches as a
        list of thunks for the CALLER to interleave with other device work.

        The round-4 recipe measurements showed 'never'-drain ~= drained
        (23.05 vs 23.26 img/s, tune_results.jsonl): the N chunk-decay programs
        enqueued back-to-back after the optimizer apply SERIALIZE on the
        device stream, so the overlap the isolated probe demonstrated
        (scripts/probe_hostcompute_ema.py probe 3) never materializes in-step.
        This API lets the training loop dispatch ONE chunk decay between
        successive grad-microbatch dispatches of the NEXT accumulation cycle,
        giving the runtime compute to schedule around each one-way D2H
        (VERDICT r4 next-round #4). Each thunk must run exactly once, in
        order; update() is the run-them-all-now form.

        ``lazy=True``: each thunk computes ITS chunk's bf16 wire slice at
        dispatch time (per-chunk flatten jits) instead of staging the whole
        flatten up front - required for interleaving at HBM-edge configs: the
        eager flatten's full bf16 params copy (2.33GB for XL) staying
        resident across the next cycle's grad peak is a measured
        RESOURCE_EXHAUSTED at stage-4 mb8 (tune_results 2026-08-20), where
        the one-chunk-at-a-time residency fits. The thunks snapshot the
        params REFERENCE: with lazy staging the caller must dispatch every
        thunk before donating/overwriting the params buffers (the dispatch
        loop of the next cycle does exactly that)."""
        if not lazy:
            dev_chunks = self._flatten(params)

            def make_thunk(i, p):
                def run():
                    self.chunks[i] = self._decay(self.chunks[i], p)
                return run

            return [make_thunk(i, p) for i, p in enumerate(dev_chunks)]

        fns = self._chunk_flatten_fns()

        def make_lazy_thunk(i, fn):
            def run():
                self.chunks[i] = self._decay(self.chunks[i], fn(params))
            return run

        return [make_lazy_thunk(i, fn) for i, fn in enumerate(fns)]

    def stage_update(self, params: Any, lazy: bool = False) -> "StagedEMAUpdate":
        """begin_update wrapped in the one-object interleave protocol: call
        ``tick()`` once after each grad dispatch of the next cycle and
        ``drain()`` before the cycle's (donating) apply. Keeps the
        must-run-every-thunk-in-order-before-donation invariant in ONE place
        instead of copy-pasted driver loops (round-5 review finding)."""
        return StagedEMAUpdate(self.begin_update(params, lazy=lazy))

    def _split_plan(self):
        """Per-chunk piece map: chunk k covers [(leaf_idx, lo, hi, whole)]
        where [lo, hi) indexes INTO the chunk and ``whole`` marks a leaf
        fully contained in it (the common case: 768MB chunks vs <=24MB
        leaves; only boundary leaves split).

        NOTE: this interval-intersection arithmetic also exists leaf-relative
        in _chunk_flatten_fns (the lazy update wire) and as a running-offset
        walk in materialize_numpy - three consumers of the same layout, kept
        separate deliberately: the wire path's generated HLO is measured and
        compile-cache-warmed, so it must not be perturbed by a shared-plan
        refactor. Any change to chunking (self._bounds) must update all
        three."""
        if getattr(self, "_plan", None) is not None:
            return self._plan
        sizes = []
        for shape in self._shapes:
            n = 1
            for d in shape:
                n *= d
            sizes.append(n)
        plan = [[] for _ in self._bounds]
        pos = 0
        for li, n in enumerate(sizes):
            start, end = pos, pos + n
            for k, (a, b) in enumerate(self._bounds):
                lo, hi = max(start, a), min(end, b)
                if lo < hi:
                    plan[k].append((li, lo - a, hi - a, hi - lo == n))
            pos = end
        self._plan = plan
        return plan

    def _split_fns(self):
        """One jit per chunk: chunk -> tuple of leaf pieces, whole leaves
        already reshaped to their final shape/dtype. Donating the chunk input
        bounds the device transient to ~one chunk + the produced leaves."""
        if getattr(self, "_splitters", None) is not None:
            return self._splitters
        plan = self._split_plan()
        fns = []
        for k, entries in enumerate(plan):
            def fn(c, entries=tuple(entries)):
                out = []
                for li, lo, hi, whole in entries:
                    piece = jax.lax.slice(c, (lo,), (hi,))
                    if whole:
                        piece = piece.reshape(self._shapes[li]).astype(
                            self._dtypes[li])
                    out.append(piece)
                return tuple(out)
            fns.append(jax.jit(fn, donate_argnums=(0,)))
        self._splitters = fns
        return fns

    def materialize(self) -> Any:
        """Reassemble the EMA pytree on device (for eval).

        Streams ONE chunk to device at a time and splits it into final
        leaves with a per-chunk jit - peak device transient ~= the output
        tree + one chunk (~5.4GB for XL), where the naive concat-then-slice
        form peaks at 2x the tree (9.3GB) and OOMs next to the resident
        train state on the shipped single-chip stage-4 config (round-5
        review finding). Boundary-spanning leaves (at most n_chunks-1 of
        them) are stitched eagerly."""
        plan = self._split_plan()
        fns = self._split_fns()
        # zero-size leaves overlap no chunk (start == end in the plan walk):
        # seed them with empty arrays so the tree has no None holes
        leaves = [
            (jnp.zeros(shape, dt) if any(d == 0 for d in shape) else None)
            for shape, dt in zip(self._shapes, self._dtypes)
        ]
        partial = {}
        for k in range(len(self._bounds)):
            if not plan[k]:
                continue
            pieces = fns[k](self._to_dev(self.chunks[k]))
            for (li, _lo, _hi, whole), piece in zip(plan[k], pieces):
                if whole:
                    leaves[li] = piece
                else:
                    partial.setdefault(li, []).append(piece)
        for li, parts in partial.items():
            flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
            leaves[li] = flat.reshape(self._shapes[li]).astype(
                self._dtypes[li])
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    def materialize_numpy(self) -> Any:
        """Reassemble the EMA pytree as host numpy (for checkpointing): one
        chunk fetched at a time, zero params-sized device transients."""
        import numpy as np

        flat = np.empty((self.total_elems,), np.float32)
        for (a, b), c in zip(self._bounds, self.chunks):
            arr = np.asarray(self._to_dev(c), np.float32)
            flat[a:a + arr.shape[0]] = arr
        out, pos = [], 0
        for shape, dt in zip(self._shapes, self._dtypes):
            n = 1
            for d in shape:
                n *= d
            out.append(flat[pos:pos + n].reshape(shape).astype(np.dtype(dt)))
            pos += n
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def block(self) -> float:
        """Value-fetch barrier on the newest chunk (through the axon relay,
        block_until_ready does not reliably block)."""
        return float(self._probe(self._to_dev(self.chunks[-1])))


class StagedEMAUpdate:
    """Pending per-chunk EMA decay dispatches from HostComputeEMA.stage_update:
    ``tick()`` once per grad dispatch of the next cycle (one decay rides each
    gap), ``drain()`` before any graph that donates/overwrites the staged
    params buffers."""

    def __init__(self, thunks):
        self._thunks = list(thunks)

    def tick(self) -> None:
        """Dispatch ONE pending chunk decay (no-op when drained)."""
        if self._thunks:
            self._thunks.pop(0)()

    def drain(self) -> None:
        """Dispatch every remaining chunk decay."""
        while self._thunks:
            self._thunks.pop(0)()


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
