"""Training layer tests: schedules (Composer semantics), EMA, the jit'd train step with
microbatch accumulation, and the sharded multi-device (8 fake CPU devices) train step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import DiT
from micro_diffusion_tpu.parallel import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
)
from micro_diffusion_tpu.train import (
    TrainState,
    build_optimizer,
    build_schedule,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from micro_diffusion_tpu.train.optim import (
    _label_params,
    constant_schedule,
    cosine_with_warmup,
    ema_update,
)


def micro_model(train_mask_ratio=0.75):
    dit = DiT(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=2, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(1.0,),
        ffn_multipliers=(2.0,), use_patch_mixer=True, patch_mixer_depth=1,
        patch_mixer_dim=48, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    return LatentDiffusion(
        dit=dit, latent_res=16, train_mask_ratio=train_mask_ratio, latent_scale=1.0
    )


def make_batch(b=8):
    return {
        "image_latents": jax.random.normal(jax.random.PRNGKey(1), (b, 4, 16, 16)),
        "caption_latents": jax.random.normal(jax.random.PRNGKey(2), (b, 1, 8, 32)),
        "drop_caption_mask": jnp.ones((b,)),
    }


def test_cosine_with_warmup_schedule():
    s = cosine_with_warmup(2.4e-4, t_warmup=2500, t_max=250000, alpha_f=0.33)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(1250)), 2.4e-4 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(2500)), 2.4e-4, rtol=1e-6)
    # end of schedule: alpha_f * base
    np.testing.assert_allclose(float(s(250000)), 2.4e-4 * 0.33, rtol=1e-5)
    # midpoint of cosine phase: alpha_f + (1-alpha_f)*0.5
    mid = (2500 + 250000) // 2
    np.testing.assert_allclose(
        float(s(mid)), 2.4e-4 * (0.33 + 0.67 * 0.5), rtol=1e-3
    )


def test_build_schedule_reference_configs():
    s1 = build_schedule(
        {"_target_": "composer.optim.CosineAnnealingWithWarmupScheduler",
         "t_warmup": "2500ba", "alpha_f": 0.33},
        base_lr=2.4e-4, t_max=250000,
    )
    np.testing.assert_allclose(float(s1(2500)), 2.4e-4, rtol=1e-6)
    s2 = build_schedule(
        {"_target_": "composer.optim.ConstantScheduler", "alpha": 1.0},
        base_lr=8e-5, t_max=280000,
    )
    np.testing.assert_allclose([float(s2(0)), float(s2(100000))], 8e-5, rtol=1e-6)
    s3 = build_schedule(
        {"_target_": "composer.optim.ConstantWithWarmupScheduler", "t_warmup": "500ba"},
        base_lr=8e-5, t_max=50000,
    )
    np.testing.assert_allclose(float(s3(250)), 8e-5 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s3(500)), 8e-5, rtol=1e-6)


def test_moe_label_noop_default():
    """Reference quirk parity: 'moe' matches nothing (modules are named mlp), so all
    params get the base lr (train.py:29-37)."""
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    labels = _label_params(params)
    assert all(l == "rest" for l in jax.tree.leaves(labels))


def test_ema_update():
    p0 = {"w": jnp.ones(4)}
    p1 = {"w": jnp.full((4,), 2.0)}
    # before start: mirror
    e = ema_update(p0, p1, jnp.asarray(5), smoothing=0.9, ema_start=10)
    np.testing.assert_allclose(np.asarray(e["w"]), 2.0)
    # after start: decay
    e = ema_update(p0, p1, jnp.asarray(15), smoothing=0.9, ema_start=10)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.9 * 1.0 + 0.1 * 2.0, rtol=1e-6)


def test_ema_bf16_storage_fp32_math():
    """bf16 EMA storage (the single-chip HBM compromise, bench.py): decay math
    runs in fp32 within each update and rounds back to the storage dtype, and
    create_train_state honors ema_dtype."""
    from micro_diffusion_tpu.train import create_train_state
    from micro_diffusion_tpu.train.optim import build_optimizer, constant_schedule

    e = {"w": jnp.ones(4, jnp.bfloat16)}
    p = {"w": jnp.full((4,), 1.001, jnp.float32)}
    out = ema_update(e, p, jnp.asarray(15), smoothing=0.9, ema_start=10)
    assert out["w"].dtype == jnp.bfloat16
    # fp32 math: 0.9*1 + 0.1*1.001 = 1.0001, then rounded to bf16
    np.testing.assert_allclose(
        np.asarray(out["w"], np.float32), np.float32(np.float32(1.0001)),
        rtol=1e-2,
    )

    params = {"w": jnp.ones((2, 2), jnp.float32)}
    tx = build_optimizer(params, constant_schedule(1e-4))
    state = create_train_state(params, tx, use_ema=True, ema_dtype=jnp.bfloat16)
    assert state.ema_params["w"].dtype == jnp.bfloat16


def test_ema_update_interval():
    """Reference recipes set ema update_interval (res_512_pretrain.yaml:4-9); after
    ema_start the decay applies only on interval steps (VERDICT.md weak #7)."""
    p0 = {"w": jnp.ones(2)}
    p1 = {"w": jnp.full((2,), 2.0)}
    # post-start, off-interval step: EMA unchanged
    e = ema_update(p0, p1, jnp.asarray(13), smoothing=0.9, ema_start=10,
                   update_interval=4)
    np.testing.assert_allclose(np.asarray(e["w"]), 1.0)
    # post-start, on-interval step: decay applied
    e = ema_update(p0, p1, jnp.asarray(16), smoothing=0.9, ema_start=10,
                   update_interval=4)
    np.testing.assert_allclose(np.asarray(e["w"]), 1.1, rtol=1e-6)
    # pre-start: mirror regardless of interval
    e = ema_update(p0, p1, jnp.asarray(5), smoothing=0.9, ema_start=10,
                   update_interval=4)
    np.testing.assert_allclose(np.asarray(e["w"]), 2.0)
    # interval > 1 is a lax.cond at the tree level (a where would still stream
    # the full param+EMA trees through HBM on skipped steps - the entire cost
    # of EMA at XL scale); semantics must match the interval-1 where-form under
    # jit with donated buffers, across a window covering both branches.
    @jax.jit
    def stepper(e, step):
        return ema_update(e, p1, step, smoothing=0.9, ema_start=10,
                          update_interval=4)
    e = {"w": jnp.ones(2)}
    got = []
    for s in range(10, 20):
        e = stepper(e, jnp.asarray(s))
        got.append(float(e["w"][0]))
    ref, val = [], 1.0
    for s in range(10, 20):
        if s % 4 == 0:
            val = 0.9 * val + 0.1 * 2.0
        ref.append(val)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_host_ema_chunked_matches_ema_update():
    """HostEMA (EMA as flat bf16 chunks parked off-HBM - the stage-4
    single-chip unlock, VERDICT round-3 item 1) must match optim.ema_update
    bit-for-bit through a donated update chain and reassemble the exact tree.
    offload=False runs the identical chunk/flatten/decay path in device
    memory - the CPU-testable mode (XLA:CPU cannot execute memory-space-
    annotated graphs; the pinned-host mode is exercised on real TPU by
    scripts/probe_hostmem.py and the bench stage-4 rungs)."""
    from micro_diffusion_tpu.train import HostEMA

    params = {"a": jnp.linspace(0.0, 3.0, 32, dtype=jnp.float32).reshape(8, 4),
              "b": jnp.arange(6, dtype=jnp.float32),
              "c": {"w": jnp.full((5, 3), -0.75, jnp.float32)}}
    # tiny chunk budget -> multiple chunks, exercising the split/reassembly
    ema = HostEMA(params, smoothing=0.9, offload=False, chunk_bytes=32)
    assert len(ema.chunks) > 1
    ema.update(params)
    ema.update(params)
    got = ema.materialize()

    ref = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    ref = ema_update(ref, params, jnp.asarray(1), smoothing=0.9, ema_start=0)
    ref = ema_update(ref, params, jnp.asarray(2), smoothing=0.9, ema_start=0)
    for k_got, k_ref in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert k_got.shape == k_ref.shape
        np.testing.assert_array_equal(
            np.asarray(k_got, np.float32), np.asarray(k_ref, np.float32)
        )
    assert np.isfinite(ema.block())


def test_hostcompute_ema_matches_fp32_decay():
    """HostComputeEMA (fp32 EMA chunks in pinned host RAM, decay annotated
    compute_on('device_host') - the third EMA placement of the round-4
    stage-4 ledger) must match the exact fp32 decay chain with bf16-rounded
    params contributions across chunk boundaries, and reassemble the tree.
    The INIT copy also rides the bf16 flatten wire (a deliberate memory fix:
    a full-fp32 device flatten would materialize a second 4.3GiB fp32 tree
    next to the live train state - see HostComputeEMA.__init__), so the
    reference chain starts from bf16_round(params), unlike AsyncHostEMA's
    exact-fp32 init. offload=False runs the identical chunk/decay math in
    device memory with no host annotation - the CPU-testable mode; the
    pinned-host host-compute mode is exercised on real TPU by
    scripts/probe_hostcompute_ema.py."""
    from micro_diffusion_tpu.train import HostComputeEMA

    params = {"a": jnp.linspace(0.0, 3.0, 32, dtype=jnp.float32).reshape(8, 4),
              "b": jnp.arange(6, dtype=jnp.float32),
              "c": {"w": jnp.full((5, 3), -0.75, jnp.float32)}}
    ema = HostComputeEMA(params, smoothing=0.9, offload=False, chunk_bytes=32)
    assert len(ema.chunks) > 1

    p1 = jax.tree.map(lambda p: p * 2.0, params)
    p2 = jax.tree.map(lambda p: p - 1.0, params)
    ema.update(p1)
    ema.update(p2)
    got = ema.materialize()

    def bf16_round(t):
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16).astype(jnp.float32), t)

    ref = bf16_round(params)  # init rides the same bf16 wire as updates
    for p in (bf16_round(p1), bf16_round(p2)):
        ref = jax.tree.map(lambda e, q: 0.9 * e + 0.1 * q, ref, p)
    for k_got, k_ref in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert k_got.shape == k_ref.shape
        np.testing.assert_allclose(
            np.asarray(k_got, np.float32), np.asarray(k_ref), rtol=1e-6,
            atol=1e-6)
    # host-side reassembly (the checkpoint path - zero params-sized device
    # transients) must equal the device materialize exactly; the tiny
    # chunk_bytes here forces boundary-spanning leaves through the stitch
    got_np = ema.materialize_numpy()
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(got_np)):
        assert b.dtype == np.dtype(a.dtype)
        np.testing.assert_array_equal(np.asarray(a), b)
    # chunks survive the donating split jits: another update still works
    ema.update(p1)
    assert np.isfinite(ema.block())


def test_hostcompute_ema_begin_update_interleaved_matches_update():
    """begin_update (the round-5 interleave API: per-chunk decay thunks the
    caller dispatches between grad dispatches) must be bit-identical to
    update() run-all-now, including thunks executed across interleaved other
    device work and across a staged SECOND update whose flatten snapshots the
    newer params."""
    from micro_diffusion_tpu.train import HostComputeEMA

    params = {"a": jnp.linspace(0.0, 3.0, 32, dtype=jnp.float32).reshape(8, 4),
              "b": jnp.arange(6, dtype=jnp.float32)}
    p1 = jax.tree.map(lambda p: p * 2.0, params)
    p2 = jax.tree.map(lambda p: p - 1.0, params)

    ema_a = HostComputeEMA(params, smoothing=0.9, offload=False, chunk_bytes=32)
    ema_a.update(p1)
    ema_a.update(p2)

    ema_b = HostComputeEMA(params, smoothing=0.9, offload=False, chunk_bytes=32)
    thunks = ema_b.begin_update(p1)
    assert len(thunks) == len(ema_b.chunks) > 1
    other = jax.jit(lambda x: x * 3.0)
    for t in thunks:
        other(params["a"])  # unrelated device work between decays
        t()
    for t in ema_b.begin_update(p2):  # staged against post-"apply" params
        t()

    for a, b in zip(jax.tree.leaves(ema_a.materialize()),
                    jax.tree.leaves(ema_b.materialize())):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    # lazy=True via the StagedEMAUpdate protocol (tick per grad gap + drain
    # before the donating apply - the one-place invariant the bench/tune
    # drivers use; lazy per-chunk flatten is the HBM-edge staging: the eager
    # full-flatten residency is a measured OOM at stage-4 mb8): bit-exact.
    ema_c = HostComputeEMA(params, smoothing=0.9, offload=False, chunk_bytes=32)
    for upd in (p1, p2):
        staged = ema_c.stage_update(upd, lazy=True)
        staged.tick()  # one decay rides a simulated grad gap
        other(params["a"])
        staged.tick()
        staged.drain()  # leftovers (n_chunks > gaps here)
        staged.drain()  # idempotent
    for a, c in zip(jax.tree.leaves(ema_a.materialize()),
                    jax.tree.leaves(ema_c.materialize())):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(c, np.float32))


def test_async_host_ema_matches_fp32_decay():
    """AsyncHostEMA (EMA fp32 in host RAM, numpy decay on a worker thread -
    the round-4 TRUE-recipe EMA for the 512px stages) must match the exact
    fp32 decay chain with bf16-rounded params contributions, across chunk
    boundaries and multiple queued updates, and reassemble the tree in the
    params' dtypes."""
    from micro_diffusion_tpu.train import AsyncHostEMA

    params = {"a": jnp.linspace(0.0, 3.0, 32, dtype=jnp.float32).reshape(8, 4),
              "b": jnp.arange(6, dtype=jnp.float32),
              "c": {"w": jnp.full((5, 3), -0.75, jnp.float32)}}
    ema = AsyncHostEMA(params, smoothing=0.9, chunk_bytes=32)
    assert len(ema._bounds) > 1

    p1 = jax.tree.map(lambda p: p * 2.0, params)
    p2 = jax.tree.map(lambda p: p - 1.0, params)
    ema.update(p1)
    ema.update(p2)
    ema.block()
    got = ema.ema_tree()
    ema.close()

    def bf16_round(t):
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16).astype(jnp.float32), t)

    ref = params  # init: ema = params, exact fp32
    for p in (bf16_round(p1), bf16_round(p2)):
        ref = jax.tree.map(lambda e, q: 0.9 * e + 0.1 * q, ref, p)
    for k_got, k_ref in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert k_got.shape == k_ref.shape
        assert k_got.dtype == np.float32
        np.testing.assert_allclose(
            np.asarray(k_got), np.asarray(k_ref), rtol=1e-6, atol=1e-6)


def test_async_host_ema_worker_error_surfaces():
    """A failure on the fetch+decay worker must re-raise in block(), not
    vanish (fail-soft would silently corrupt the EMA)."""
    from micro_diffusion_tpu.train import AsyncHostEMA

    params = {"a": jnp.ones((4,), jnp.float32)}
    ema = AsyncHostEMA(params, smoothing=0.9)
    ema._exc = RuntimeError("boom")
    try:
        ema.update(params)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    ema._exc = None
    ema.close()


def test_train_step_single_device():
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 1000, 0.0)
    tx = build_optimizer(params, sched, clip_norm=0.25)
    state = create_train_state(params, tx, use_ema=True)
    step = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=4,
                        ema_smoothing=0.99, ema_start=2)
    )
    batch = make_batch(8)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state.step) == 3
    # params actually changed
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(params)[0]),
    )


def test_microbatch_grad_accumulation_consistency():
    """Same total batch, different microbatch splits: losses must be close (not equal -
    the rng folding differs per microbatch count) and both finite; with a sigma/noise
    draw per sample from the SAME per-microbatch rng the check is on the machinery, so
    use a fixed rng path by comparing n_micro=1 against manual full-batch grad."""
    model = micro_model(train_mask_ratio=0.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 1000, 0.0)
    tx = build_optimizer(params, sched)
    state = create_train_state(params, tx)
    batch = make_batch(8)
    rng = jax.random.PRNGKey(7)

    step_full = jax.jit(make_train_step(model, tx, sched, microbatch_size=None))
    _, m_full = step_full(state, batch, rng)

    # manual: same rng derivation (fold step then fold microbatch idx 0)
    derived = jax.random.fold_in(jax.random.fold_in(rng, 0), 0)
    loss_manual = model.forward(params, derived, batch, train=True)[0]
    np.testing.assert_allclose(
        float(m_full["loss"]), float(loss_manual), rtol=1e-5
    )


def test_split_dispatch_accumulation_matches_scan():
    """make_grad_step + make_apply_step (per-microbatch dispatches) must produce the
    same step as make_train_step's lax.scan accumulation."""
    from micro_diffusion_tpu.train import (
        make_apply_step,
        make_grad_step,
        zero_grad_accumulator,
    )

    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.5)
    batch = make_batch(8)
    base_rng = jax.random.PRNGKey(7)

    # reference: one fused step with microbatch scan
    state_a = create_train_state(params, tx)
    fused = jax.jit(make_train_step(model, tx, sched, microbatch_size=4))
    state_a, metrics_a = fused(state_a, batch, base_rng)

    # split: 2 grad dispatches + 1 apply dispatch
    state_b = create_train_state(params, tx)
    grad_step = jax.jit(make_grad_step(model), donate_argnums=(1,))
    apply_step = jax.jit(make_apply_step(tx, sched))
    rng = jax.random.fold_in(base_rng, state_b.step)
    acc = zero_grad_accumulator(params)
    for idx in range(2):
        mb = jax.tree.map(lambda x: x[idx * 4 : (idx + 1) * 4], batch)
        acc = grad_step(state_b.params, acc, mb, rng, idx)
    state_b, metrics_b = jax.jit(apply_step, static_argnums=(2,))(state_b, acc, 2)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics_a["grad_norm"]), float(metrics_b["grad_norm"]), rtol=1e-5
    )
    la = jax.tree.leaves(state_a.params)
    lb = jax.tree.leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_split_dispatch_bf16_accumulator_matches_scan_bf16():
    """Dispatch mode with a bf16 accumulator (the single-chip XL configuration:
    no HBM room for an fp32 carry next to fp32 params + bf16 moments + bf16 EMA)
    must match the scan path's accum_dtype=bf16 bit-for-bit: same add order,
    same storage rounding, same fp32 mean/update math - and EMA must update in
    the apply step, not the grad steps."""
    from micro_diffusion_tpu.train import (
        make_apply_step,
        make_grad_step,
        zero_grad_accumulator,
    )

    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.5)
    batch = make_batch(8)
    base_rng = jax.random.PRNGKey(7)

    state_a = create_train_state(params, tx, use_ema=True)
    fused = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=4,
                        accum_dtype=jnp.bfloat16, ema_smoothing=0.99)
    )
    state_a, metrics_a = fused(state_a, batch, base_rng)

    state_b = create_train_state(params, tx, use_ema=True)
    grad_step = jax.jit(make_grad_step(model), donate_argnums=(1,))
    apply_step = jax.jit(
        make_apply_step(tx, sched, ema_smoothing=0.99), static_argnums=(2,)
    )
    rng = jax.random.fold_in(base_rng, state_b.step)
    acc = zero_grad_accumulator(params, jnp.bfloat16)
    assert all(
        g.dtype == jnp.bfloat16 for g in jax.tree.leaves(acc[1])
    )
    for idx in range(2):
        mb = jax.tree.map(lambda x: x[idx * 4 : (idx + 1) * 4], batch)
        acc = grad_step(state_b.params, acc, mb, rng, idx)
    state_b, metrics_b = apply_step(state_b, acc, 2)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state_a.ema_params),
                    jax.tree.leaves(state_b.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bench_dispatch_recipe_leg(monkeypatch):
    """bench._time_dispatch_recipe (the recipe-accumulation leg the real
    benchmark runs when scanned graphs won't compile) executes end-to-end:
    K grad dispatches + jitted zeroing + apply, returns finite throughput."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import bench

    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.5)
    state = create_train_state(params, tx, use_ema=True,
                               ema_dtype=jnp.bfloat16)
    monkeypatch.setattr(bench, "_make_batch", lambda mb, res: make_batch(mb))
    img_s, loss, state = bench._time_dispatch_recipe(
        model, tx, sched, state, mb=4, k_recipe=2, latent_res=16,
        step_kwargs=dict(ema_smoothing=0.99, ema_start=0,
                         ema_update_interval=1),
        rng=jax.random.PRNGKey(3), name="test",
    )
    assert img_s > 0 and np.isfinite(loss)
    assert int(state.step) >= 4  # one cycle per timed iteration + warmups

    # flow16 rung: param_flow_dtype threads through the dispatch leg (popped
    # before make_apply_step, passed to make_grad_step) - pins the bench
    # plumbing the ladders' ("...", "flow16") rungs rely on. Fresh params:
    # the first leg's apply donated the state, deleting the shared buffers.
    params2 = model.init(jax.random.PRNGKey(0))
    state2 = create_train_state(params2, tx, use_ema=True,
                                ema_dtype=jnp.bfloat16)
    img_s2, loss2, state2 = bench._time_dispatch_recipe(
        model, tx, sched, state2, mb=4, k_recipe=2, latent_res=16,
        step_kwargs=dict(ema_smoothing=0.99, ema_start=0,
                         ema_update_interval=1,
                         param_flow_dtype=jnp.bfloat16),
        rng=jax.random.PRNGKey(3), name="test-flow16",
    )
    assert img_s2 > 0 and np.isfinite(loss2)


def test_bench_host_ema_fallback_to_instep(monkeypatch):
    """bench._run_config's host-EMA K=1 rung falls back to the in-step-EMA
    graph when the EMA-free step fails to compile (service epochs were
    measured to 500 the EMA-free stage-3/4 graphs while the in-step-EMA
    graph of the SAME config compiled and ran, 2026-08-18)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import bench

    def tiny_xl(input_size, remat, remat_policy, moe_dispatch):
        return DiT(
            input_size=input_size, patch_size=2, in_channels=4, dim=64,
            depth=2, head_dim=16, multiple_of=32, caption_channels=1024,
            qkv_multipliers=(1.0,), ffn_multipliers=(2.0,),
            use_patch_mixer=True, patch_mixer_depth=1, patch_mixer_dim=48,
            use_bias=False, num_experts=4, expert_capacity=2.0,
            dtype=jnp.float32, moe_dispatch=moe_dispatch,
        )

    monkeypatch.setattr(bench, "MicroDiT_XL_2", tiny_xl)
    monkeypatch.setattr(bench, "PER_RANK_BATCH", 8)  # mb=4 -> k_recipe=2

    real_time_step = bench._time_step
    calls = {"n": 0}

    def failing_first(step_fn, state, batch, rng, timed_steps, label):
        calls["n"] += 1
        if calls["n"] == 1:  # the EMA-free host-EMA K=1 graph "500s"
            raise RuntimeError("INTERNAL: remote_compile: HTTP 500")
        return real_time_step(step_fn, state, batch, rng, timed_steps, label)

    monkeypatch.setattr(bench, "_time_step", failing_first)
    recipe_img_s, bare_img_s, mb, accum = bench._run_config(
        "res512_mask0", latent_res=16, mask_ratio=0.0, policy="none",
        mb=4, timed_steps=1, moe_dispatch="onehot", use_ema=True,
        accum_pref="none",
    )
    assert calls["n"] == 2  # failed host-EMA leg, then the in-step retry
    assert accum == "k1_instep_ema"
    assert recipe_img_s == bare_img_s and np.isfinite(recipe_img_s)


def _micro_trainer(tmp_path, ema, accum_mode="scan", n_batches=6, batch=8,
                   microbatch=None, save_folder=None):
    """A Trainer over the micro model with an in-memory batch list (the
    Trainer only needs an iterable); used by the EMA-placement tests."""
    from micro_diffusion_tpu.train.trainer import Trainer

    batches = [make_batch(batch) for _ in range(n_batches)]
    return Trainer(
        model=micro_model(train_mask_ratio=0.0),
        optimizer={"lr": 1e-3, "weight_decay": 0.1},
        schedulers={"_target_": "composer.optim.ConstantScheduler", "alpha": 1.0},
        train_dataloader=batches,
        max_duration=f"{n_batches}ba",
        device_train_microbatch_size=microbatch,
        seed=0,
        ema=ema,
        accum_mode=accum_mode,
        save_folder=save_folder,
        save_interval=f"{n_batches}ba" if save_folder else 0,
    )


def test_ema_placement_host_cadence_matches_in_state(tmp_path):
    """EMA placement 'host_cadence' (decay as its OWN host-dispatched graph -
    the stage-4 single-chip lead config, PERF.md §2) must produce the exact
    same params AND EMA as the in-graph 'in_state' placement when the cadence
    coincides (interval 1, start 0): same fp32 decay math (optim.ema_update),
    same post-update params, only the dispatch boundary differs. This is the
    plumbing that makes train.py run what bench.py measures (VERDICT r4
    missing #4)."""
    ema_base = {"smoothing": 0.95, "ema_start": 0, "update_interval": 1,
                "dtype": "bfloat16"}
    tr_a = _micro_trainer(tmp_path, dict(ema_base, placement="in_state"))
    tr_b = _micro_trainer(tmp_path, dict(ema_base, placement="host_cadence"))
    assert tr_b._ema_decay_fn is not None and tr_b._step_fn is not None
    tr_a.fit()
    tr_b.fit()
    for a, b in zip(jax.tree.leaves(tr_a.state.params),
                    jax.tree.leaves(tr_b.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tr_a.state.ema_params),
                    jax.tree.leaves(tr_b.state.ema_params)):
        assert b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6)


def test_ema_placement_host_cadence_interval_and_start(tmp_path):
    """host_cadence with interval k and a late start: mirrors at interval
    cadence pre-start, decays at interval cadence post-start, both against
    post-update params - verified against a manual reconstruction."""
    ema = {"smoothing": 0.9, "ema_start": 2, "update_interval": 2,
           "placement": "host_cadence"}
    tr = _micro_trainer(tmp_path, ema, n_batches=6)
    rng = jax.random.PRNGKey(tr.seed)
    params_hist = []
    for step, batch in enumerate(tr.train_loader):
        batch = tr._stage_batch(batch)
        tr.state, _ = tr._train_one_batch(batch, rng)
        tr._maybe_host_ema(step)
        params_hist.append(jax.tree.map(np.asarray, tr.state.params))

    ema_ref = None
    for step, p in enumerate(params_hist):
        if step % 2 != 0:
            continue
        if step < 2:
            ema_ref = p  # mirror
        else:
            ema_ref = jax.tree.map(
                lambda e, q: 0.9 * e + 0.1 * q, ema_ref, p)
    for got, want in zip(jax.tree.leaves(tr.state.ema_params),
                         jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)


def test_ema_placement_hostcompute_trainer(tmp_path):
    """EMA placement 'hostcompute' through the Trainer: chunks created at the
    first post-start update (mirror via the bf16 wire), decayed per interval
    against post-update params, materialized for eval_params() and saved into
    the checkpoint; resume rebuilds the chunks. CPU runs offload=False (the
    identical math without the pinned-host annotation - train_step docs)."""
    ema = {"smoothing": 0.9, "ema_start": 0, "update_interval": 1,
           "placement": "hostcompute"}
    sf = str(tmp_path / "hc_ckpts")
    tr = _micro_trainer(tmp_path, ema, n_batches=3, save_folder=sf)
    assert tr.state.ema_params is None  # EMA lives off-state
    rng = jax.random.PRNGKey(tr.seed)
    params_hist = []
    for step, batch in enumerate(tr.train_loader):
        batch = tr._stage_batch(batch)
        tr.state, _ = tr._train_one_batch(batch, rng)
        tr._maybe_host_ema(step)
        tr._py_step = step + 1
        params_hist.append(jax.tree.map(np.asarray, tr.state.params))
    assert tr._hc_ema is not None

    def bf16(t):
        return jax.tree.map(
            lambda p: np.asarray(jnp.asarray(p, jnp.bfloat16), np.float32), t)

    ema_ref = bf16(params_hist[0])  # init rides the bf16 wire
    for p in params_hist[1:]:
        ema_ref = jax.tree.map(lambda e, q: 0.9 * e + 0.1 * q,
                               ema_ref, bf16(p))
    got = tr.eval_params()
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)

    # checkpoint carries the materialized EMA; resume rebuilds the chunks
    # (restore rides the bf16 wire: the SAVED values re-round to bf16 - the
    # reference tree is bf16(got), not bf16(ema_ref): got and ema_ref differ
    # by fp32 ulps that can round to different bf16 values)
    saved = jax.tree.map(np.asarray, got)
    tr.save()
    tr2 = _micro_trainer(tmp_path, ema, n_batches=3, save_folder=sf)
    tr2.load_orbax_step(tr2._ckpt_mgr.latest_step())
    assert tr2._hc_ema is not None
    assert tr2.global_step == 3  # post-init load refreshes the host step
    for g, w in zip(jax.tree.leaves(tr2.eval_params()),
                    jax.tree.leaves(bf16(saved))):
        np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)


def test_bench_partial_emission_protocol(monkeypatch, capsys):
    """Driver-survivability (round-5): bench.main() prints a valid partial
    JSON line after every completed stage (weighted over measured stages,
    flagged partial with the coverage in the metric name) and the final line
    unflagged - so a driver timeout mid-ladder still yields the weighted
    metric over what ran (BENCH_r04.json lost everything to rc=124)."""
    import json
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import bench

    def fake_stage(name, latent_res, mask_ratio, ladder, timed_steps,
                   use_ema=True):
        rate = {"res256_mask75": 230.0, "res256_mask0": 105.0,
                "res512_mask75": 69.0, "res512_mask0": 24.0}[name]
        if not use_ema:  # pre-EMA phase leg of res512_mask75
            rate += 1.0
        return rate, rate, 8, "attn_moe", "onehot", "test", "fp32"

    monkeypatch.setattr(bench, "bench_stage", fake_stage)
    monkeypatch.setattr(bench, "bench_sampling", lambda timed_runs=3: {})
    monkeypatch.setenv("MDT_BENCH_SAMPLING", "0")
    monkeypatch.delenv("MDT_BENCH_QUICK", raising=False)
    monkeypatch.delenv("MDT_BENCH_STAGES", raising=False)
    bench.main()

    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    parsed = [json.loads(l) for l in lines]
    assert len(parsed) == 4  # 3 partials + 1 final
    for i, p in enumerate(parsed[:-1]):
        assert p["partial"] is True
        assert f"PARTIAL: {i + 1}/4" in p["metric"]
        assert len(p["detail"]) == i + 1
        assert p["value"] > 0 and p["vs_baseline"] > 0
    final = parsed[-1]
    assert "partial" not in final
    assert "PARTIAL" not in final["metric"]
    assert len(final["detail"]) == 4
    # weighted harmonic over the 4 canned stages with the schedule weights
    weights = {n: s for n, _, _, s, _ in bench.STAGES}
    # res512_mask75 combines pre-EMA (70.0 at frac 0.5) and EMA (69.0) phases
    combined = 1.0 / (0.5 / 70.0 + 0.5 / 69.0)
    rates = {"res256_mask75": 230.0, "res256_mask0": 105.0,
             "res512_mask75": combined, "res512_mask0": 24.0}
    tot_img = sum(weights[n] * 2048 for n in rates)
    tot_t = sum(weights[n] * 2048 / rates[n] for n in rates)
    np.testing.assert_allclose(final["value"], tot_img / tot_t, rtol=1e-2)


def test_bench_budget_ladder_trimming(monkeypatch, capsys):
    """MDT_BENCH_BUDGET_S trimming: with the wall budget nearly spent, each
    remaining stage gets only its lead rung (a cold fallback walk cannot
    finish - the round-4 timeout failure mode)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import bench

    seen = {}

    def fake_stage(name, latent_res, mask_ratio, ladder, timed_steps,
                   use_ema=True):
        key = name if use_ema else f"{name}-preema"
        seen[key] = len(ladder)
        return 100.0, 100.0, 8, "attn_moe", "onehot", "test", "fp32"

    monkeypatch.setattr(bench, "bench_stage", fake_stage)
    monkeypatch.setenv("MDT_BENCH_SAMPLING", "0")
    monkeypatch.delenv("MDT_BENCH_QUICK", raising=False)
    monkeypatch.delenv("MDT_BENCH_STAGES", raising=False)
    # budget already "spent" at t_start: remaining() < 18% from the first
    # stage on -> every ladder trims to its lead rung
    monkeypatch.setenv("MDT_BENCH_BUDGET_S", "0.000001")
    bench.main()
    capsys.readouterr()
    full = {name: len(ladder) for name, _, _, _, ladder in bench.STAGES}
    for name, n in seen.items():
        assert n == 1, (name, n)
        base = name.replace("-preema", "")
        assert full[base] > 1  # the trim actually dropped rungs

    # generous budget: full ladders reach bench_stage untrimmed
    seen.clear()
    monkeypatch.setenv("MDT_BENCH_BUDGET_S", "1000000")
    bench.main()
    capsys.readouterr()
    for name, _, _, _, ladder in bench.STAGES:
        assert seen[name] == len(ladder), name


def test_sharded_train_step_8_devices():
    """Full train step jitted over a (data=2, fsdp=2, tensor=2) mesh: dp grad sync,
    ZeRO-2 opt-state sharding, and expert-parallel MoE tensors."""
    assert jax.device_count() == 8
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    # depth 4 so blocks_1 is an MoE block (every 2nd, not last)
    dit = DiT(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(1.0,),
        ffn_multipliers=(2.0,), use_patch_mixer=True, patch_mixer_depth=1,
        patch_mixer_dim=48, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    model = LatentDiffusion(dit=dit, latent_res=16, train_mask_ratio=0.75,
                            latent_scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 1000, 0.0)
    tx = build_optimizer(params, sched, clip_norm=0.25)

    p_sh = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, p_sh)
    state = create_train_state(params, tx)
    o_sh = opt_state_shardings(state.opt_state, mesh)
    state = state.replace(
        opt_state=jax.tree.map(jax.device_put, state.opt_state, o_sh)
    )
    state_sh = TrainState(
        step=NamedSharding(mesh, P()), params=p_sh, opt_state=o_sh, ema_params=None
    )

    b_sh = batch_sharding(mesh)
    batch = jax.tree.map(lambda x: jax.device_put(x, b_sh), make_batch(8))

    step = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=4),
        in_shardings=(state_sh, b_sh, None),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    rng = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # expert tensors are sharded over the tensor axis
    moe_w1 = state.params["params"]["blocks_1"]["mlp"]["w1"]
    assert moe_w1.sharding.spec == P("tensor", None, None)
    # a second step runs after donation
    batch = jax.tree.map(lambda x: jax.device_put(x, b_sh), make_batch(8))
    state, metrics = step(state, batch, rng)
    assert int(state.step) == 2


def test_grad_shardings_zero2_matches_replicated():
    """make_train_step(grad_shardings=...) pins the microbatch grad accumulator
    to the ZeRO-2 shard layout (reduce-scatter instead of all-reduce, true
    FSDP SHARD_GRAD_OP semantics). The numerics must be identical to the
    replicated-accumulator step."""
    assert jax.device_count() == 8
    from micro_diffusion_tpu.parallel.sharding import opt_state_spec

    mesh = make_mesh(data=2, fsdp=4, tensor=1)
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 1000, 0.0)
    tx = build_optimizer(params, sched, clip_norm=0.25)
    p_sh = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, p_sh)
    batch = make_batch(8)
    rng = jax.random.PRNGKey(3)

    state_a = create_train_state(params, tx)
    plain = jax.jit(make_train_step(model, tx, sched, microbatch_size=4))
    state_a, metrics_a = plain(state_a, batch, rng)

    grad_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, opt_state_spec(l, mesh)), params
    )
    state_b = create_train_state(params, tx)
    zero2 = jax.jit(make_train_step(model, tx, sched, microbatch_size=4,
                                    grad_shardings=grad_sh))
    state_b, metrics_b = zero2(state_b, batch, rng)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics_a["grad_norm"]), float(metrics_b["grad_norm"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_dispatch_accumulation_matches_fused():
    """Split-dispatch accumulation under the (data=2, fsdp=2, tensor=2) mesh:
    the grad/apply jits inherit shardings from the committed state, and one
    K=2 cycle matches the fused scan step's loss and params - dispatch mode
    is the compile-robust path on multi-chip too, so prove it there."""
    assert jax.device_count() == 8
    from micro_diffusion_tpu.train import (
        make_apply_step,
        make_grad_step,
        zero_grad_accumulator,
    )

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.5)
    p_sh = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, p_sh)
    batch = make_batch(8)
    base_rng = jax.random.PRNGKey(7)

    # fused scan step, sharded
    state_a = create_train_state(params, tx)
    fused = jax.jit(make_train_step(model, tx, sched, microbatch_size=4))
    state_a, metrics_a = fused(state_a, batch, base_rng)

    # dispatch cycle on the same sharded params
    state_b = create_train_state(params, tx)
    grad_step = jax.jit(make_grad_step(model))
    apply_step = jax.jit(make_apply_step(tx, sched), static_argnums=(2,))
    zero_fn = jax.jit(lambda p: zero_grad_accumulator(p))
    rng = jax.random.fold_in(base_rng, state_b.step)
    acc = zero_fn(state_b.params)
    for idx in range(2):
        mb = jax.tree.map(lambda x: x[idx * 4 : (idx + 1) * 4], batch)
        acc = grad_step(state_b.params, acc, mb, rng, idx)
    state_b, metrics_b = apply_step(state_b, acc, 2)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_step():
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    ev = jax.jit(make_eval_step(model))
    loss = ev(params, make_batch(4), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_multislice_mesh():
    """Hybrid DCN x ICI mesh: 2 'slices' x 4 chips, fsdp inside the slice."""
    from micro_diffusion_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(dcn_data=2, fsdp=2, tensor=1)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "tensor": 1}
    assert mesh.devices.size == 8


def test_single_batch_overfit():
    """Learning-dynamics sanity: the full train step must drive a fixed-rng eval loss
    down on a single repeated batch (catches broken grads/optimizer wiring; verified
    on TPU: 1.09 -> 0.38 over 600 steps)."""
    from micro_diffusion_tpu.models.dit import MicroDiT_Micro_2
    from micro_diffusion_tpu.train.optim import constant_with_warmup

    dit = MicroDiT_Micro_2(caption_channels=64, dtype=jnp.float32)
    model = LatentDiffusion(dit=dit, latent_res=32, train_mask_ratio=0.0,
                            latent_scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_with_warmup(1e-3, 20)
    tx = build_optimizer(params, sched, clip_norm=1.0)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx, sched), donate_argnums=(0,))
    ev = jax.jit(make_eval_step(model))
    batch = {
        "image_latents": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32, 32)),
        "caption_latents": jax.random.normal(jax.random.PRNGKey(2), (8, 1, 8, 64)),
        "drop_caption_mask": jnp.ones((8,)),
    }
    rng = jax.random.PRNGKey(7)
    eval_rng = jax.random.PRNGKey(99)
    loss0 = float(ev(state.params, batch, eval_rng))
    for _ in range(200):
        state, _ = step(state, batch, rng)
    loss1 = float(ev(state.params, batch, eval_rng))
    assert loss1 < 0.92 * loss0, (loss0, loss1)


def test_low_precision_adam_matches_fp32():
    """bf16-moment Adam must track fp32 optax.adamw closely over a few steps."""
    import optax
    from micro_diffusion_tpu.train.optim import scale_by_adam_low_precision

    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8)}
    tx_ref = optax.scale_by_adam()
    tx_lp = scale_by_adam_low_precision()
    s_ref, s_lp = tx_ref.init(params), tx_lp.init(params)
    p_ref = p_lp = params
    for i in range(10):
        g = {"w": jnp.sin(jnp.arange(64.0) + i).reshape(8, 8) * 0.1}
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        u_lp, s_lp = tx_lp.update(g, s_lp, p_lp)
        p_ref = optax.apply_updates(p_ref, jax.tree.map(lambda u: -1e-3 * u, u_ref))
        p_lp = optax.apply_updates(p_lp, jax.tree.map(lambda u: -1e-3 * u, u_lp))
    np.testing.assert_allclose(
        np.asarray(p_lp["w"]), np.asarray(p_ref["w"]), rtol=2e-3, atol=2e-5
    )


def test_build_optimizer_low_precision_moments():
    model = micro_model(train_mask_ratio=0.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 100, 0.0)
    tx = build_optimizer(params, sched, clip_norm=0.25, low_precision_moments=True)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx, sched), donate_argnums=(0,))
    state, m = step(state, make_batch(8), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # both moments stored in bf16
    mus = [l for l in jax.tree.leaves(state.opt_state) if l.dtype == jnp.bfloat16]
    assert len(mus) > 0


def test_bf16_grad_accumulation_close_to_fp32():
    """bf16 accumulator storage (the single-chip XL configuration - the fp32
    params-sized carry does not fit next to fp32 params + moments on 16GB) must
    track fp32 accumulation within bf16 rounding: same rng path, same microbatch
    split, only the running-sum dtype differs; the mean/clip/update math is fp32
    in both."""
    model = micro_model(train_mask_ratio=0.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = cosine_with_warmup(1e-3, 10, 1000, 0.0)
    tx = build_optimizer(params, sched)
    batch = make_batch(8)
    rng = jax.random.PRNGKey(7)

    outs = {}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        state = create_train_state(params, tx)
        step = jax.jit(
            make_train_step(model, tx, sched, microbatch_size=2, accum_dtype=dt)
        )
        new_state, metrics = step(state, batch, rng)
        outs[name] = (new_state, metrics)

    m32, m16 = outs["fp32"][1], outs["bf16"][1]
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=1e-5)
    # grad norm: bf16 sum of 4 microbatch grads -> ~2^-8 relative rounding
    np.testing.assert_allclose(
        float(m16["grad_norm"]), float(m32["grad_norm"]), rtol=2e-2
    )
    p32 = jax.tree.leaves(outs["fp32"][0].params)
    p16 = jax.tree.leaves(outs["bf16"][0].params)
    for a, b in zip(p32, p16):
        # AdamW normalizes grads by sqrt(v): parameter updates are O(lr), so the
        # bf16 rounding of the accumulator perturbs params by <<lr per step
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=0
        )


def test_param_flow_bf16_trajectory_close_to_fp32():
    """param_flow_dtype=bf16 (one master->bf16 cast per step outside the remat
    regions, bf16 parameter cotangents, fp32 update math) must track the
    reference-parity fp32 flow within bf16 rounding over several steps. The
    micro model computes in fp32, so this test over-counts the deviation the
    real (bf16-compute) model would see - every matmul input is bf16-rounded
    here instead of only the cast points."""
    model = micro_model(train_mask_ratio=0.0)
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.25)
    batch = make_batch(8)
    rng = jax.random.PRNGKey(7)

    outs = {}
    for name, flow in (("fp32", None), ("bf16", jnp.bfloat16)):
        state = create_train_state(params, tx)
        step = jax.jit(
            make_train_step(model, tx, sched, microbatch_size=4,
                            param_flow_dtype=flow)
        )
        for _ in range(3):
            state, metrics = step(state, batch, rng)
        outs[name] = (state, metrics)

    m32, m16 = outs["fp32"][1], outs["bf16"][1]
    assert np.isfinite(float(m16["loss"]))
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]), rtol=2e-2)
    np.testing.assert_allclose(
        float(m16["grad_norm"]), float(m32["grad_norm"]), rtol=5e-2
    )
    # master params stay fp32 (the cast is on the flow INTO the loss only)
    for leaf in jax.tree.leaves(outs["bf16"][0].params):
        assert leaf.dtype == jnp.float32
    p32 = jax.tree.leaves(outs["fp32"][0].params)
    p16 = jax.tree.leaves(outs["bf16"][0].params)
    drift_sq = upd_sq = 0.0
    for a0, a, b in zip(jax.tree.leaves(params), p32, p16):
        # Per-element: bounded by the 3-step update budget (|Adam update| <=
        # lr after normalization, so <= 3e-3 either side; a noise-level
        # gradient element may flip its normalized direction entirely -
        # measured worst here is 3.1e-3). The aggregate ratio below is the
        # real equivalence guarantee.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=0)
        drift_sq += float(jnp.sum((b - a) ** 2))
        upd_sq += float(jnp.sum((a - a0) ** 2))
    # aggregate: the bf16-flow trajectory deviates from the fp32-flow one by
    # well under the distance either trajectory actually moved (measured 0.105)
    assert drift_sq**0.5 < 0.25 * upd_sq**0.5, (drift_sq**0.5, upd_sq**0.5)


def test_param_flow_dispatch_matches_scan():
    """Split-dispatch accumulation with param_flow_dtype=bf16 must reproduce the
    fused scan step with the same flow dtype exactly (same cast point, same
    accumulation order, same fp32 apply math)."""
    from micro_diffusion_tpu.train import (
        make_apply_step,
        make_grad_step,
        zero_grad_accumulator,
    )

    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    sched = constant_schedule(1e-3)
    tx = build_optimizer(params, sched, clip_norm=0.5)
    batch = make_batch(8)
    base_rng = jax.random.PRNGKey(7)

    state_a = create_train_state(params, tx)
    fused = jax.jit(make_train_step(model, tx, sched, microbatch_size=4,
                                    param_flow_dtype=jnp.bfloat16))
    state_a, metrics_a = fused(state_a, batch, base_rng)

    state_b = create_train_state(params, tx)
    grad_step = jax.jit(make_grad_step(model, param_flow_dtype=jnp.bfloat16),
                        donate_argnums=(1,))
    apply_step = jax.jit(make_apply_step(tx, sched), static_argnums=(2,))
    rng = jax.random.fold_in(base_rng, state_b.step)
    acc = zero_grad_accumulator(params)
    for idx in range(2):
        mb = jax.tree.map(lambda x: x[idx * 4 : (idx + 1) * 4], batch)
        acc = grad_step(state_b.params, acc, mb, rng, idx)
    state_b, metrics_b = apply_step(state_b, acc, 2)

    np.testing.assert_allclose(
        float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
