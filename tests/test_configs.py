"""Recipe configs are the tuned configs (VERDICT round-2 next-round #4/#9).

The reference's yaml files ARE its tuned configs; these tests pin that property
for ours: every perf knob (remat policy, microbatch, MoE dispatch, bf16
moments, shuffle algo) is a first-class yaml key consumed by the real
entrypoint plumbing - no env vars."""

import os

import numpy as np
import pytest

from micro_diffusion_tpu.train.config import instantiate, load_config

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs")
STAGES = ["res_256_pretrain", "res_256_finetune", "res_512_pretrain",
          "res_512_finetune"]


@pytest.mark.parametrize("stage", STAGES)
def test_base_recipes_carry_the_tpu_knobs(stage):
    cfg = load_config(CONFIGS, stage)
    assert cfg["model"]["moe_dispatch"] in (
        "hybrid", "onehot", "onehot_dots", "unroll", "batched", "scan", "gather"
    )
    # 7TB-scale recipes must NOT silently fall back to full permutation
    assert cfg["dataset"]["train"]["shuffle_algo"] == "block"
    assert cfg["dataset"]["eval"].get("shuffle_algo", "full") == "full"


@pytest.mark.parametrize("stage", STAGES)
def test_single_chip_overlays_are_complete(stage):
    cfg = load_config(os.path.join(CONFIGS, "tpu_v5e_1chip"), stage)
    # tuned knobs all present and reference hyperparameters inherited
    assert cfg["optimizer"]["low_precision_moments"] is True
    # '_alean' is a suffix modifier (recompute attention projections +
    # cross-attention in the backward) stackable on any base policy
    policy = cfg["model"]["remat_policy"]
    if policy.endswith("_alean"):
        policy = policy[: -len("_alean")]
    assert policy in (
        "full", "dots", "attn_moe", "dots_attn_moe", "dots_attn_moe_lean",
        "dots_attn_moe_xlean",
    )
    mb = int(cfg["trainer"]["device_train_microbatch_size"])
    assert 1 <= mb <= 256
    # single-chip recipe semantics (round-4 measured winners, PERF.md §1/§2):
    # the 256px stages and stage 3 accumulate the per-rank batch 256 with
    # split-dispatch into a bf16 accumulator (the fp32 carry does not fit one
    # 16GB chip) - stage 3 at mb16 where the accumulator + in-state bf16 EMA
    # coexist (69.37 img/s true recipe cadence); stage 4 runs batch ==
    # microbatch with host-cadence EMA (every accumulation variant loses with
    # the EMA resident - the measured 23.9 img/s lead).
    batch = int(cfg["dataset"]["train_batch_size"])
    ema = (cfg.get("algorithms") or {}).get("ema")
    if batch != mb:
        assert batch % mb == 0 and batch // mb >= 2
        assert cfg["trainer"]["accum_mode"] == "dispatch"
        assert cfg["trainer"]["grad_accum_dtype"] == "bfloat16"
    if stage == "res_512_pretrain":
        assert batch == 256 and mb == 16  # TRUE recipe cadence, round-4 win
        assert ema["dtype"] == "bfloat16"
        assert ema.get("placement", "in_state") == "in_state"
    elif stage == "res_512_finetune":
        # K=1 + hostcompute EMA: 23.50 img/s measured through train.py with
        # ~2.3GB headroom (host_cadence's resident-EMA lead is service-epoch
        # fragile at its <100MB margin - overlay comment)
        assert batch == mb == 8
        assert ema["placement"] == "hostcompute"
        # one EMA per 256 per-rank images = the reference's per-update cadence
        assert int(str(ema["update_interval"]).rstrip("ba")) * mb == 256
    else:
        assert ema is None  # 256px stages have no EMA (reference parity)
    assert cfg["seed"] == 18

    # the model block instantiates through the real factory (kwargs accepted)
    model_cfg = dict(cfg["model"])
    model = instantiate(model_cfg)
    assert model.dit.remat_policy == cfg["model"]["remat_policy"]
    assert model.dit.moe_dispatch == cfg["model"]["moe_dispatch"]


def test_optimizer_block_reaches_build_optimizer():
    """Trainer wires optimizer.low_precision_moments/mu_dtype through (round-2
    ADVICE finding: the benched bf16-moments configs were unreachable from
    train.py)."""
    import jax
    import jax.numpy as jnp

    from micro_diffusion_tpu.train.optim import build_optimizer, constant_schedule

    params = {"dense": {"kernel": jnp.ones((4, 4))}}
    tx = build_optimizer(
        params, constant_schedule(1e-4), clip_norm=0.25,
        low_precision_moments=True,
    )
    state = tx.init(params)
    leaves = jax.tree.leaves(
        state, is_leaf=lambda x: hasattr(x, "dtype") and hasattr(x, "shape")
    )
    moment_dtypes = {l.dtype for l in leaves if getattr(l, "shape", ()) == (4, 4)}
    assert jnp.dtype(jnp.bfloat16) in moment_dtypes

    # and the yaml path: Trainer.__init__ reads these keys (source-level pin)
    import inspect

    from micro_diffusion_tpu.train import trainer as trainer_mod

    src = inspect.getsource(trainer_mod.Trainer.__init__)
    assert "low_precision_moments" in src and "mu_dtype" in src


def test_block_shuffle_reaches_the_loader(tmp_path):
    """configs/base.yaml dataset.train block -> loader.shuffle_algo == 'block'
    through the same instantiate(...) call train.py makes."""
    from test_datasets import write_latents_dataset

    datadir = str(tmp_path / "mds")
    write_latents_dataset(datadir, n=16)

    cfg = load_config(CONFIGS, "res_256_pretrain")
    train_block = dict(cfg["dataset"]["train"])
    train_block["datadir"] = datadir
    loader = instantiate(
        train_block, image_size=256, batch_size=4, cap_seq_size=8,
        cap_emb_dim=16, cap_drop_prob=0.0, seed=18, process_index=0,
        process_count=1,
    )
    assert loader.shuffle_algo == "block"
