"""CLI: convert a reference torch checkpoint (.pt) into an orbax/npz params file, or
validate that it loads into a given model architecture.

    python -m micro_diffusion_tpu.models.convert_checkpoint \
        --checkpoint MicroDiT_XL_2.pt --dit_arch MicroDiT_XL_2 --out params.npz

The released HF checkpoints (VSehwag24/MicroDiT, reference README.md:55-61) are plain
``dit.state_dict()`` files; Composer trainer checkpoints (state/model nesting) are also
accepted (models/interop.py handles both).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dit_arch", default="MicroDiT_XL_2")
    p.add_argument("--latent_res", type=int, default=32)
    p.add_argument("--in_channels", type=int, default=4)
    p.add_argument("--caption_channels", type=int, default=1024)
    p.add_argument("--out", default=None, help="write converted params (.npz)")
    p.add_argument("--validate", action="store_true",
                   help="check structure/shapes against the target architecture")
    args = p.parse_args(argv)

    from . import dit as model_zoo
    from .interop import load_torch_checkpoint, validate_params_match

    converted = load_torch_checkpoint(args.checkpoint)
    leaves = jax.tree.leaves(converted)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"loaded {len(leaves)} tensors, {n_params / 1e6:.1f}M params")

    if args.validate:
        model = getattr(model_zoo, args.dit_arch)(
            input_size=args.latent_res,
            in_channels=args.in_channels,
            caption_channels=args.caption_channels,
        )
        template = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0)},
                jnp.zeros((1, args.in_channels, args.latent_res, args.latent_res)),
                jnp.zeros((1,)),
                jnp.zeros((1, 1, 77, args.caption_channels)),
            )
        )
        validate_params_match(converted, template)
        print(f"structure matches {args.dit_arch} exactly")

    if args.out:
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        np.savez(args.out, **flat)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
