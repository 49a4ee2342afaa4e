"""Latent precompute: image MDS shards -> fp16 latent MDS shards, on TPU.

Equivalent of the reference's accelerate-launched multi-GPU precompute jobs
(prepare/*/precompute.py:102-248): per-process disjoint dataset slice, VAE-encode at
256 AND 512 (scaled by the VAE scaling factor), text-encode tokenized captions, write
fp16 bytes per sample into a per-process MDS subdir, then merge indexes on process 0.

Output columns: {caption, caption_latents, latents_256, latents_512} (+ jpg when
--save_images), matching the reference writer schema (jdb/precompute.py:159-166) and
consumed by datasets/latents_loader.py.

CLI:
    python -m micro_diffusion_tpu.datasets.prepare.precompute \
        --datadir <image-mds-dir> --savedir <latents-dir> \
        --vae stabilityai/stable-diffusion-xl-base-1.0 --vae_weights_dir ... \
        --text_encoder openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378 \
        --text_encoder_weights_dir ... --tokenizer_dir ... --batch_size 32
"""

import argparse
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..mds import MDSWriter, merge_index
from ..captions import CaptionProcessor
from .common import PrecomputeImageDataset
from .specs import DATASETS


def batched(it: Iterator[Dict], batch_size: int) -> Iterator[List[Dict]]:
    buf: List[Dict] = []
    for item in it:
        buf.append(item)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def precompute(
    datadir: List[str],
    savedir: str,
    vae,
    text_encoder,
    tokenizer,
    batch_size: int = 32,
    resize_sizes=(256, 512),
    caption_key: str = "caption",
    clean_captions: bool = False,
    save_images: bool = False,
    save_dtype: str = "float16",
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    seed: int = 0,
) -> int:
    """Run the precompute loop for this process's slice. Returns samples written."""
    import jax
    import jax.numpy as jnp

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()

    ds = PrecomputeImageDataset(
        datadir,
        resize_sizes=resize_sizes,
        caption_key=caption_key,
        caption_processor=CaptionProcessor() if clean_captions else None,
    )
    out_dtype = {"float16": np.float16, "float32": np.float32,
                 "bfloat16": np.float16}[save_dtype]

    # Output columns are ALWAYS the canonical caption/caption_latents names regardless
    # of the source caption key (e.g. sa1b's caption_syn_pixart_llava15) - the training
    # loader reads 'caption_latents' (reference precompute writes the canonical name
    # too, sa1b/precompute.py output columns).
    columns = {
        "caption": "str",
        "caption_latents": "bytes",
        **{f"latents_{s}": "bytes" for s in resize_sizes},
    }
    if save_images:
        columns["jpg"] = "jpeg"

    rank_dir = os.path.join(savedir, str(process_index))
    writer = MDSWriter(out=rank_dir, columns=columns, size_limit=256 * (1 << 20))
    rng = jax.random.PRNGKey(seed + process_index)

    n = 0
    for bi, batch in enumerate(batched(ds.iter_slice(process_index, process_count),
                                       batch_size)):
        try:
            n += _encode_and_write(
                batch, bi, tokenizer, text_encoder, vae, resize_sizes,
                out_dtype, save_images, writer, rng,
            )
        except Exception as e:  # fail-soft per batch (reference precompute.py:232-233)
            print(f"[precompute] skipping batch {bi}: {e}")
    writer.finish()

    # barrier + index merge (reference precompute.py:238-248)
    if process_count > 1:
        import jax.experimental.multihost_utils as mhu

        mhu.sync_global_devices("precompute_done")
    if process_index == 0:
        merge_index(savedir)
    return n


def _encode_and_write(batch, bi, tokenizer, text_encoder, vae, resize_sizes,
                      out_dtype, save_images, writer, rng):
    import jax

    captions = [b["caption"] for b in batch]
    tok = tokenizer.tokenize(captions)
    cond, _ = text_encoder.encode(
        tok["input_ids"], attention_mask=tok.get("attention_mask")
    )
    cond = np.asarray(cond, np.float32).astype(out_dtype)

    latents = {}
    for size in resize_sizes:
        imgs = np.stack([b[f"image_{size}"] for b in batch])  # (B,3,S,S) [-1,1]
        z = vae.encode(imgs, rng=jax.random.fold_in(rng, bi * 10 + size))
        latents[size] = (
            np.asarray(z, np.float32) * vae.scaling_factor
        ).astype(out_dtype)

    written = 0
    for i, b in enumerate(batch):
        sample = {
            "caption": captions[i],
            "caption_latents": cond[i].reshape(-1).tobytes(),
            **{f"latents_{s}": latents[s][i].tobytes() for s in resize_sizes},
        }
        if save_images:
            sample["jpg"] = b["sample"]["jpg"]
        writer.write(sample)
        written += 1
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default=None, choices=sorted(DATASETS) + [None])
    p.add_argument("--datadir", nargs="+", required=True)
    p.add_argument("--savedir", required=True)
    p.add_argument("--vae", default="stabilityai/stable-diffusion-xl-base-1.0")
    p.add_argument("--vae_weights_dir", required=True)
    p.add_argument(
        "--text_encoder", default="openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378"
    )
    p.add_argument("--text_encoder_weights_dir", required=True)
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--model_dtype", default="bfloat16")
    p.add_argument("--save_dtype", default="float16")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--image_resolutions", type=int, nargs="+", default=[256, 512])
    args = p.parse_args(argv)

    from ...models.text_encoders import UniversalTextEncoder, UniversalTokenizer
    from ...models.vae import AutoencoderKL

    vae = AutoencoderKL.from_pretrained(args.vae, weights_dir=args.vae_weights_dir)
    text_encoder = UniversalTextEncoder(
        args.text_encoder, dtype=args.model_dtype,
        weights_dir=args.text_encoder_weights_dir,
    )
    tokenizer = UniversalTokenizer(args.text_encoder, tokenizer_dir=args.tokenizer_dir)

    spec = DATASETS.get(args.dataset) if args.dataset else None
    n = precompute(
        args.datadir,
        args.savedir,
        vae,
        text_encoder,
        tokenizer,
        batch_size=args.batch_size,
        resize_sizes=tuple(args.image_resolutions),
        caption_key=spec.caption_key if spec else "caption",
        clean_captions=spec.clean_captions if spec else False,
        save_images=args.save_images,
        save_dtype=args.save_dtype,
    )
    print(f"precomputed {n} samples -> {args.savedir}")


if __name__ == "__main__":
    main()
