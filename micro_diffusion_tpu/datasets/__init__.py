from .mds import MDSReader, MDSWriter, merge_index
from .latents_loader import StreamingLatentsDataset, build_streaming_latents_dataloader

__all__ = [
    "MDSReader",
    "MDSWriter",
    "merge_index",
    "StreamingLatentsDataset",
    "build_streaming_latents_dataloader",
]
