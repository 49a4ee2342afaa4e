"""Train-time streaming loader for precomputed latents.

Capability parity with the reference latents_loader.py:8-108 (mosaicml-streaming based),
rebuilt TPU-host-first:
  * multi-dataset mixing: one MDS stream per datadir, concatenated into one global
    sample space (reference latents_loader.py:88)
  * per-sample fields: fp16 'caption_latents' -> (1, cap_seq, cap_dim), fp16
    'latents_256'/'latents_512' chosen by image_size (latents_loader.py:52-67)
  * per-sample Bernoulli caption drop for CFG training (latents_loader.py:49-51) -
    drawn from a deterministic per-(seed, epoch, index) RNG rather than torch's global
    RNG, so runs are reproducible and resumable
  * deterministic global shuffle per epoch + per-host batch partitioning: step g of the
    global schedule consumes perm[g*B : (g+1)*B]; host h takes its contiguous slice, so
    any world size yields the same global batch sequence (streaming's rank partitioning
    equivalent, without the shared-memory machinery)
  * resumable: state_dict()/load_state_dict() capture (epoch, sample offset)
  * background-thread prefetch of assembled numpy batches (host->device transfer overlap
    is the trainer's job)
"""

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Union

import numpy as np

from .mds import MDSReader


class StreamingLatentsDataset:
    """Random-access view over one or more MDS latent datasets."""

    def __init__(
        self,
        datadirs: List[str],
        image_size: int,
        cap_seq_size: int,
        cap_emb_dim: int,
        cap_drop_prob: float = 0.0,
        seed: int = 18,
    ):
        self.readers = [MDSReader(d) for d in datadirs]
        self._cum = np.cumsum([0] + [len(r) for r in self.readers])
        self.image_size = image_size
        self.cap_seq_size = cap_seq_size
        self.cap_emb_dim = cap_emb_dim
        self.cap_drop_prob = cap_drop_prob
        self.seed = seed
        self.latents_key = f"latents_{image_size}"
        self.latent_res = image_size // 8

    def __len__(self) -> int:
        return int(self._cum[-1])

    def get(self, index: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        stream = int(np.searchsorted(self._cum, index, side="right")) - 1
        sample = self.readers[stream][index - int(self._cum[stream])]
        return self._postprocess(sample, index, epoch)

    def get_batch(self, indices, epoch: int = 0):
        """Batched fetch: per-stream byte ranges gathered by the native parallel-pread
        core (datasets/native.py) when available."""
        streams = np.searchsorted(self._cum, indices, side="right") - 1
        out = [None] * len(indices)
        order = np.argsort(streams, kind="stable")
        pos = 0
        while pos < len(order):
            s = int(streams[order[pos]])
            end = pos
            while end < len(order) and int(streams[order[end]]) == s:
                end += 1
            group = order[pos:end]
            locals_ = [int(indices[g]) - int(self._cum[s]) for g in group]
            samples = self.readers[s].read_many(locals_)
            for g, sample in zip(group, samples):
                out[int(g)] = self._postprocess(sample, int(indices[g]), epoch)
            pos = end
        return out

    def _postprocess(self, sample, index: int, epoch: int) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}

        if self.cap_drop_prob > 0:
            rng = np.random.default_rng((self.seed, epoch, index))
            drop = rng.random() < self.cap_drop_prob
        else:
            drop = False
        out["drop_caption_mask"] = np.float32(0.0 if drop else 1.0)

        out["caption_latents"] = (
            np.frombuffer(sample["caption_latents"], dtype=np.float16)
            .reshape(1, self.cap_seq_size, self.cap_emb_dim)
            .copy()
        )
        if self.latents_key in sample:
            out["image_latents"] = (
                np.frombuffer(sample[self.latents_key], dtype=np.float16)
                .reshape(-1, self.latent_res, self.latent_res)
                .copy()
            )
        return out


class LatentsDataLoader:
    """Deterministic, resumable, per-host-partitioned batch iterator."""

    def __init__(
        self,
        dataset: StreamingLatentsDataset,
        batch_size: int,
        global_batch_size: Optional[int] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 18,
        process_index: int = 0,
        process_count: int = 1,
        prefetch_factor: int = 2,
        num_epochs: Optional[int] = None,
        shuffle_algo: str = "full",
        shuffle_block_size: int = 1 << 18,
        **_: Any,
    ):
        self.dataset = dataset
        self.batch_size = batch_size  # per-host batch
        self.global_batch_size = global_batch_size or batch_size * process_count
        assert self.global_batch_size % process_count == 0
        assert self.batch_size == self.global_batch_size // process_count
        self.shuffle = shuffle
        assert shuffle_algo in ("full", "block"), shuffle_algo
        self.shuffle_algo = shuffle_algo
        self.shuffle_block_size = shuffle_block_size
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch_factor = max(1, prefetch_factor)
        self.num_epochs = num_epochs
        self._epoch = 0
        self._step_in_epoch = 0
        self._consumed_state = {"epoch": 0, "step_in_epoch": 0}

    # ------------------------------------------------------------ state

    def state_dict(self) -> Dict[str, int]:
        """State as of the last batch the CONSUMER received (prefetched-but-unconsumed
        batches are not counted, so resume replays them)."""
        return dict(self._consumed_state)

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self._epoch = int(state["epoch"])
        self._step_in_epoch = int(state["step_in_epoch"])
        self._consumed_state = {"epoch": self._epoch,
                                "step_in_epoch": self._step_in_epoch}

    # ------------------------------------------------------------ iteration

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return -(-n // self.global_batch_size)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng((self.seed, epoch))
        if self.shuffle_algo == "full":
            return rng.permutation(n)
        # 'block': shard-locality shuffle (mosaicml-streaming py1br semantics,
        # reference latents_loader.py:88 dependency) - the sample space is cut into
        # contiguous blocks, the BLOCK order is shuffled, and samples shuffle only
        # within their block. At the 7TB/37M-sample recipe scale this keeps disk
        # reads inside a bounded contiguous shard range instead of pure random
        # access across the whole dataset, while staying deterministic per
        # (seed, epoch).
        bs = max(1, int(self.shuffle_block_size))
        starts = np.arange(0, n, bs)
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for b in rng.permutation(len(starts)):
            lo = int(starts[b])
            hi = min(n, lo + bs)
            order[pos : pos + hi - lo] = lo + rng.permutation(hi - lo)
            pos += hi - lo
        return order

    def _assemble(self, indices: np.ndarray, epoch: int) -> Dict[str, np.ndarray]:
        samples = self.dataset.get_batch(indices, epoch)
        keys = samples[0].keys()
        return {k: np.stack([s[k] for s in samples]) for k in keys}

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        while self.num_epochs is None or self._epoch < self.num_epochs:
            epoch = self._epoch
            order = self._epoch_order(epoch)
            gbs = self.global_batch_size
            steps = self.steps_per_epoch()
            lo = self.process_index * self.batch_size
            for step in range(self._step_in_epoch, steps):
                window = order[step * gbs : (step + 1) * gbs]
                mine = window[lo : lo + self.batch_size]
                if len(mine) == 0:
                    continue
                self._step_in_epoch = step + 1
                state = {"epoch": epoch, "step_in_epoch": step + 1}
                yield state, self._assemble(mine, epoch)
            self._epoch += 1
            self._step_in_epoch = 0

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Prefetching iterator: batches are assembled in a background thread.

        The producer watches a stop event so abandoning the iterator early (e.g. the
        trainer breaking at max_duration) releases the thread and its prefetched
        batches instead of leaving it blocked on a full queue."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_factor)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def producer():
            try:
                for item in self._batches():
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface worker errors to the consumer
                error.append(e)
            finally:
                while True:  # sentinel must land even if the queue is full
                    try:
                        q.put(sentinel, timeout=0.2)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                state, batch = item
                self._consumed_state = state
                yield batch
        finally:
            stop.set()


def build_streaming_latents_dataloader(
    datadir: Union[str, List[str]],
    batch_size: int,
    image_size: int = 256,
    cap_seq_size: int = 77,
    cap_emb_dim: int = 1024,
    cap_drop_prob: float = 0.0,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 18,
    process_index: int = 0,
    process_count: int = 1,
    **dataloader_kwargs: Any,
) -> LatentsDataLoader:
    """Reference-signature loader factory (latents_loader.py:73-108).

    ``batch_size`` is the per-host batch (the reference passes global//world_size,
    train.py:50).
    """
    if isinstance(datadir, str):
        datadir = [datadir]
    dataset = StreamingLatentsDataset(
        datadirs=list(datadir),
        image_size=image_size,
        cap_seq_size=cap_seq_size,
        cap_emb_dim=cap_emb_dim,
        cap_drop_prob=cap_drop_prob,
        seed=seed,
    )
    return LatentsDataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        seed=seed,
        process_index=process_index,
        process_count=process_count,
        **dataloader_kwargs,
    )
