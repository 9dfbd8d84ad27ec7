"""Training data pipeline: precomputed-latent shards + prefetching loader.

The reference repo ships no training code at all (SURVEY.md §5); the
framework's training module (training.py) needs data. The standard
T2V fine-tuning shape is PRECOMPUTED tensors — VAE latents and frozen
text-encoder outputs — because running a 7B text encoder and the VAE
inside the train step would dominate it. This module provides:

  * :func:`write_shard` — pack one .npz shard of
    {latents, text_embeds, pooled_embed, text_mask};
  * :func:`precompute_shard` — build a shard from raw pixel clips +
    captions with the pipeline's own VAE/text encoders (one-time prep);
  * :class:`LatentShardLoader` — iterate (shuffled, seeded) batches
    with a background thread staging the next host batch while the
    device computes, and dp-aware placement onto a mesh
    (NamedSharding("dp")) so train_step consumes them directly.

Shards are plain npz (one zip per ~10k clips): trivially producible by
any external tool, memory-mapped lazily, and portable across hosts of
a fleet (each host loads its own subset by ``host_shard``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Sequence

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_KEYS = ("latents", "text_embeds", "pooled_embed", "text_mask")


def write_shard(path: str, latents, text_embeds, pooled_embed,
                text_mask) -> None:
    """latents (N,T,H,W,C) f32/bf16->f16, text_embeds (N,L,D),
    pooled_embed (N,P), text_mask (N,L) bool."""
    n = len(latents)
    assert all(len(a) == n for a in (text_embeds, pooled_embed, text_mask))
    np.savez(
        path,
        latents=np.asarray(latents, np.float16),
        text_embeds=np.asarray(text_embeds, np.float16),
        pooled_embed=np.asarray(pooled_embed, np.float16),
        text_mask=np.asarray(text_mask, bool),
    )


def precompute_shard(path: str, pipeline, videos, captions,
                     text_len: int = 256) -> None:
    """One-time prep: encode raw clips + captions into a training shard
    with the pipeline's own VAE and text encoders.

    videos: (N, T, H, W, 3) uint8/float in [0,255]; captions: N strings.
    """
    lat, te, pe, ms = [], [], [], []
    for vid, cap in zip(videos, captions):
        x = (np.asarray(vid, np.float32) / 127.5 - 1.0)[None]
        z = pipeline.vae.encode(jnp.asarray(x))
        z = z * pipeline.vae.scaling_factor
        cond = pipeline.text_embedder.encode([cap], "video")
        emb = np.asarray(cond.text_embeds[0], np.float16)
        mask = np.asarray(cond.mask[0], bool)
        if emb.shape[0] < text_len:
            pad = text_len - emb.shape[0]
            emb = np.pad(emb, ((0, pad), (0, 0)))
            mask = np.pad(mask, (0, pad))
        lat.append(np.asarray(z[0], np.float16))
        te.append(emb[:text_len])
        pe.append(np.asarray(cond.pooled_embed[0], np.float16))
        ms.append(mask[:text_len])
    write_shard(path, lat, te, pe, ms)


class LatentShardLoader:
    """Shuffled, prefetching batch iterator over .npz latent shards.

    One background thread assembles the NEXT host batch (and pushes it
    to device) while the caller's train step runs — the standard
    compute/IO overlap. With ``mesh`` given, batches land dp-sharded
    (NamedSharding(mesh, P("dp"))), ready for training.train_step.

    Multi-host: pass ``host_shard=(process_index, process_count)`` so
    each host reads a disjoint subset of shards.
    """

    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 seed: int = 0, mesh=None, prefetch: int = 2,
                 host_shard=None, drop_remainder: bool = True,
                 dtype=jnp.bfloat16):
        paths = sorted(shard_paths)
        if host_shard is not None:
            idx, count = host_shard
            paths = paths[idx::count]
        if not paths:
            raise ValueError("no shards to load")
        self.paths = paths
        self.batch_size = batch_size
        self.seed = seed
        self.mesh = mesh
        self.prefetch = prefetch
        self.drop_remainder = drop_remainder
        self.dtype = dtype

    # ------------------------------------------------------------------
    def _iter_host_batches(self, epoch: int):
        rng = np.random.RandomState((self.seed, epoch))
        order = rng.permutation(len(self.paths))
        carry = None
        for pi in order:
            with np.load(self.paths[pi]) as z:
                data = {k: z[k] for k in _KEYS}
            n = len(data["latents"])
            perm = rng.permutation(n)
            data = {k: v[perm] for k, v in data.items()}
            if carry is not None:
                data = {k: np.concatenate([carry[k], data[k]])
                        for k in _KEYS}
            n = len(data["latents"])
            nb = n // self.batch_size
            for b in range(nb):
                sl = slice(b * self.batch_size, (b + 1) * self.batch_size)
                yield {k: v[sl] for k, v in data.items()}
            rem = n - nb * self.batch_size
            carry = ({k: v[n - rem:] for k, v in data.items()}
                     if rem else None)
        if carry is not None and not self.drop_remainder:
            yield carry

    def _place(self, batch):
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v, bool if k == "text_mask" else self.dtype)
            if self.mesh is not None:
                arr = jax.device_put(
                    arr, NamedSharding(self.mesh, P("dp")))
            out[k] = arr
        return out

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield device-placed batches for one epoch, prefetched.

        A producer-side exception (corrupt shard, device OOM) re-raises
        in the consumer; abandoning the generator mid-epoch unblocks
        and stops the producer thread (no leaked device batches).
        """
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def producer():
            try:
                for hb in self._iter_host_batches(epoch):
                    item = self._place(hb)
                    while not abandoned.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
                q.put(stop)
            except BaseException as e:  # noqa: BLE001  surface to consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            abandoned.set()
            while not q.empty():  # free any device-resident batches
                q.get_nowait()

    def __iter__(self):
        return self.epoch(0)
