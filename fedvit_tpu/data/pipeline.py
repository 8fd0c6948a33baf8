"""Input pipeline — host decode → fixed canvas → device-resident augmentation.

The reference decodes + augments per-sample with PIL inside DataLoader worker
processes (data.py:212-234, num_workers=8). The TPU-native split is:

  host (threads): JPEG/PNG decode → resize to a fixed square CANVAS (uint8)
  device (jit):   all augmentation (ops/image.train_transform — RRC, flips,
                  rotation, jitter, RandAugment, normalize) fused with the
                  train step's program

A fixed canvas gives XLA static shapes; the random crop is sampled in canvas
coordinates (distributionally equivalent to the reference's original-
resolution crops — documented deviation, SURVEY.md §7 hard-part #1).

Masks come from the precomputed PNG dir (<mask_dir>/<image>.png, reference
data.py:217-224) or — our extension — from the on-device classical
segmenter (ops/cvseg) when data.on_device_masks is set.
"""

from __future__ import annotations

import math
import queue
import threading
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from fedvit_tpu.core.config import Config
from fedvit_tpu.data.constants import encode_metadata_batch
from fedvit_tpu.data.sampling import epoch_indices


def canvas_size(image_size: int) -> int:
    """Smallest multiple of 16 ≥ 1.15·image_size (covers the eval resize at
    1.14·size without a second host decode)."""
    return int(math.ceil(image_size * 1.15 / 16) * 16)


def _load_image(path: str, canvas: int) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB").resize((canvas, canvas), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def _load_mask(path: Path, canvas: int) -> Optional[np.ndarray]:
    from PIL import Image
    if not path.exists():
        return None
    with Image.open(path) as im:
        im = im.convert("L").resize((canvas, canvas), Image.NEAREST)
        return np.asarray(im, dtype=np.uint8)[..., None]


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a background thread, keeping up to `depth` items decoded
    ahead — overlaps host batch assembly with device compute (the reference
    gets this from DataLoader workers, data.py:466-473). Order-preserving;
    producer exceptions re-raise at the consumer. Every queued item is a
    uniform ("item"|"end"|"err", payload) tuple, and an abandoned consumer
    (break / exception / GC-close of the generator) unblocks the producer via
    a stop flag checked around each bounded put."""
    if depth <= 0:
        yield from it
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(msg) -> bool:
        while not stop.is_set():
            try:
                q.put(msg, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for x in it:
                if not _put(("item", x)):
                    return
            _put(("end", None))
        except BaseException as e:  # noqa: BLE001 — re-raised below
            _put(("err", e))

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            tag, payload = q.get()
            if tag == "end":
                return
            if tag == "err":
                raise payload
            yield payload
    finally:
        stop.set()


class _ByteLRU:
    """Byte-budgeted LRU over decoded canvases (dict-compatible subset)."""

    def __init__(self, budget_bytes: int):
        self.budget = budget_bytes
        self.used = 0
        self._d: OrderedDict[int, np.ndarray] = OrderedDict()
        self._lock = threading.Lock()

    def __contains__(self, k: int) -> bool:
        return k in self._d

    def get(self, k: int) -> Optional[np.ndarray]:
        """Atomic lookup: returns the cached array or None — never raises on
        a concurrent eviction (decode threads / batch self-eviction race)."""
        with self._lock:
            v = self._d.get(k)
            if v is not None:
                self._d.move_to_end(k)
            return v

    def __getitem__(self, k: int) -> np.ndarray:
        v = self.get(k)
        if v is None:
            raise KeyError(k)
        return v

    def __setitem__(self, k: int, v: np.ndarray) -> None:
        with self._lock:
            if k in self._d:
                self._d.move_to_end(k)
                return
            self._d[k] = v
            self.used += v.nbytes
            while self.used > self.budget and len(self._d) > 1:
                _, old = self._d.popitem(last=False)
                self.used -= old.nbytes


class HostDataSource:
    """Decodes a dataframe's images (and masks) to fixed-canvas uint8 arrays
    with a thread pool; optionally caches everything in RAM."""

    def __init__(self, df, cfg: Config, canvas: Optional[int] = None,
                 cache: bool = True):
        self.df = df.reset_index(drop=True)
        self.cfg = cfg
        self.canvas = canvas or canvas_size(cfg.model.image_size)
        self.mask_dir = (Path(cfg.data.segmentation_mask_dir)
                         if cfg.data.use_segmentation_mask
                         and not cfg.data.on_device_masks else None)
        self.workers = max(1, cfg.training.num_workers)
        self.labels = self.df["label"].to_numpy(dtype=np.int32)
        self.metadata = encode_metadata_batch(
            self.df.get("age_norm", 0.5 * np.ones(len(self.df))).to_numpy()
            if "age_norm" in self.df else np.full(len(self.df), 0.5),
            self.df["sex_idx"].to_numpy() if "sex_idx" in self.df
            else np.full(len(self.df), 2),
            self.df["site_idx"].to_numpy() if "site_idx" in self.df
            else np.full(len(self.df), 8),
        )
        if not cache:
            self._cache = None
        elif cfg.data.cache_gb and cfg.data.cache_gb > 0:
            self._cache = _ByteLRU(int(cfg.data.cache_gb * 2**30))
        else:
            self._cache: Dict[int, np.ndarray] = {}
        self.prefetch = cfg.data.prefetch_batches

    def __len__(self):
        return len(self.df)

    def _fetch_one(self, i: int) -> np.ndarray:
        if self._cache is not None:
            hit = self._cache.get(i)   # atomic under _ByteLRU's lock
            if hit is not None:
                return hit
        img = _load_image(self.df["image_path"].iloc[i], self.canvas)
        if self.mask_dir is not None:
            m = _load_mask(self.mask_dir / f"{self.df['image'].iloc[i]}.png",
                           self.canvas)
            if m is None:
                m = np.zeros((self.canvas, self.canvas, 1), np.uint8)
            img = np.concatenate([img, m], axis=-1)   # RGBA-style packing
        if self._cache is not None:
            self._cache[i] = img
        return img

    def _gather_native(self, idx: np.ndarray) -> list:
        """Decode a batch through the C++ loader (native/fedvit_loader.cpp),
        honoring the RAM cache; falls back per-image to PIL on decode
        failure."""
        from fedvit_tpu.data import native_loader as nl
        local: Dict[int, np.ndarray] = {}
        if self._cache is not None:
            for i in idx.tolist():
                hit = self._cache.get(i)
                if hit is not None:
                    local[i] = hit
        todo = [i for i in idx.tolist() if i not in local]
        if todo:
            paths = [self.df["image_path"].iloc[i] for i in todo]
            imgs, ok = nl.decode_jpeg_batch(paths, self.canvas, self.workers)
            if self.mask_dir is not None:
                mpaths = [str(self.mask_dir / f"{self.df['image'].iloc[i]}.png")
                          for i in todo]
                masks, _ = nl.decode_png_mask_batch(mpaths, self.canvas,
                                                    self.workers)
                imgs = np.concatenate([imgs, masks], axis=-1)
            for j, i in enumerate(todo):
                img = imgs[j] if ok[j] else self._fetch_one(i)
                local[i] = img
                if self._cache is not None:
                    # write-through only: the batch is served from `local`,
                    # so a budget-full LRU evicting this (or an earlier)
                    # insert cannot break the in-flight batch
                    self._cache[i] = img
        return [local[i] for i in idx.tolist()]

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Fetch a batch: {"image" (B,canvas,canvas,3|4) uint8, "label",
        "metadata"}. The 4th channel, when present, is the mask PNG."""
        idx = np.asarray(indices).reshape(-1)
        from fedvit_tpu.data import native_loader as nl
        if nl.available():
            imgs = self._gather_native(idx)
        else:
            with ThreadPoolExecutor(self.workers) as pool:
                imgs = list(pool.map(self._fetch_one, idx.tolist()))
        return {
            "image": np.stack(imgs),
            "label": self.labels[idx],
            "metadata": self.metadata[idx],
        }

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      weighted: bool, drop_last: bool = True,
                      to_device: bool = False
                      ) -> Iterator[Dict[str, np.ndarray]]:
        plan = epoch_indices(self.labels, batch_size, rng,
                             weighted=weighted, drop_last=drop_last)

        def gen():
            for row in plan:
                b = self.gather(row)
                if to_device:
                    # H2D inside the prefetch thread: the (async) transfer
                    # overlaps device compute instead of serializing in the
                    # consumer's dispatch path
                    import jax
                    b = jax.device_put(b)
                yield b
        return prefetch_iterator(gen(), self.prefetch)

    def sequential_batches(self, batch_size: int
                           ) -> Iterator[Dict[str, np.ndarray]]:
        def gen():
            for s in range(0, len(self), batch_size):
                yield self.gather(
                    np.arange(s, min(s + batch_size, len(self))))
        return prefetch_iterator(gen(), self.prefetch)


class ArrayDataSource:
    """HostDataSource-compatible source over in-memory arrays (synthetic
    fixtures, pre-decoded datasets). data: {"image" (N,H,W,3|4) uint8/float,
    "label" (N,), "metadata" (N,13)[, "mask" (N,H,W,1)]}. A mask array is
    packed as the 4th image channel to match the on-disk pipeline contract."""

    def __init__(self, data: Dict[str, np.ndarray], pack_mask: bool = False):
        img = data["image"]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if pack_mask and "mask" in data:
            m = data["mask"]
            if m.dtype != np.uint8:
                m = (np.clip(m, 0, 1) * 255).astype(np.uint8)
            img = np.concatenate([img, m], axis=-1)
        self.images = img
        self.labels = np.asarray(data["label"], np.int32)
        self.metadata = np.asarray(data["metadata"], np.float32)
        self.canvas = img.shape[1]

    def __len__(self):
        return len(self.labels)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices).reshape(-1)
        return {"image": self.images[idx], "label": self.labels[idx],
                "metadata": self.metadata[idx]}

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      weighted: bool, drop_last: bool = True,
                      to_device: bool = False):
        plan = epoch_indices(self.labels, batch_size, rng,
                             weighted=weighted, drop_last=drop_last)
        for row in plan:
            b = self.gather(row)
            if to_device:
                import jax
                b = jax.device_put(b)
            yield b

    def sequential_batches(self, batch_size: int):
        for s in range(0, len(self), batch_size):
            yield self.gather(np.arange(s, min(s + batch_size, len(self))))


class DeviceDataSource:
    """Device-resident data source: every decoded canvas is uploaded ONCE
    and batches are gathered ON DEVICE from tiny host index arrays.

    Why this exists (measured on the axon-tunnel v5e, round 4): after the
    first execution of a large training program, the tunnel's host→device
    path degrades from ~1.3 GB/s to ~20 MB/s FOR THE REST OF THE PROCESS —
    a 57 MB batch upload then costs ~3 s, capping streamed training at
    ~60 img/s regardless of device speed. Scalar jit arguments stay free,
    so gathering from a resident (N, canvas, canvas, C) uint8 array with a
    per-epoch index plan keeps steady-state steps at full device rate
    (939 img/s ViT-B@224 bs=128). The federated server has used the same
    trick since round 2 (fed/server.py device-resident gather).

    On a normal TPU VM this is still the right design — it removes all
    per-step H2D traffic — it is just less *critical* there.

    The upload MUST happen before the first big program executes (train_fold
    orders it so). Batches come out as device arrays; labels convert back
    via tiny D2H when metrics need them.
    """

    CHUNK = 2048      # decode+upload granularity (bounds host transients)

    def __init__(self, source):
        import jax
        import jax.numpy as jnp

        n = len(source)
        first = source.gather(np.arange(min(self.CHUNK, n)))
        shape = (n,) + first["image"].shape[1:]
        self.canvas = int(shape[1])
        # preallocate once and stream chunks in with a DONATED
        # dynamic_update_slice — peak HBM stays at one dataset copy
        upd = jax.jit(
            lambda buf, part, s: jax.lax.dynamic_update_slice(
                buf, part, (s, 0, 0, 0)), donate_argnums=(0,))
        buf = jnp.zeros(shape, first["image"].dtype)
        labels, metas = [], []
        s = 0
        while s < n:
            part = (first if s == 0 else
                    source.gather(np.arange(s, min(s + self.CHUNK, n))))
            buf = upd(buf, jax.device_put(part["image"]), np.int32(s))
            labels.append(np.asarray(part["label"], np.int32))
            metas.append(np.asarray(part["metadata"], np.float32))
            s += self.CHUNK
        self.images_dev = buf
        self.labels = np.concatenate(labels)
        self.metadata = np.concatenate(metas)
        self.labels_dev = jax.device_put(self.labels)
        self.meta_dev = jax.device_put(self.metadata)

        def take_plan(im, lb, md, plan, i):
            idx = plan[i]
            return {"image": im[idx], "label": lb[idx], "metadata": md[idx]}

        def take_idx(im, lb, md, idx):
            return {"image": im[idx], "label": lb[idx], "metadata": md[idx]}

        self._take_plan = jax.jit(take_plan)
        self._take_idx = jax.jit(take_idx)

    @staticmethod
    def nbytes_estimate(source) -> int:
        canvas = getattr(source, "canvas", 0)
        ch = 4 if getattr(source, "mask_dir", None) is not None else 3
        if hasattr(source, "images"):           # ArrayDataSource
            return source.images.nbytes
        return len(source) * canvas * canvas * ch

    def __len__(self):
        return len(self.labels)

    def gather(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        import jax
        idx = jax.device_put(np.asarray(indices, np.int32).reshape(-1))
        return self._take_idx(self.images_dev, self.labels_dev,
                              self.meta_dev, idx)

    def epoch_batches(self, batch_size: int, rng: np.random.Generator,
                      weighted: bool, drop_last: bool = True,
                      to_device: bool = True):
        import jax
        plan = np.asarray(epoch_indices(self.labels, batch_size, rng,
                                        weighted=weighted,
                                        drop_last=drop_last), np.int32)
        plan_dev = jax.device_put(plan)         # ONE tiny upload per epoch
        for i in range(plan.shape[0]):
            # np.int32(i) rides in the dispatch call — no device_put RPC
            yield self._take_plan(self.images_dev, self.labels_dev,
                                  self.meta_dev, plan_dev, np.int32(i))

    def sequential_batches(self, batch_size: int):
        import jax
        n = len(self)
        full = n // batch_size
        if full:
            plan_dev = jax.device_put(
                np.arange(full * batch_size,
                          dtype=np.int32).reshape(full, batch_size))
            for i in range(full):
                yield self._take_plan(self.images_dev, self.labels_dev,
                                      self.meta_dev, plan_dev, np.int32(i))
        if n % batch_size:
            yield self.gather(np.arange(full * batch_size, n))


def maybe_device_resident(source, cfg: Config):
    """Wrap `source` in a DeviceDataSource when the config allows it, the
    estimated canvas bytes fit data.device_resident_mb, and a single
    accelerator device is in use (data-parallel sharding keeps the host
    path: batches shard across devices in `place`)."""
    import jax
    if source is None or isinstance(source, DeviceDataSource):
        return source
    budget = cfg.data.device_resident_mb
    if budget <= 0 or cfg.training.data_parallel:
        return source
    if jax.default_backend() not in ("tpu", "axon"):
        return source                           # pointless on CPU tests
    if DeviceDataSource.nbytes_estimate(source) > budget * 2**20:
        return source
    return DeviceDataSource(source)


def make_device_augment(cfg: Config, train: bool):
    """Device-side augmentation: raw uint8 canvas batch → model-ready batch.

    Returns a jittable fn(batch_dict, rng) → batch_dict with "image"
    (B, S, S, C) normalized float32 (+ mask 4th channel when configured)."""
    import jax
    import jax.numpy as jnp
    from fedvit_tpu.ops import image as I
    from fedvit_tpu.ops.cvseg import segment_lesion_batch

    size = cfg.model.image_size
    use_mask = cfg.data.use_segmentation_mask
    on_device_masks = cfg.data.on_device_masks
    aug = cfg.augmentation.train
    cj = aug.color_jitter

    def fn(batch, rng):
        raw = batch["image"]
        has_packed_mask = raw.shape[-1] == 4
        img = I.to_float(raw[..., :3])
        mask = None
        if use_mask:
            if has_packed_mask:
                mask = I.to_float(raw[..., 3:4])
            elif on_device_masks:
                mask = segment_lesion_batch(img, img.shape[1])
            else:
                mask = jnp.zeros(img.shape[:3] + (1,), jnp.float32)

        if train:
            img, mask = I.train_transform(
                rng, img, mask, out_size=size,
                scale=aug.random_resized_crop.scale,
                ratio=aug.random_resized_crop.ratio,
                do_hflip=aug.horizontal_flip, do_vflip=aug.vertical_flip,
                rotation=aug.rotation,
                cj=(cj.brightness, cj.contrast, cj.saturation, cj.hue),
                randaugment_n=(aug.randaugment.n if aug.randaugment.enabled
                               else 0),
                randaugment_m=aug.randaugment.m)
        else:
            img, mask = I.eval_transform(img, mask, out_size=size)

        if mask is not None:
            img = jnp.concatenate([img, mask], axis=-1)
        out = dict(batch)
        out["image"] = img
        return out

    return fn
