"""Fixed-shape batch assembly + threaded prefetch loader.

Capability parity with the reference collate fns + DataLoader
(``sparse_caption/data/collate.py:119-262``, ``utils/training.py:97-116``):
per batch, bottom-up features for B images plus ``seq_per_img`` sampled
captions per image (labels shape ``(B*seq_per_img, L)``), caption masks,
host-side GT token strings for SCST, shuffle+drop_last in train.

TPU-first deltas (documented, intentional):
* every array in the batch has a **static shape** — captions are padded to
  exactly ``max_seq_length``, regions to ``max_att_regions`` — so a single
  XLA program serves every step (the reference pads to the per-batch max)
* when an image has fewer than ``seq_per_img`` captions we sample with
  replacement to keep ``B*seq_per_img`` static (COCO always has >= 5, so
  this never triggers on the real dataset; the reference emits a ragged
  batch in that case, ``collate.py:133-139``)
* the final eval batch is padded up to ``batch_size`` with repeated records
  and carries ``batch_valid`` so jit sees one shape
* prefetch is a daemon thread + bounded queue feeding device transfer,
  replacing forked DataLoader workers
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from sparse_caption_tpu.data.features import FeatureSource


class CaptionBatcher:
    """Builds one fixed-shape numpy batch from dataset records."""

    def __init__(self, config, tokenizer, feature_source: FeatureSource):
        self.config = config
        self.tokenizer = tokenizer
        self.features = feature_source
        self.seq_per_img = int(config.get("seq_per_img", 5))
        self.max_seq_length = int(config.get("max_seq_length", 18))
        assert self.seq_per_img > 0

    def _encode_caption(self, caption: str) -> np.ndarray:
        ids = self.tokenizer.encode(caption, add_bos_eos=True, max_seq_length=self.max_seq_length)
        # radix encoding can overshoot by < tokens_per_word (reference
        # tokenizer.py:604-615 word-budget formula); hard-cap for static shapes
        ids = ids[: self.max_seq_length]
        out = np.zeros((self.max_seq_length,), dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def sample_captions(self, records: Sequence[dict], rng) -> List[str]:
        """Draw ``seq_per_img`` captions per record (with-replacement pad
        for rare short records — the documented static-shape delta)."""
        chosen_all: List[str] = []
        for r in records:
            caps = r["all_captions"]
            if len(caps) >= self.seq_per_img:
                chosen_all += rng.sample(caps, self.seq_per_img)
            else:  # static-shape delta: sample with replacement
                chosen_all += list(caps) + [rng.choice(caps) for _ in range(self.seq_per_img - len(caps))]
        return chosen_all

    def encode_captions(self, captions: Sequence[str]) -> Dict:
        if hasattr(self.tokenizer, "encode_batch"):
            seqs = self.tokenizer.encode_batch(list(captions), self.max_seq_length)
        else:
            seqs = np.stack([self._encode_caption(c) for c in captions], 0)
        return {"seqs": seqs, "masks": (seqs != self.tokenizer.pad_token_id).astype(np.float32)}

    def __call__(self, records: Sequence[dict], sample_captions: bool = True, rng: Optional[random.Random] = None) -> Dict:
        rng = rng or random
        feats = [self.features.load(r["img_id"]) for r in records]
        batch: Dict = {}
        for key in feats[0]:
            batch[key] = np.stack([f[key] for f in feats], 0)

        if sample_captions:
            batch.update(self.encode_captions(self.sample_captions(records, rng)))

        batch["gts"] = [r["all_gts"] for r in records]
        batch["image_paths"] = [r["img_path"] for r in records]
        batch["image_ids"] = [r["img_id"] for r in records]
        return batch


class BatchLoader:
    """Iterable over fixed-shape batches with background prefetch.

    Train mode: shuffle each epoch, drop_last. Eval mode: in-order, final
    partial batch padded by repeating the last record (``batch_valid`` gives
    the true count).
    """

    def __init__(
        self,
        records: List[dict],
        batcher: CaptionBatcher,
        batch_size: int,
        train: bool,
        seed: int = 8888,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.records = list(records)
        self.batcher = batcher
        self.batch_size = int(batch_size)  # GLOBAL batch size
        self.train = train
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        # multi-process sharding: every process enumerates the IDENTICAL
        # global batch order (same seed -> same shuffle, same caption
        # sampling) but loads features/encodes captions only for its
        # contiguous 1/process_count slice of each batch; shard_batch then
        # assembles the global arrays. Global metadata (gts, image ids/
        # paths, batch_valid) is carried in full on every process — it is
        # cheap host data that eval gathering and device-reward ref packs
        # need globally.
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        assert 0 <= self.process_index < self.process_count
        assert self.batch_size % self.process_count == 0, (
            f"global batch_size {batch_size} must divide by process_count {process_count}")

    def __len__(self) -> int:
        n = len(self.records)
        return n // self.batch_size if self.train else -(-n // self.batch_size)

    def _batches(self) -> Iterator[Dict]:
        rng = random.Random(self.seed + self._epoch)
        order = list(range(len(self.records)))
        if self.train:
            rng.shuffle(order)
        n_batches = len(self)
        lb = self.batch_size // self.process_count
        for b in range(n_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            valid = len(idx)
            if not self.train and valid < self.batch_size:
                idx = idx + [idx[-1]] * (self.batch_size - valid)
            recs = [self.records[i] for i in idx]
            if self.process_count > 1:
                # caption sampling must consume the rng identically on every
                # process, so the GLOBAL batch's captions are drawn first and
                # the local slice is cut afterwards
                local = recs[self.process_index * lb : (self.process_index + 1) * lb]
                batch = self.batcher(local, sample_captions=False, rng=rng)
                if self.train:
                    global_caps = self.batcher.sample_captions(recs, rng)
                    spi = self.batcher.seq_per_img
                    caps = global_caps[self.process_index * lb * spi
                                       : (self.process_index + 1) * lb * spi]
                    batch.update(self.batcher.encode_captions(caps))
                batch["gts"] = [r["all_gts"] for r in recs]
                batch["image_paths"] = [r["img_path"] for r in recs]
                batch["image_ids"] = [r["img_id"] for r in recs]
            else:
                batch = self.batcher(recs, sample_captions=self.train, rng=rng)
            batch["batch_valid"] = valid
            yield batch
        self._epoch += 1

    def __iter__(self) -> Iterator[Dict]:
        # epoch accounting is by COMPARISON with the epoch at entry, never
        # by unconditional increment: _batches() advances the counter when
        # it exhausts normally, and thread/abandonment timing must not be
        # able to double-advance it — every process of a multi-process run
        # has to enumerate the identical shuffle order (see class docstring)
        start_epoch = self._epoch
        if self.prefetch <= 0:
            try:
                yield from self._batches()
            finally:
                if self._epoch == start_epoch:
                    # abandoned mid-epoch: advance so the partial epoch is
                    # not replayed with the identical shuffle order
                    self._epoch = start_epoch + 1
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                for batch in self._batches():
                    # bounded put that notices consumer abandonment: a
                    # consumer that breaks mid-epoch closes the generator,
                    # which sets `stop` — a plain q.put would block this
                    # thread forever holding full feature batches
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate loader errors to consumer
                err.append(e)
            finally:
                while True:  # sentinel put that also respects abandonment
                    try:
                        q.put(sentinel, timeout=0.1)
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
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            # runs on normal completion AND on GeneratorExit/consumer error
            if t.is_alive():
                stop.set()
                t.join(timeout=5.0)
            if self._epoch == start_epoch:
                # producer never exhausted _batches (abandoned mid-epoch):
                # advance exactly once so the partial epoch is not replayed
                # with the identical shuffle order. A producer that DID
                # exhaust (merely blocked on the sentinel put) already
                # advanced it — the old is_alive()-gated increment could
                # double-advance here and silently desynchronize the
                # processes' global batch order
                self._epoch = start_epoch + 1
