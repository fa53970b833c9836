"""Host-side input pipeline: sharded sampling, threaded prefetch, fixed-shape
numpy batches.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler stack (base/base_data_loader.py): each JAX *process*
(host) reads only its strided slice of the per-epoch permutation
(DistributedSampler semantics with drop_last=True, :23-28), a thread pool
overlaps npz IO with device compute, and every batch has identical shapes so
the jitted train step never recompiles.
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.transforms import init_transform_dict

# [CLS] + [SEP] — the margin between the word-count length proxy and the
# tokenized length the text_buckets edges are compared against
# (see _length_group)
_TOKENIZER_SPECIALS = 2


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-sample dicts into a fixed-shape numpy batch."""
    batch: Dict[str, Any] = {
        "object": np.stack([it["object"] for it in items]).astype(np.float32),
        "object_mask": np.stack([it["object_mask"] for it in items]).astype(
            np.float32
        ),
        "text": [it["text"] for it in items],
        "meta": [it["meta"] for it in items],
    }
    if "label" in items[0]:
        batch["label"] = np.asarray([it["label"] for it in items], dtype=np.int32)
    if "question_id" in items[0]:
        batch["question_id"] = np.asarray(
            [it["question_id"] for it in items], dtype=np.int64
        )
    if "mc_id" in items[0]:
        batch["mc_id"] = [it["mc_id"] for it in items]
    return batch


class RegionDataLoader:
    """Iterates fixed-shape batches of one host's shard of a dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        prefetch: int = 2,
        length_grouped: bool = False,
        length_buckets: Sequence[int] = (32, 48, 64),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        # train-only (shuffled, drop_last) caption-length grouping — see
        # _length_group. Inert on eval loaders by construction.
        # length_grouped="sort" selects the exact-length stable sort — a
        # MEASUREMENT-ONLY reproduction of the earlier rejected design, kept
        # so scripts/ab_text_buckets.py can quantify its convergence harm
        # (BENCH_NOTES round 5); production configs use True (class mode).
        self.length_group_mode = "sort" if length_grouped == "sort" else "class"
        self.length_grouped = bool(length_grouped) and shuffle and drop_last
        # class edges for _length_group; match trainer.text_buckets (the
        # grouping still helps — batch maxes shrink — if they differ)
        self.length_buckets = tuple(sorted(length_buckets))
        self._text_lens: Optional[np.ndarray] = None
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.n_samples = len(dataset)
        self.dataset_name = getattr(dataset, "dataset_name", type(dataset).__name__)

    # reference API parity: sampler.set_epoch(epoch)
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _length_group(self, idx: np.ndarray) -> np.ndarray:
        """Stably partition an (already epoch-shuffled) permutation by
        caption-length BUCKET CLASS (the smallest length bucket a sample
        fits, classes in ascending order), so consecutive batches pad to
        the same small bucket. Applied to the GLOBAL truncated permutation
        before host striding (see _host_indices) so every host sees the
        same class boundaries at the same step index.

        Why: prepare_batch (train/steps.py) trims each batch's token padding
        to the batch MAX, so one long caption in a random batch drags all
        128 rows to the big bucket; grouping makes the short-bucket fast
        band the TYPICAL band (PARITY.md #15 documents the sampling-
        distribution deviation). Within each class the EPOCH PERMUTATION's
        random order is preserved, so within-batch composition stays a
        uniform draw from that class — on a long-tail distribution the
        smallest class holds ~85%+ of samples, keeping contrastive
        negatives nearly as diverse as uniform batching. (An earlier
        sort-by-exact-length design made negatives length-correlated and
        measurably hurt convergence — BENCH_NOTES round 5 A/B.) Only the
        (few) class-boundary batches mix classes. __iter__ shuffles the
        final batch ORDER so epoch position doesn't correlate with caption
        length."""
        if self._text_lens is None:
            self._text_lens = np.asarray(self.dataset.text_lengths())
        if self.length_group_mode == "sort":
            # measurement-only (see __init__): stable exact-length sort —
            # negatives become length-correlated within every batch
            return idx[np.argsort(self._text_lens[idx], kind="stable")]
        buckets = np.asarray(self.length_buckets)
        # class c = first bucket >= PREDICTED TOKEN length. The proxy is a
        # whitespace word count while the bucket edges are TOKEN lengths
        # (trainer.text_buckets compares prepare_batch's tokenized
        # attention-mask sums), and every tokenizer adds [CLS]/[SEP] — so a
        # raw-proxy class-32 batch whose longest caption has 31-32 words
        # tokenizes past the edge and prepare_batch promotes all its rows
        # to the next bucket. Measured on the long-tail bench epoch: 15 of
        # 16 leaked batches recovered by the +2 specials margin
        # (bench_lengrouped, BENCH_NOTES round 5). Wordpiece expansion can
        # still leak a batch whose words split — the margin is a floor, not
        # exact. len(buckets) = fits-none (pads to the full fixed length).
        cls = np.searchsorted(
            buckets, self._text_lens[idx] + _TOKENIZER_SPECIALS, side="left"
        )
        return np.concatenate(
            [idx[cls == c] for c in range(len(buckets) + 1)]
        )

    def _host_indices(self):
        """This host's sample indices, plus a per-sample validity array (or
        None when every index is a real sample).

        train (drop_last): strided equal share, excess dropped — the
        reference's DistributedSampler semantics (base_data_loader.py:23-28).

        eval (not drop_last): every host gets an EQUAL ceil(n / P) share in
        CONTIGUOUS blocks, the tail wrap-padded with duplicates flagged
        invalid. Equal shares keep every host dispatching the same number of
        identically-shaped (collective) eval steps; contiguous blocks mean
        concatenating the per-host results in process order restores the
        exact dataset order; the validity flags let trainers drop the
        duplicates — so multi-host eval covers ALL n samples exactly once
        (the reference's DistributedSampler truncates eval to a multiple of
        the world size)."""
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            )
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.drop_last:
            per_host = n // self.process_count
            if per_host == 0:
                raise ValueError(
                    f"dataset of {n} samples cannot be split over "
                    f"{self.process_count} hosts"
                )
            order = order[: per_host * self.process_count]
            if self.length_grouped:
                # group the GLOBAL truncated permutation BEFORE striding:
                # host h's batch j then draws from the same global window
                # order[j*B*P:(j+1)*B*P] on every host, so per-host class
                # boundaries align and the cross-process bucket sync in
                # prepare_batch (train/steps.py) almost never widens a
                # batch past its own class edge. Per-host grouping of the
                # strided slice would give each host different class
                # boundaries — step j could be class 0 on one host and
                # class 1 on another, wasting the grouping win.
                order = self._length_group(order)
            host = order[self.process_index :: self.process_count]
            return host, None
        share = -(-n // self.process_count)
        total = share * self.process_count
        # cyclic wrap (np.resize) — the pad can exceed n when n < 2*P
        padded = np.resize(order, total) if total > n else order
        valid = np.arange(total) < n
        sl = slice(self.process_index * share, (self.process_index + 1) * share)
        if total == n:
            return padded[sl], None
        return padded[sl], valid[sl]

    def __len__(self) -> int:
        if self.drop_last:
            per_host = self.n_samples // self.process_count
            return per_host // self.batch_size
        share = -(-self.n_samples // self.process_count)
        return -(-share // self.batch_size)

    def _fetch(self, idx: int) -> Dict[str, Any]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, int(idx)])
        )
        return self.dataset.get_item(int(idx), rng)

    def _native_batch_reader(self):
        """The native reader iff whole-batch C++ assembly applies: base-class
        object decoding (datasets overriding _load_objects — images,
        synthetic — keep the per-sample path) and the library built."""
        if os.environ.get("DEMOVLP_NATIVE", "1") == "0" or (
            os.environ.get("DEMOVLP_NATIVE_BATCH", "1") == "0"
        ):
            return None
        from demovlp_tpu.data.datasets.base import RegionDataset
        from demovlp_tpu.data.native import get_native_reader

        ds = self.dataset
        if not isinstance(ds, RegionDataset):
            return None
        if type(ds)._load_objects is not RegionDataset._load_objects:
            return None
        return get_native_reader()

    def _fetch_batch_native(self, batch_idx, reader, pool) -> Dict[str, Any]:
        """One C++ threaded call decodes the whole batch's npz files into the
        final (B, F, K, 2054) buffers — no per-sample numpy allocs, no
        collate re-stack. Per-sample Python keeps only text/meta selection;
        rng consumption matches the per-sample path exactly (plan_item), so
        batches are bit-identical to pool.map(_fetch) + collate."""
        from demovlp_tpu.data.regions import REGION_DIM

        ds = self.dataset

        def _plan(idx):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, int(idx)])
            )
            return ds.plan_item(int(idx), rng)

        # planning does per-sample metadata IO (exists/listdir) — keep it
        # concurrent like the per-sample path (each sample has its own
        # seeded rng, so pool parallelism preserves determinism)
        plans = list(pool.map(_plan, batch_idx))
        b = len(plans)
        f = int(ds.segments)
        k = ds.object_num
        feat = np.zeros((b * f, k, REGION_DIM), dtype=np.float32)
        mask = np.zeros((b * f, k), dtype=np.float32)
        lens = np.zeros(b * f, dtype=np.int32)
        # defensive only: base plan_paths always yields exactly `segments`
        # paths (_frame_indices pads short videos), but a subclass override
        # returning a ragged list would otherwise make the native call
        # write past the (b*f)-sized buffers — route such rows through the
        # per-sample path (which fails as loudly as the non-batched loader)
        bad = np.zeros(b, dtype=bool)
        flat = []
        for i, (paths, _) in enumerate(plans):
            if len(paths) == f:
                flat.extend(paths)
            else:
                bad[i] = True
                flat.extend([""] * f)  # placeholders decode to error status
        status = reader.read_paths_into(flat, k, feat, mask, lens)
        feat = feat.reshape(b, f, k, REGION_DIM)
        mask = mask.reshape(b, f, k)
        bad |= status.reshape(b, f).any(axis=1)
        datas = [data for _, data in plans]
        for i in np.nonzero(bad)[0]:
            # rare corrupt file: redo this row per-sample (same seeded rng
            # stream -> identical resample behavior to the non-batched path,
            # including re-drawn text/meta/label of the substituted item)
            item = self._fetch(int(batch_idx[i]))
            feat[i] = item["object"]
            mask[i] = item["object_mask"]
            datas[i] = item
        batch: Dict[str, Any] = {
            "object": feat,
            "object_mask": mask,
            "text": [d["text"] for d in datas],
            "meta": [d["meta"] for d in datas],
        }
        if "label" in datas[0]:
            batch["label"] = np.asarray(
                [d["label"] for d in datas], dtype=np.int32
            )
        if "question_id" in datas[0]:
            batch["question_id"] = np.asarray(
                [d["question_id"] for d in datas], dtype=np.int64
            )
        if "mc_id" in datas[0]:
            batch["mc_id"] = [d["mc_id"] for d in datas]
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices, valid = self._host_indices()
        nb = len(indices) // self.batch_size
        tail = len(indices) % self.batch_size
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if tail and not self.drop_last:
            batches.append(indices[nb * self.batch_size :])
        if self.length_grouped and len(batches) > 1:
            # decorrelate epoch position from caption length: batch order is
            # re-shuffled (seeded by (seed, epoch) like the permutation)
            brng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, 1])
            )
            batches = [batches[j] for j in brng.permutation(len(batches))]
        if valid is not None:
            vbatches = [
                valid[i * self.batch_size : (i + 1) * self.batch_size]
                for i in range(len(batches))
            ]
        else:
            vbatches = [None] * len(batches)
        if not batches:
            return iter(())

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts if the consumer went away (early break
            on `max_samples_per_epoch` must not leak a blocked producer)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        native = self._native_batch_reader()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_idx, vb in zip(batches, vbatches):
                        if stop.is_set():
                            return
                        if native is not None:
                            # whole-batch C++ assembly (threaded in native
                            # code; bit-identical to the pool path)
                            out = self._fetch_batch_native(batch_idx, native, pool)
                        else:
                            items = list(pool.map(self._fetch, batch_idx))
                            out = collate(items)
                        if vb is not None:
                            # multi-host eval wrap-pad flags (consistent
                            # batch structure on every host by construction)
                            out["sample_valid"] = vb.astype(np.float32)
                        if not _put(out):
                            return
            except BaseException as exc:  # surface to the consumer, don't hang it
                _put(exc)
                return
            _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is sentinel:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                # runs on normal exhaustion AND on early abandonment
                # (GeneratorExit): release a producer blocked on a full queue,
                # then reap the thread + its pool
                stop.set()
                try:
                    while True:
                        out_q.get_nowait()
                except queue.Empty:
                    pass
                thread.join(timeout=30)

        return gen()


class MultiDistTextObjectVideoDataLoader(RegionDataLoader):
    """Config-surface-compatible constructor (same kwargs as the reference's
    MultiDistTextObjectVideoDataLoader, data_loader/data_loader.py:68-101)."""

    def __init__(
        self,
        dataset_name: str,
        text_params: dict,
        object_params: dict,
        data_dir: str = "",
        object_dir: str = "",
        metadata_dir: Optional[str] = None,
        split: str = "train",
        tsfm_params: Optional[dict] = None,
        cut: Optional[str] = None,
        subsample: float = 1,
        sliding_window_stride: int = -1,
        reader: str = "cv2",
        batch_size: int = 1,
        num_workers: int = 1,
        shuffle: bool = True,
        args: Any = None,  # parity slot; unused (mesh replaces rank plumbing)
        drop_last: Optional[bool] = None,
        seed: int = 0,
        length_grouped: bool = False,
        length_buckets: Sequence[int] = (32, 48, 64),
    ):
        tsfm_dict = init_transform_dict(**(tsfm_params or {}))
        dataset = dataset_object_loader(
            dataset_name,
            text_params=text_params,
            object_params=object_params,
            data_dir=data_dir,
            object_dir=object_dir,
            metadata_dir=metadata_dir,
            split=split,
            tsfms=tsfm_dict.get(split),
            cut=cut,
            subsample=subsample,
            sliding_window_stride=sliding_window_stride,
            reader=reader,
        )
        if split != "train":
            shuffle = False
        if drop_last is None:
            drop_last = split == "train"
        super().__init__(
            dataset,
            batch_size=batch_size,
            shuffle=shuffle,
            num_workers=num_workers,
            drop_last=drop_last,
            seed=seed,
            length_grouped=length_grouped,
            length_buckets=length_buckets,
        )
