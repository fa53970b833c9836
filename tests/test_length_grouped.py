"""Length-grouped train batching (data/loader.py length_grouped): batches
become caption-length-homogeneous so prepare_batch's trim-to-batch-max
(train/steps.py) lands in the small text buckets for typical batches.

Deviation from the reference's uniform DistributedSampler documented in
PARITY.md #15 — coverage, determinism and host partitioning must be
IDENTICAL to the ungrouped loader; only within-epoch batch composition
changes.
"""
import numpy as np

from demovlp_tpu.data.datasets import dataset_object_loader
from demovlp_tpu.data.loader import RegionDataLoader

F, K = 1, 4


def _ds(n=256, style="long_tail"):
    return dataset_object_loader(
        "SyntheticObjectSelect",
        text_params={},
        object_params={
            "num_frames": F, "object_num": K, "num_samples": n,
            "caption_style": style,
        },
        split="train",
    )


def _loader(ds, bs=8, grouped=True, process_index=0, process_count=1,
            seed=3):
    return RegionDataLoader(
        ds, batch_size=bs, shuffle=True, num_workers=2, drop_last=True,
        seed=seed, process_index=process_index, process_count=process_count,
        length_grouped=grouped,
    )


def _batch_indices(loader):
    """Recover sample indices batch-by-batch via meta paths
    (synthetic://<index>)."""
    out = []
    for batch in loader:
        out.append([int(m["paths"].split("//")[1]) for m in batch["meta"]])
    return out


def test_text_lengths_proxy():
    ds = _ds(64)
    lens = ds.text_lengths()
    assert lens.shape == (64,) and lens.dtype == np.int32
    assert lens.min() >= 3
    # long-tail style: median near 12 words, real spread
    assert 8 <= np.median(lens) <= 16
    assert lens.max() > 20


def test_coverage_identical_to_ungrouped():
    """Grouping is a pure reorder: one epoch covers exactly the same sample
    set as the ungrouped loader (n divisible by batch size, so no tail)."""
    ds = _ds(128)
    plain = _batch_indices(_loader(ds, grouped=False))
    grouped = _batch_indices(_loader(ds, grouped=True))
    assert len(plain) == len(grouped) == 128 // 8
    flat_p = sorted(i for b in plain for i in b)
    flat_g = sorted(i for b in grouped for i in b)
    assert flat_p == flat_g == list(range(128))


def test_deterministic_and_epoch_varies():
    ds = _ds(128)
    l1, l2 = _loader(ds), _loader(ds)
    assert _batch_indices(l1) == _batch_indices(l2)
    l2.set_epoch(1)
    e1 = _batch_indices(l2)
    assert e1 != _batch_indices(l1)
    # and epoch 1 still covers everything exactly once
    assert sorted(i for b in e1 for i in b) == list(range(128))


BUCKETS = np.array([32, 48, 64])


def _bucket_of(max_len: int) -> int:
    i = int(np.searchsorted(BUCKETS, max_len, side="left"))
    return 100 if i == len(BUCKETS) else int(BUCKETS[i])


def test_batches_land_in_small_buckets():
    """The property that matters for throughput: the batch MAX (what
    prepare_batch pads to) must land in the smallest bucket for ~the same
    share of batches as the per-SAMPLE ideal — vs the ungrouped loader,
    where one long caption drags the whole batch up. Needs a big batch
    (the flagship 128): at small batch sizes random batches rarely contain
    a long caption, so there is nothing to fix."""
    ds = _ds(2048)
    lens = ds.text_lengths()
    ideal32 = float(np.mean(lens <= 32))
    assert ideal32 > 0.7  # long-tail premise: most captions are short

    def share32(batches):
        return float(np.mean([_bucket_of(lens[b].max()) == 32 for b in batches]))

    grouped = _batch_indices(_loader(ds, bs=128, grouped=True))
    s_g = share32(grouped)
    s_p = share32(_batch_indices(_loader(ds, bs=128, grouped=False)))
    # only the few class-boundary batches may leave the small bucket
    n_batches = len(grouped)
    assert s_g >= ideal32 - (len(BUCKETS) + 1) / n_batches, (s_g, ideal32)
    assert s_g > 2.0 * s_p, (s_g, s_p)


def test_within_class_composition_is_unsorted():
    """Within-batch order/composition must follow the epoch permutation, not
    a length sort: length-SORTED batches make contrastive negatives
    length-correlated (an earlier sort-based design measurably hurt
    convergence — BENCH_NOTES round 5 A/B). At least one batch must have
    non-monotonic within-batch lengths, and same-bucket batches must not
    all share identical length multisets ordering (i.e. real diversity)."""
    ds = _ds(512)
    lens = ds.text_lengths()
    batches = _batch_indices(_loader(ds, grouped=True))
    monotonic = [
        bool(np.all(np.diff(lens[b]) <= 0) or np.all(np.diff(lens[b]) >= 0))
        for b in batches
    ]
    assert not all(monotonic), "batches look length-sorted"
    # two different seeds produce different class-32 batch compositions
    alt = _batch_indices(_loader(ds, grouped=True, seed=11))
    sets_a = {frozenset(b) for b in batches}
    sets_b = {frozenset(b) for b in alt}
    assert sets_a != sets_b


def test_multihost_partition_disjoint_and_equal():
    ds = _ds(256)
    per_host = []
    for pi in range(2):
        loader = _loader(ds, process_index=pi, process_count=2)
        per_host.append([i for b in _batch_indices(loader) for i in b])
    assert len(per_host[0]) == len(per_host[1]) == 128
    assert not (set(per_host[0]) & set(per_host[1]))


def test_multihost_batches_draw_from_shared_global_windows():
    """Grouping happens on the GLOBAL permutation before host striding, so
    step j's global batch (union of every host's batch j) is the same
    sample set at ANY process count — the same contract the ungrouped
    loader gives the real multi-process run (tests/test_multiprocess.py),
    and what keeps per-host bucket choices aligned (the cross-process
    bucket sync in prepare_batch then almost never widens a batch past its
    own class edge)."""
    ds = _ds(256)
    single = _batch_indices(_loader(ds, bs=8, process_count=1))
    hosts = [
        _batch_indices(_loader(ds, bs=4, process_index=pi, process_count=2))
        for pi in range(2)
    ]
    assert len(hosts[0]) == len(hosts[1]) == len(single)
    for j, sp_batch in enumerate(single):
        union = set(hosts[0][j]) | set(hosts[1][j])
        assert union == set(sp_batch), j


def test_inert_on_eval_loaders():
    """length_grouped is train-only: an unshuffled / keep-last loader must
    ignore it (eval order is the dataset order contract)."""
    ds = _ds(64)
    loader = RegionDataLoader(
        ds, batch_size=8, shuffle=False, num_workers=2, drop_last=False,
        process_index=0, process_count=1, length_grouped=True,
    )
    assert not loader.length_grouped
    flat = [i for b in _batch_indices(loader) for i in b]
    assert flat == list(range(64))


def test_sort_mode_is_exact_length_sorted_partition():
    """length_grouped="sort" — the measurement-only reproduction of the
    REJECTED exact-length-sort design (quantified as a convergence harm in
    the BENCH_NOTES round-5 A/B; kept only so scripts/ab_text_buckets.py
    can measure it). Contract: same coverage/determinism as the shipped
    class mode, but every batch is a contiguous slice of the stable
    length-sort of the epoch permutation — i.e. batches partition the
    length axis (the property that makes negatives length-correlated)."""
    ds = _ds(128)
    lens = ds.text_lengths()
    loader = _loader(ds, grouped="sort")
    assert loader.length_grouped and loader.length_group_mode == "sort"
    batches = _batch_indices(loader)
    # pure reorder: full coverage, deterministic
    assert sorted(i for b in batches for i in b) == list(range(128))
    assert batches == _batch_indices(_loader(ds, grouped="sort"))
    # batches are non-overlapping intervals in length space
    spans = sorted((lens[b].min(), lens[b].max()) for b in batches)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, (hi, lo)


def test_class_prediction_matches_tokenized_bucket():
    """The class partition must PREDICT prepare_batch's bucket decision:
    bucket edges are TOKEN lengths (attention-mask sums incl. [CLS]/[SEP])
    while the grouping proxy is a word count, so the class assignment
    carries a +2 specials margin (round-5 fix: without it, every class-32
    batch whose longest caption has 31-32 words was promoted to bucket 48
    by the tokenizer — half the fast-band batches on the bench epoch).
    Whole-word captions (the synthetic vocabulary) tokenize 1 token/word
    under SimpleTokenizer, so prediction must be EXACT here."""
    from demovlp_tpu.data.tokenizer import SimpleTokenizer
    from demovlp_tpu.train.steps import prepare_batch

    ds = _ds(1024)
    lens = ds.text_lengths()
    tok = SimpleTokenizer(max_length=100)
    loader = _loader(ds, bs=64, grouped=True)
    batches = _batch_indices(loader)
    for b in batches:
        max_words = int(lens[b].max())
        predicted = _bucket_of(max_words + 2)
        texts = [ds[i]["text"] for i in b]
        enc = tok(texts, max_length=100)
        got = prepare_batch(
            {"text": texts, "object": np.zeros((len(b), 1, 1, 1)),
             "object_mask": np.zeros((len(b), 1, 1))},
            tok, text_buckets=list(BUCKETS),
        )
        assert got["input_ids"].shape[1] == predicted, (
            max_words, predicted, got["input_ids"].shape,
            int(enc["attention_mask"].sum(axis=1).max()),
        )
    # the leak this guards against: the share of batches REALLY running at
    # the smallest token bucket must track the per-sample ideal (samples
    # whose predicted token length fits 32), up to class-boundary batches —
    # pre-fix, raw-proxy classes leaked every 31-32-word class-32 batch to
    # bucket 48 (roughly half the fast band on a long-tail epoch)
    ideal = float(np.mean(lens + 2 <= 32))
    share = float(np.mean(
        [_bucket_of(int(lens[b].max()) + 2) == 32 for b in batches]
    ))
    assert share >= ideal - (len(BUCKETS) + 1) / len(batches), (share, ideal)
