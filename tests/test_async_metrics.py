"""DeferredMetrics: one-step-delayed consumption, exact totals, flush."""
from demovlp_tpu.train.async_metrics import DeferredMetrics


def test_deferred_metrics_totals_and_order():
    seen = []
    d = DeferredMetrics(lambda m, idx: seen.append((m, idx)))
    for i in range(5):
        d.push({"loss": float(i)}, i)
        # entry i is pending; entries < i consumed in order
        assert len(seen) == i
    d.flush()
    assert seen == [({"loss": float(i)}, i) for i in range(5)]
    # flush is idempotent
    d.flush()
    assert len(seen) == 5


def test_deferred_metrics_empty_flush():
    d = DeferredMetrics(lambda *a: (_ for _ in ()).throw(AssertionError))
    d.flush()  # nothing pushed, nothing consumed


def test_deferred_metrics_single_entry():
    seen = []
    d = DeferredMetrics(lambda m: seen.append(m))
    d.push("only")
    assert seen == []
    d.flush()
    assert seen == ["only"]
