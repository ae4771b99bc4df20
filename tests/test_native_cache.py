"""Native (C++/mmap) batch cache — the data-loader runtime (parity:
use_saved_from pre-rendered batches, reference stroke.py:81-84)."""

import numpy as np
import pytest

from pfn_tpu.native import (
    BatchCacheReader,
    BatchCacheWriter,
    CachedPrior,
    native_available,
    write_prior_cache,
)
from pfn_tpu.native.cache import open_cache


def test_native_library_compiles():
    assert native_available(), "g++ toolchain expected in this image"


def test_roundtrip_and_zero_copy(tmp_path):
    path = str(tmp_path / "cache.pfnc")
    shapes = {"x": (2, 5, 3), "y": (2, 5), "target_y": (2, 5)}
    rng = np.random.RandomState(0)
    batches = []
    with BatchCacheWriter(path, shapes) as w:
        for _ in range(7):
            b = {k: rng.randn(*v).astype(np.float32) for k, v in shapes.items()}
            w.append(**b)
            batches.append(b)

    r = BatchCacheReader(path)
    assert len(r) == 7
    assert r.shapes == {k: tuple(v) for k, v in shapes.items()}
    for i, b in enumerate(batches):
        rec = r.record(i)
        for k in shapes:
            np.testing.assert_array_equal(rec[k], b[k])
    # Zero-copy views are read-only.
    with pytest.raises(ValueError):
        r.record(0)["x"][0, 0, 0] = 1.0
    # Copies are writable.
    r.record(0, copy=True)["x"][0, 0, 0] = 1.0
    with pytest.raises(IndexError):
        r.record(7)
    r.close()


def test_open_cache_dispatches(tmp_path):
    path = str(tmp_path / "c.pfnc")
    with BatchCacheWriter(path, {"x": (1, 2, 1), "y": (1, 2), "target_y": (1, 2)}) as w:
        w.append(x=np.zeros((1, 2, 1), np.float32), y=np.ones((1, 2), np.float32),
                 target_y=np.ones((1, 2), np.float32))
    r = open_cache(path)
    assert len(r) == 1
    np.testing.assert_array_equal(r[0]["y"], np.ones((1, 2)))


def test_write_prior_cache_and_cached_prior(tmp_path):
    import jax

    from pfn_tpu.priors.ridge import RidgePrior

    path = str(tmp_path / "ridge.pfnc")
    prior = RidgePrior(num_features=3)
    n = write_prior_cache(path, prior, num_batches=5, batch_size=4, seq_len=6)
    assert n == 5

    cached = CachedPrior(path, num_outputs=1)
    assert cached.num_features == 3
    x, y, t = cached.sample(jax.random.PRNGKey(0), 4, 6)
    assert x.shape == (4, 6, 3) and y.shape == (4, 6)
    # A cached batch equals one of the written records.
    r = open_cache(path)
    match = any(
        np.allclose(np.asarray(x), r.record(i)["x"]) for i in range(len(r))
    )
    assert match
    # Shape mismatch is rejected.
    with pytest.raises(AssertionError):
        cached.sample(jax.random.PRNGKey(0), 2, 6)


def test_cached_prior_trains(tmp_path):
    """The cache plugs into the host-loop training path end to end."""
    import jax

    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, mse_criterion
    from pfn_tpu.train.loop import build_model

    path = str(tmp_path / "gp.pfnc")
    prior = GPPrior(num_features=1)
    write_prior_cache(path, prior, num_batches=3, batch_size=4, seq_len=8)
    cached = CachedPrior(path)

    crit = mse_criterion()
    cfg = TrainConfig(emsize=16, nhid=32, nlayers=1, nhead=2, bptt=8)
    model = build_model(cached, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=8)
    x, y, t = cached.sample(jax.random.PRNGKey(1), 4, 8)
    out = model.apply(params, x, y, 4)
    assert out.shape == (4, 8, 1)


def test_prefetch_iterator_preserves_stream(tmp_path):
    """PrefetchIterator yields the same records, in order, as the bare
    iterator with the same seed, and shuts down cleanly."""
    from pfn_tpu.priors.gp import GPPrior

    path = str(tmp_path / "gp2.pfnc")
    write_prior_cache(path, GPPrior(num_features=1), num_batches=4,
                      batch_size=2, seq_len=6)
    cached = CachedPrior(path)
    plain = cached.training_iter(seed=9)
    pre = cached.training_iter(seed=9, prefetch=2)
    for _ in range(10):
        a = next(plain)
        b = next(pre)
        for u, v in zip(a, b):
            np.testing.assert_array_equal(u, v)
    pre.close()


def test_prefetch_iterator_finite_stream():
    from pfn_tpu.native import PrefetchIterator

    it = PrefetchIterator(iter(range(5)), depth=2)
    assert list(it) == [0, 1, 2, 3, 4]


def test_prefetch_iterator_propagates_worker_error():
    import pytest

    from pfn_tpu.native import PrefetchIterator

    def gen():
        yield 1
        raise RuntimeError("corrupt record")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="corrupt record"):
        next(it)
    with pytest.raises(StopIteration):  # and stays exhausted, never hangs
        next(it)
