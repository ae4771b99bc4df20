"""Native (C++) runtime components, bound via ctypes.

Currently: the memory-mapped batch cache (see ``batch_cache.cpp``) — the
data-loader runtime for pre-rendered prior batches, replacing the reference's
torch.save-per-batch streaming (priors/stroke.py:81-84) and host-RAM episode
cache (datasets/omniglotNshot.py:172-246) with one binary format served by
zero-copy mmap reads.

The shared library is compiled on first use with g++ (no pybind11 in this
image; plain C ABI + ctypes). If no C++ toolchain is available the pure-numpy
fallback (:class:`NumpyBatchCacheReader`) keeps the API working.
"""

from pfn_tpu.native.cache import (
    BatchCacheReader,
    BatchCacheWriter,
    CachedPrior,
    NumpyBatchCacheReader,
    PrefetchIterator,
    native_available,
    write_prior_cache,
)

__all__ = [
    "BatchCacheReader",
    "BatchCacheWriter",
    "CachedPrior",
    "NumpyBatchCacheReader",
    "PrefetchIterator",
    "native_available",
    "write_prior_cache",
]
