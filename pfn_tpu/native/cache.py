"""ctypes bindings + Python API for the C++ mmap batch cache.

See ``batch_cache.cpp`` for the file format and the role of this component
(the native replacement for the reference's pre-rendered-batch streaming,
priors/stroke.py:81-84, and episode caching, omniglotNshot.py:172-246).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "batch_cache.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_batch_cache.so")

_lib = None
_lib_error: str | None = None


def _build_library() -> str:
    """Compile the shared library if missing or stale. Returns the .so path."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build_library())
    except Exception as e:  # no g++ / unwritable dir -> numpy fallback
        _lib_error = str(e)
        return None
    lib.bc_open.restype = ctypes.c_void_p
    lib.bc_open.argtypes = [ctypes.c_char_p]
    lib.bc_num_records.restype = ctypes.c_int64
    lib.bc_num_records.argtypes = [ctypes.c_void_p]
    lib.bc_record_floats.restype = ctypes.c_int64
    lib.bc_record_floats.argtypes = [ctypes.c_void_p]
    lib.bc_meta.restype = ctypes.c_char_p
    lib.bc_meta.argtypes = [ctypes.c_void_p]
    lib.bc_record_ptr.restype = ctypes.POINTER(ctypes.c_float)
    lib.bc_record_ptr.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.bc_read.restype = ctypes.c_int
    lib.bc_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    ]
    lib.bc_close.argtypes = [ctypes.c_void_p]
    lib.bcw_create.restype = ctypes.c_void_p
    lib.bcw_create.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p]
    lib.bcw_append.restype = ctypes.c_int
    lib.bcw_append.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.bcw_num_records.restype = ctypes.c_int64
    lib.bcw_num_records.argtypes = [ctypes.c_void_p]
    lib.bcw_finish.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

class BatchCacheWriter:
    """Append (x, y, target_y) batches of ONE fixed shape to a cache file.

    meta records the per-array shapes so readers can split the flat record.
    """

    def __init__(self, path: str, shapes: dict):
        self.path = path
        self.shapes = {k: tuple(v) for k, v in shapes.items()}
        self._sizes = {k: int(np.prod(v)) for k, v in self.shapes.items()}
        self.record_floats = sum(self._sizes.values())
        meta = json.dumps({"shapes": {k: list(v) for k, v in self.shapes.items()}})
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.bcw_create(
                path.encode(), self.record_floats, meta.encode()
            )
            assert self._h, f"cannot create cache at {path}"
        else:  # numpy fallback: buffer in RAM, save on finish
            self._h = None
            self._buf: list[np.ndarray] = []
            self._meta = meta

    def append(self, **arrays):
        assert set(arrays) == set(self.shapes), (set(arrays), set(self.shapes))
        flat = np.concatenate(
            [np.asarray(arrays[k], np.float32).reshape(-1) for k in sorted(self.shapes)]
        )
        assert flat.size == self.record_floats
        if self._h is not None:
            rc = self._lib.bcw_append(
                self._h, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            assert rc == 0, "append failed"
        else:
            self._buf.append(flat)

    def finish(self) -> int:
        """Idempotent: safe under ``with`` + an explicit finish() call."""
        if getattr(self, "_finished", None) is not None:
            return self._finished
        if self._h is not None:
            n = int(self._lib.bcw_num_records(self._h))
            self._lib.bcw_finish(self._h)
            self._h = None
            self._finished = n
            return n
        np.savez(
            self.path + ".npz",
            records=np.stack(self._buf) if self._buf else np.zeros((0, self.record_floats), np.float32),
            meta=self._meta,
        )
        self._finished = len(self._buf)
        return self._finished

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

class BatchCacheReader:
    """Zero-copy reader over a cache file (mmap via the C++ library)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native batch cache unavailable ({_lib_error}); "
                "use NumpyBatchCacheReader"
            )
        self._lib = lib
        self._h = lib.bc_open(path.encode())
        if not self._h:
            raise FileNotFoundError(f"not a batch cache: {path}")
        self.num_records = int(lib.bc_num_records(self._h))
        self.record_floats = int(lib.bc_record_floats(self._h))
        meta = json.loads(lib.bc_meta(self._h).decode())
        self.shapes = {k: tuple(v) for k, v in meta["shapes"].items()}

    def record(self, idx: int, copy: bool = False) -> dict:
        """Return {name: array} for record idx. Default is a ZERO-COPY view
        into the mmap (read-only; valid until close)."""
        ptr = self._lib.bc_record_ptr(self._h, idx)
        if not ptr:
            raise IndexError(idx)
        flat = np.ctypeslib.as_array(ptr, shape=(self.record_floats,))
        flat.flags.writeable = False
        if copy:
            flat = flat.copy()
        out = {}
        off = 0
        for k in sorted(self.shapes):
            n = int(np.prod(self.shapes[k]))
            out[k] = flat[off : off + n].reshape(self.shapes[k])
            off += n
        return out

    def __len__(self):
        return self.num_records

    def __getitem__(self, idx):
        return self.record(idx)

    def close(self):
        if self._h:
            self._lib.bc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NumpyBatchCacheReader:
    """Pure-numpy fallback over the .npz the fallback writer produces."""

    def __init__(self, path: str):
        data = np.load(path + ".npz", allow_pickle=False)
        self._records = data["records"]
        meta = json.loads(str(data["meta"]))
        self.shapes = {k: tuple(v) for k, v in meta["shapes"].items()}
        self.num_records = len(self._records)
        self.record_floats = self._records.shape[1] if self.num_records else 0

    def record(self, idx: int, copy: bool = False) -> dict:
        flat = self._records[idx]
        out = {}
        off = 0
        for k in sorted(self.shapes):
            n = int(np.prod(self.shapes[k]))
            out[k] = flat[off : off + n].reshape(self.shapes[k])
            off += n
        return out

    def __len__(self):
        return self.num_records

    def __getitem__(self, idx):
        return self.record(idx)

    def close(self):
        pass


def open_cache(path: str):
    """Open whichever representation exists at ``path``."""
    if os.path.exists(path) and native_available():
        return BatchCacheReader(path)
    if os.path.exists(path + ".npz"):
        return NumpyBatchCacheReader(path)
    if os.path.exists(path):
        raise RuntimeError(
            f"cache {path} exists but the native reader is unavailable"
        )
    raise FileNotFoundError(path)


# ---------------------------------------------------------------------------
# Prior integration (parity: use_saved_from, reference stroke.py:81-84)
# ---------------------------------------------------------------------------

def write_prior_cache(
    path: str, prior, num_batches: int, batch_size: int, seq_len: int,
    seed: int = 0,
) -> int:
    """Render ``num_batches`` prior batches once and store them."""
    import jax

    assert num_batches >= 1, f"num_batches must be >= 1, got {num_batches}"
    sample = jax.jit(lambda k: prior.sample(k, batch_size, seq_len))
    key = jax.random.PRNGKey(seed)
    x0, y0, t0 = jax.device_get(sample(key))
    writer = BatchCacheWriter(
        path, {"x": x0.shape, "y": y0.shape, "target_y": t0.shape}
    )
    writer.append(x=x0, y=y0, target_y=t0)
    for _ in range(num_batches - 1):
        key, sub = jax.random.split(key)
        x, y, t = jax.device_get(sample(sub))
        writer.append(x=x, y=y, target_y=t)
    return writer.finish()


class CachedPrior:
    """Serve batches from a cache instead of sampling (use_saved_from parity:
    the reference picks a random saved file per step, stroke.py:81-84; here a
    PRNG-keyed random record from the mmap).

    Note: ``sample`` does host IO, so unlike true priors it cannot be fused
    into a jitted step — use with the host-loop :class:`PriorDataLoader`
    pattern. batch_size/seq_len must match the cached shapes.
    """

    def __init__(self, path: str, num_features: int | None = None,
                 num_outputs: int = 1):
        self.reader = open_cache(path)
        x_shape = self.reader.shapes["x"]
        self.num_features = num_features or x_shape[-1]
        self.num_outputs = num_outputs
        self._cached_shape = x_shape

    def sample(self, key, batch_size: int, seq_len: int):
        import jax
        import jax.numpy as jnp

        B, T, _ = self._cached_shape
        assert batch_size == B and seq_len == T, (
            f"cache holds shape {self._cached_shape}, requested "
            f"({batch_size}, {seq_len})"
        )
        idx = int(jax.device_get(jax.random.randint(key, (), 0, len(self.reader))))
        rec = self.reader.record(idx)
        return (
            jnp.asarray(rec["x"]),
            jnp.asarray(rec["y"]),
            jnp.asarray(rec["target_y"]),
        )

    def training_iter(self, seed: int = 0, prefetch: int = 0):
        """Infinite ``(x, y, target_y)`` iterator over random cached batches —
        plug into ``pfn_tpu.train.train(..., data_iter=...)``. ``prefetch > 0``
        wraps it in a background-thread :class:`PrefetchIterator`."""
        import numpy as np

        def gen():
            rng = np.random.RandomState(seed)
            n = len(self.reader)
            while True:
                rec = self.reader.record(int(rng.randint(n)))
                yield rec["x"], rec["y"], rec["target_y"]

        return PrefetchIterator(gen(), depth=prefetch) if prefetch else gen()


class PrefetchIterator:
    """Background-thread prefetch: overlaps host IO (mmap record reads,
    numpy staging) with device compute in the host-fed train path — the
    role torch's DataLoader workers play for the reference, without
    processes (the mmap read is the C++ fast path; the thread only hides
    its latency behind the device step)."""

    def __init__(self, it, depth: int = 2):
        import queue
        import threading

        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._done = False

        def worker():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    self._queue.put(item)
            except BaseException as e:  # re-raised at the consumer
                self._error = e
            finally:
                # Bounded put: on close() the queue may stay full (the
                # consumer is gone) — give up instead of blocking the
                # daemon thread forever. Also bound total retries so an
                # abandoned (never-closed) iterator doesn't leave a
                # busy-looping daemon thread for the process lifetime.
                for _ in range(600):  # <= 60 s of 10 Hz retries
                    if self._stop.is_set():
                        break
                    try:
                        self._queue.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        import queue

        if self._done:
            raise StopIteration
        while True:
            try:
                item = self._queue.get(timeout=0.5)
            except queue.Empty:
                if not self._thread.is_alive():
                    # Worker exited without us ever seeing its sentinel —
                    # possible when the bounded sentinel put (worker
                    # `finally`) gave up while the consumer stalled >60 s
                    # (e.g. an XLA compile on a 1-core host). The worker may
                    # also have put its final item(s) in the gap between our
                    # queue.get timing out and this liveness check, so drain
                    # non-blockingly before declaring end-of-stream; then
                    # surface any stored worker failure instead of losing it.
                    try:
                        item = self._queue.get_nowait()
                    except queue.Empty:
                        self._done = True
                        if self._error is not None:
                            raise self._error
                        raise StopIteration
                    if item is not _SENTINEL:
                        return item
                    self._done = True
                    if self._error is not None:
                        raise self._error
                    raise StopIteration
                continue
            if item is _SENTINEL:
                self._done = True
                if self._error is not None:
                    raise self._error  # surface the worker's failure, not a bare stop
                raise StopIteration
            return item

    def close(self):
        self._done = True  # further __next__ raises StopIteration immediately
        self._stop.set()
        # Drain so the worker unblocks from a full queue and exits.
        while not self._queue.empty():
            self._queue.get_nowait()
        self._thread.join(timeout=1.0)


_SENTINEL = object()
